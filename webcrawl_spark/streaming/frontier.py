"""Streaming frontier sketch: per-host politeness over a discovered-URL
stream (SURVEY.md §1.5 deferred item; VERDICT r1 item 9).

The batch engine expresses one crawl round's politeness as a window top-k
(plans/round.py step 1). The streaming form keeps the SAME per-host queue
discipline as custom state in ``applyInPandasWithState``: each micro-batch
is one politeness quantum — at most ``budget`` URLs per host are released
per trigger, ordered by (priority, seq); unreleased URLs carry over in
state, exactly the reference's per-service queue + connection budget
(Backend/Crawler.cs:533-548, 2345-2363) expressed over an unbounded feed.

With the whole input in one trigger the released set is identical to the
batch window top-k (test_streaming_frontier asserts equivalence); across
triggers the carryover replays the reference's continuous scheduler.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRONTIER_IN_SCHEMA = "url string, host string, priority int, seq long"
FRONTIER_STATE_SCHEMA = "urls array<string>, prios array<int>, seqs array<long>"
FRONTIER_OUT_SCHEMA = "host string, url string, priority int, seq long"


def make_politeness_fn(budget: int):
    def politeness_fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            urls, prios, seqs = state.get
            rows = list(zip(urls, prios, seqs))
        else:
            rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["url"], pdf["priority"], pdf["seq"]))
        rows.sort(key=lambda r: (r[1], r[2]))
        emit, keep = rows[:budget], rows[budget:]
        state.update((
            [r[0] for r in keep],
            [int(r[1]) for r in keep],
            [int(r[2]) for r in keep],
        ))
        if emit:
            yield pd.DataFrame(
                {
                    "host": [key[0]] * len(emit),
                    "url": [r[0] for r in emit],
                    "priority": [int(r[1]) for r in emit],
                    "seq": [int(r[2]) for r in emit],
                }
            )

    return politeness_fn


def stream_frontier_politeness(
    spark: SparkSession, src_dir: str, query_name: str, budget: int = 2,
    ranks: DataFrame | None = None,
) -> "StreamingQuery":
    """File-source URL stream → per-host budget-limited release.

    ``ranks`` (optional, url → rank): rank-weighted priority parity with
    the batch path (plans/round.py step 5c') — a stream-static left join
    folds the rank into ``priority`` via the SAME shared expression
    (functions.rankprio.fold_rank_priority) BEFORE the stateful politeness
    operator, so the per-host release order matches a rank-weighted batch
    round exactly (test_streaming asserts the equivalence). Stream-static
    joins re-read the static side per micro-batch; at scale the ranks
    table is a broadcast-or-bucketed parquet table, same as batch."""
    st = (
        spark.readStream.schema(FRONTIER_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if ranks is not None:
        from ..functions.rankprio import fold_rank_priority

        st = fold_rank_priority(st, ranks)
    released = st.groupBy("host").applyInPandasWithState(
        make_politeness_fn(budget),
        outputStructType=FRONTIER_OUT_SCHEMA,
        stateStructType=FRONTIER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        released.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
