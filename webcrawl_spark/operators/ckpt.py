"""Lineage cuts: local (fast, in-sandbox default) vs reliable (cluster).

``localCheckpoint`` stores blocks on executors — eager and cheap, but an
executor loss invalidates it and kills the job (VERDICT r1 "what's wrong"
item 4). On a real cluster set ``CrawlConfig.reliable_checkpoints=True``:
every lineage cut then goes through ``DataFrame.checkpoint`` into the
crawl state directory (shared storage on a cluster), surviving executor
loss; with Iceberg available the per-round table commits themselves become
the cuts and this knob disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and cut its lineage."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
