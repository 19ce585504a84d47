"""Label propagation (Raghavan, Albert & Kumara 2007) — community
detection over the link graph, fully deterministic.

The 100-TB use: partition the crawl by community, not by raw host hash —
politeness state, frontier shards, and recrawl schedules co-locate with
the link neighborhoods they serve. Synchronous LPA with a FIXED iteration
count and a MIN-label tie-break, so every engine (and every rerun)
computes bit-identical communities: a node adopts the most frequent label
among its neighbors; ties break to the smallest label; isolated nodes
keep their own.

Per iteration the plan is one uniform-key shuffle (groupBy (node, label))
plus the min-struct argmax agg and a join back on the node key — no
window over the corpus, no float, no randomness. Reference analog: none
(the reference crawls one host set; community-sharding is the scale-out
design this engine adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge set from a directed one: add the reversed edges,
    drop self-loops, dedupe. Input/output columns: (src, dst)."""
    return (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter("src <> dst")
        .distinct()
    )


def label_propagation(
    und: DataFrame, nodes: DataFrame, iters: int = 3
) -> DataFrame:
    """(id, label) after ``iters`` synchronous LPA rounds over the
    undirected edge set ``und`` (src, dst). ``nodes`` must have an ``id``
    column; initial label = the node's own id (must be a numeric id —
    the MIN tie-break is over it)."""
    labels = nodes.select("id", F.col("id").cast("long").alias("label"))
    for _ in range(iters):
        cnt = (
            und.join(labels.select(F.col("id").alias("dst"), "label"), "dst")
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            cnt.groupBy("src")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("negc"), F.col("label").alias("label")
                    )
                ).alias("b")
            )
            .select(F.col("src").alias("id"), F.col("b.label").alias("nl"))
        )
        labels = labels.join(best, "id", "left").select(
            "id", F.coalesce("nl", "label").alias("label")
        )
    return labels
