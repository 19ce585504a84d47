"""Deterministic cardinality / frequency sketches (KMV, count-min).

At 100 TB, "how many distinct X per Y" and "how often does term T occur"
are questions you answer with MERGEABLE fixed-size sketches, not exact
distinct aggregates: a sketch is computed once per shard/ingest batch,
persisted (k rows, or a d×w counter grid), and merged without ever
rescanning the corpus — the same delta-vs-corpus contract as the
incremental dedup/ANN families. Both sketches here are built from the
md5-derived HASH32 (the corpus-wide shared base hash), so every estimate
is bit-identical across engines, runs, and partitionings — the DuckDB
oracle replays them exactly, and the battery entries report the
measured error against exact truth in the same row ("measure, don't
guess").

- KMV (k minimum values, Bar-Yossef et al. 2002): keep a group's k
  smallest distinct item hashes; distinct-count estimate is
  ``(k-1) · 2^32 // h_k`` (integer division — BIGINT-exact), exact when
  the group has fewer than k distinct items. Merge = union the bottom-k
  sets and re-take the bottom k.
- Count-min (Cormode & Muthukrishnan 2005): a d×w counter grid over d
  independent md5-salted hash rows; a term's frequency estimate is the
  MIN of its d counters — always an overestimate, never under. Merge =
  cellwise sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textdedup import HASH32

KMV_K = 64        # bottom-k size (stderr ~ 1/sqrt(k) ≈ 12.5%)
CMS_D = 4         # count-min hash rows
CMS_W = 256       # count-min buckets per row


def kmv_bottomk(hashes: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, h) → the k smallest DISTINCT hashes per group — the
    persistable KMV sketch (≤ k rows per group). Input ``h`` must be the
    32-bit item hash (HASH32 of the item, or any shared-base-hash
    column such as shingle hashes).

    Closed under merge: bottom-k of a union equals bottom-k of the
    unioned bottom-k sketches, so shard sketches union without touching
    shard data (unit-proven). 100-TB shape: distinct on uniform
    (grp, h) keys, then one row_number window whose ``rk <= k``
    predicate Spark pushes map-side (WindowGroupLimit) — a mega-group
    ships at most k rows per input partition into the exchange."""
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.select("grp", "h").distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def kmv_estimate(bottomk: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, est_distinct) from a :func:`kmv_bottomk` sketch: groups
    holding fewer than k hashes are EXACT (the sketch saw every item);
    otherwise ``(k-1) · 2^32 // h_k`` with h_k the k-th smallest hash —
    all-integer, so cross-engine hash-exact."""
    num = (k - 1) * (1 << 32)
    return (
        bottomk.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("h").alias("__hk"))
        .select(
            "grp",
            F.when(F.col("__n") < k, F.col("__n"))
            .otherwise(F.expr(f"cast({num} div __hk as bigint)"))
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kmv_distinct(hashes: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, est_distinct) — the one-shot form (sketch + estimate)."""
    return kmv_estimate(kmv_bottomk(hashes, k), k)


def cms_counters(
    items: DataFrame, item_col: str = "term",
    d: int = CMS_D, w: int = CMS_W,
) -> DataFrame:
    """(r, bucket, cnt) — the d×w count-min grid over item OCCURRENCES
    (one input row per occurrence). Row r hashes with salt ``cms{r}:``,
    so the d rows are independent draws of the shared base hash.

    100-TB shape: the d-way fan-out happens inside one codegen
    projection (transform + posexplode — one corpus pass, no union of d
    scans); the aggregate's keyspace is d·w ≤ a few thousand cells, so
    map-side partial combine collapses the corpus before the (tiny)
    exchange. Merge across shards/batches = cellwise sum."""
    h = HASH32.format(col=f"concat('cms', cast(r as string), ':', {item_col})")
    return (
        items.select(
            F.posexplode(
                F.expr(f"transform(sequence(0, {d - 1}), r -> pmod({h}, {w}))")
            ).alias("r", "bucket")
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame, terms: DataFrame, term_col: str = "term",
    d: int = CMS_D, w: int = CMS_W,
) -> DataFrame:
    """(term, est_tf) — count-min frequency estimates for ``terms``:
    min over the d per-row counters the term hashes to (missing cell =
    0 — the term was never seen in that row's bucket). Always >= the
    true count (collisions only ADD). The counter grid is ≤ d·w rows
    and broadcasts; the query-term side never rescans the corpus."""
    h = HASH32.format(col=f"concat('cms', cast(r as string), ':', {term_col})")
    probes = terms.select(
        term_col,
        F.posexplode(
            F.expr(f"transform(sequence(0, {d - 1}), r -> pmod({h}, {w}))")
        ).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["r", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_tf"))
    )
