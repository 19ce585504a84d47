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
- HyperLogLog (Flajolet et al. 2007): m = 2^p registers, each holding
  the max leading-zero run of the hashes routed to it; distinct-count
  estimate is the harmonic mean of the registers, with linear counting
  for small cardinalities. Merge = cellwise max. ALL arithmetic here is
  integer (the harmonic sum is exact in BIGINT via a common power-of-two
  denominator; alpha and the linear-counting ln table are Python-side
  integer constants shared with the DuckDB oracle), so estimates are
  bit-identical across engines.
- Equi-width histogram (the quantile sketch): fixed B buckets of width
  W; a quantile estimate is integer linear interpolation inside the
  bucket where the cumulative count crosses the target rank. Merge =
  cellwise sum — the simplest additive sketch, and the one that answers
  "p50/p90/p99 document length over 100 TB" from B persisted rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .textdedup import HASH32

KMV_K = 64        # bottom-k size (stderr ~ 1/sqrt(k) ≈ 12.5%)
CMS_D = 4         # count-min hash rows
CMS_W = 256       # count-min buckets per row

HLL_P = 6                      # register-index bits (m = 64; stderr ~ 1.04/8 = 13%)
HLL_M = 1 << HLL_P             # register count
HLL_REST = 32 - HLL_P          # bits left for the leading-zero run
HLL_RHO_MAX = HLL_REST + 1     # rho when the rest-bits are all zero
# alpha_m scaled to integer micro-units (Flajolet et al. 2007, m >= 64)
HLL_ALPHA_MICRO = round(0.7213 / (1 + 1.079 / HLL_M) * 1_000_000)
# linear-counting table: LC[V] = round(m * ln(m / V)) for V = 1..m-1
# (V = count of untouched registers) — a shared integer constant table,
# so the correction branch is bit-identical cross-engine by construction.
HLL_LC = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M)]
HLL_LC_THRESHOLD = (5 * HLL_M) // 2   # raw-estimate cutoff for linear counting

HIST_W = 8         # histogram bucket width (token-count units)
HIST_B = 32        # histogram buckets (values >= W*B clamp into the last)


def kmv_bottomk(
    hashes: DataFrame, k: int = KMV_K, pre_distinct: bool = False
) -> DataFrame:
    """(grp, h) → the k smallest DISTINCT hashes per group — the
    persistable KMV sketch (≤ k rows per group). Input ``h`` must be the
    32-bit item hash (HASH32 of the item, or any shared-base-hash
    column such as shingle hashes).

    Closed under merge: bottom-k of a union equals bottom-k of the
    unioned bottom-k sketches, so shard sketches union without touching
    shard data (unit-proven). 100-TB shape: distinct on uniform
    (grp, h) keys, then one row_number window whose ``rk <= k``
    predicate Spark pushes map-side (WindowGroupLimit) — a mega-group
    ships at most k rows per input partition into the exchange.
    ``pre_distinct=True`` skips the distinct when the caller already
    materialized a per-(grp, h)-unique input (one exchange saved)."""
    w = Window.partitionBy("grp").orderBy("h")
    base = hashes.select("grp", "h")
    if not pre_distinct:
        base = base.distinct()
    return (
        base.withColumn("rk", F.row_number().over(w))
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


def kmv_set_ops(bk_a: DataFrame, bk_b: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, est_union, est_inter, est_jaccard_permille) — set-operation
    estimates between two :func:`kmv_bottomk` sketches (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset operations").

    The union sketch K_U is the bottom-k of K_A ∪ K_B (bottom-k is closed
    under union); est_union applies the KMV estimator to K_U; the match
    fraction rho = |{h ∈ K_U : h ∈ K_A ∧ h ∈ K_B}| is an unbiased sample
    of the Jaccard similarity, so est_inter = rho · est_union // |K_U| and
    est_jaccard_permille = rho · 1000 // |K_U| — all-integer, so
    cross-engine hash-exact. When |A ∪ B| < k the sketches ARE the sets
    and every output is exact.

    100-TB shape: the inputs are the k-row persisted sketches, never the
    corpora — overlap between two monthly crawl snapshots costs a join of
    two ≤ k·|groups|-row tables (broadcast in practice), not the full-outer
    URL join :mod:`..operators.snapshot` pays for the exact diff."""
    a = bk_a.select("grp", "h", F.lit(1).alias("__a"))
    b = bk_b.select("grp", "h", F.lit(1).alias("__b"))
    u = a.join(b, ["grp", "h"], "full_outer").select(
        "grp", "h",
        F.coalesce("__a", F.lit(0)).alias("in_a"),
        F.coalesce("__b", F.lit(0)).alias("in_b"),
    )
    w = Window.partitionBy("grp").orderBy("h")
    top = u.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    num = (k - 1) * (1 << 32)
    return (
        top.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max("h").alias("__hk"),
            F.sum(F.expr("in_a * in_b")).alias("__rho"),
        )
        .select(
            "grp", "__n", "__rho",
            F.when(F.col("__n") < k, F.col("__n"))
            .otherwise(F.expr(f"cast({num} div __hk as bigint)"))
            .cast("long")
            .alias("est_union"),
        )
        .select(
            "grp",
            "est_union",
            F.expr("cast(__rho * est_union div __n as bigint)").alias("est_inter"),
            F.expr("cast(__rho * 1000 div __n as bigint)").alias(
                "est_jaccard_permille"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_rho_sql(h: str = "h") -> tuple[str, str]:
    """SQL for (register index, rho) from a 32-bit hash column ``h``:
    index = the top HLL_P bits, rho = leading-zero run of the remaining
    HLL_REST bits + 1. The bit-length of the rest comes from the binary
    string length (``conv(x, 10, 2)`` — same semantics as DuckDB's
    ``bin(x)``), so no float log anywhere."""
    rest = f"pmod({h}, {1 << HLL_REST})"
    idx = f"cast({h} div {1 << HLL_REST} as int)"
    rho = (
        f"cast(case when {rest} = 0 then {HLL_RHO_MAX} "
        f"else {HLL_RHO_MAX} - length(conv({rest}, 10, 2)) end as int)"
    )
    return idx, rho


def hll_registers(hashes: DataFrame) -> DataFrame:
    """(grp, idx, rho) — the persistable HLL sketch: ≤ m rows per group,
    each the MAX leading-zero run observed at that register. Input ``h``
    must be a 32-bit shared-base hash (HASH32 of the item).

    Closed under merge: registers of a union = cellwise max of the
    shards' registers (max is associative/commutative — unit-proven),
    so per-shard/per-ingest-batch sketches merge without rescanning
    shard data. 100-TB shape: the groupBy keyspace is |groups|·m, and
    map-side partial max collapses the corpus before the exchange —
    every input partition ships at most m rows per group."""
    idx, rho = hll_rho_sql("h")
    return (
        hashes.select("grp", F.expr(idx).alias("idx"), F.expr(rho).alias("rho"))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(grp, est_distinct) from :func:`hll_registers` — the classic HLL
    estimator in exact integer arithmetic: the harmonic sum
    Σ 2^-rho_j is computed as Σ 2^(RHO_MAX - rho_j) over a common
    2^RHO_MAX denominator (BIGINT-exact; absent registers contribute
    2^RHO_MAX each), the raw estimate is alpha·m² / sum via one integer
    division, and the small-range branch replaces it with the
    linear-counting table HLL_LC[V] when raw ≤ 2.5m and V > 0 untouched
    registers remain. Bit-identical cross-engine; no doubles."""
    lc_arr = "array(" + ",".join(str(v) for v in HLL_LC) + ")"
    raw_num = HLL_ALPHA_MICRO * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
    return (
        registers.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.expr(
                f"sum(shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - rho))"
            ).alias("__s"),
        )
        .select(
            "grp",
            F.expr(
                f"cast({raw_num} div "
                f"((__s + ({HLL_M} - __n) * {1 << HLL_RHO_MAX}) * 1000000) "
                f"as bigint)"
            ).alias("__raw"),
            (F.lit(HLL_M) - F.col("__n")).cast("int").alias("__v"),
        )
        .select(
            "grp",
            F.expr(
                f"cast(case when __v > 0 and __raw <= {HLL_LC_THRESHOLD} "
                f"then element_at({lc_arr}, __v) else __raw end as bigint)"
            ).alias("est_distinct"),
        )
    )


def hll_distinct(hashes: DataFrame) -> DataFrame:
    """(grp, est_distinct) — the one-shot form (sketch + estimate)."""
    return hll_estimate(hll_registers(hashes))


# ---------------------------------------------------------------------------
# equi-width histogram / quantile sketch
# ---------------------------------------------------------------------------

def hist_counts(
    values: DataFrame, w: int = HIST_W, b: int = HIST_B, by: tuple = ()
) -> DataFrame:
    """(*by, bucket, cnt) — the additive quantile sketch over a ``v``
    column of non-negative integers: bucket = min(v div w, b-1) (values
    beyond the range clamp into the last bucket). ≤ b persisted rows per
    group; merge across shards = cellwise sum. 100-TB shape: keyspace
    ≤ |groups|·b, so map-side partial combine collapses the corpus
    before the (tiny) exchange."""
    by = list(by)
    return (
        values.select(
            *by,
            F.expr(f"cast(least(v div {w}, {b - 1}) as int)").alias("bucket"),
        )
        .groupBy(*by, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame, qs_permille: list[int], w: int = HIST_W, by: tuple = ()
) -> DataFrame:
    """(*by, q_permille, est) — integer quantile estimates from a
    :func:`hist_counts` sketch: for each q the target rank is
    ceil(q·N/1000); the estimate interpolates linearly inside the bucket
    where the cumulative count crosses it:
    ``bucket·w + (target - cum_before) · w div cnt`` — all-integer, so
    cross-engine hash-exact. The windows run over ≤ b rows per group
    (the sketch, not the corpus)."""
    by = list(by)
    qs = hist.sparkSession.createDataFrame(
        [(q,) for q in qs_permille], "q_permille int"
    )
    cum = hist.select(
        *by, "bucket", "cnt",
        F.sum("cnt").over(
            Window.partitionBy(*by).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*by)).alias("n"),
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("target", F.expr("(q_permille * n + 999) div 1000"))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy(*by, "q_permille")
        .agg(
            F.min(F.struct("bucket", "cnt", "cum", "target")).alias("__b")
        )
        .select(
            *by, "q_permille",
            F.expr(
                f"cast(__b.bucket * {w} + "
                f"(__b.target - (__b.cum - __b.cnt)) * {w} div __b.cnt "
                f"as bigint)"
            ).alias("est"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom membership sketch (Bloom 1970) — the measured, battery-visible
# counterpart of the crawl's seen-set Bloom sidecar (operators/bloom.py:
# there the filter prunes the frontier anti-join; here the SAME k-position
# construction is built and probed as DataFrames so its false-positive
# rate is MEASURED against exact truth, never assumed).
# ---------------------------------------------------------------------------

BLOOM_SK_K = 4       # hash positions per item (independent md5 32-bit chunks)
BLOOM_SK_M = 1024    # bits — sized so the battery corpus yields a non-zero
                     # measurable FPR (the point is the measurement)


def bloom_positions_sql(col: str, k: int = BLOOM_SK_K, m: int = BLOOM_SK_M) -> str:
    """SQL (Spark) array of an item's ``k`` bit positions: the j-th is the
    j-th 8-hex-char chunk of ``md5(col)`` mod ``m`` (md5's 32 hex chars
    give 4 independent 32-bit chunks). ``array_distinct`` because two
    chunks may collide into one position."""
    if not 1 <= k <= 4:
        raise ValueError("k must be 1..4 (md5 yields 4 32-bit chunks)")
    return (
        f"array_distinct(transform(sequence(0, {k - 1}), "
        f"j -> cast(conv(substr(md5({col}), cast(1 + j * 8 as int), 8), "
        f"16, 10) as bigint) % {m}))"
    )


def bloom_build(
    items: DataFrame, item_col: str = "item",
    k: int = BLOOM_SK_K, m: int = BLOOM_SK_M,
) -> DataFrame:
    """(pos) — the set-bit table of a Bloom filter over ``items``. This IS
    the distributed representation: ≤ m rows regardless of corpus size,
    mergeable by plain union+distinct (the OR of two filters), and
    persistable as the sketch state a later delta probes (the
    delta-vs-corpus contract shared with KMV/CMS/HLL above).

    100-TB shape: one codegen projection + explode per item, then a
    distinct on the uniform ``pos`` key bounded by m — the corpus never
    moves more than its position fan-out, and the filter itself is tiny.
    """
    return (
        items.select(
            F.explode(F.expr(bloom_positions_sql(item_col, k, m))).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, item_col: str = "item",
    k: int = BLOOM_SK_K, m: int = BLOOM_SK_M,
) -> DataFrame:
    """(item, bloom_hit) per DISTINCT probe item: hit ⇔ every one of the
    probe's positions is set in ``bloom``. Never a false negative by
    construction; false positives are the measured trade.

    100-TB shape: probe positions join the ≤ m-row set-bit table on the
    uniform ``pos`` key (AQE broadcasts the filter side); the per-item
    all-positions-present test is a count aggregate on the uniform item
    key — no filter materialization on the driver, no UDF, no bitset blob.
    """
    base = probes.select(F.col(item_col).alias("item")).distinct()
    pos = base.select(
        "item", F.expr(bloom_positions_sql("item", k, m)).alias("ps")
    ).select("item", F.size("ps").alias("n_pos"), F.explode("ps").alias("pos"))
    hits = (
        pos.join(bloom, "pos")
        .groupBy("item", "n_pos")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return base.join(hits, "item", "left").select(
        "item",
        F.coalesce(F.col("n_hit") == F.col("n_pos"), F.lit(False)).alias(
            "bloom_hit"
        ),
    )
