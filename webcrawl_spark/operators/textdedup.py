"""Text deduplication operators for training-data pipelines, all JVM-side
(whole-stage-codegen column expressions — no Python in the hot path).

- exact dedup: hash-groupBy on a content digest.
- MinHash: k-shingles → 32-bit base hash (md5-prefix, reproducible in any
  engine) → ``num_hashes`` affine permutations → ``array_min``; LSH banding
  buckets signatures, a bucket self-join yields candidate pairs.
- SimHash: per-token hash sign-sums per bit position.
- n-gram Jaccard: set intersection/union over shingle arrays.

At 100 TB each of these is a shuffle-on-digest/bucket groupBy whose keys are
uniform hashes — no skew by construction; LSH bucket join replaces the
quadratic all-pairs comparison with per-bucket micro-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 32-bit base hash from a cross-engine-stable digest: first 8 md5 hex chars.
# (conv returns a string; arithmetic is exact below 2^53 and results are
# cast back to bigint.)
HASH32 = "cast(conv(substr(md5({col}), 1, 8), 16, 10) as bigint)"

# affine permutation constants (deterministic, engine-independent).
# A < 2^20 keeps A*H below 2^52: exact in int64 AND in float64, so any
# engine evaluating the same formula gets bit-identical minhashes.
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
MINHASH_A = [999983, 999979, 999961, 999959, 999953, 999931, 999917, 999907]
MINHASH_B = [15485863, 32452843, 49979687, 67867967,
             86028121, 104395301, 122949823, 141650939]


def shingles_sql(col: str, k: int = 5) -> str:
    """Distinct character k-shingles of ``col`` (Spark SQL, codegen)."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({col}) - {k - 1}, 1)), "
        f"i -> substring({col}, i, {k})))"
    )


def minhash_sql(col: str, j: int, k: int = 5) -> str:
    """j-th MinHash of ``col``'s k-shingle set."""
    h = HASH32.format(col="s")
    return (
        f"cast(array_min(transform({shingles_sql(col, k)}, "
        f"s -> ({MINHASH_A[j]} * {h} + {MINHASH_B[j]}) % {MINHASH_PRIME})) as bigint)"
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Digest groups with >1 member: (digest, keeper, n_dups)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("keeper"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, k: int = 5,
) -> DataFrame:
    """Long-form signatures: (id, h, minhash) — one row per hash function."""
    sig = docs.select(
        F.col(id_col).alias("id"),
        F.array(*[F.expr(minhash_sql(text_col, j, k)) for j in range(num_hashes)]).alias("sig"),
    )
    return sig.select(
        "id", F.posexplode("sig").alias("h", "minhash")
    )


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, k: int = 5,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b) via banded bucket self-join.

    bucket key = band index + the band's row hashes concatenated; docs
    sharing any bucket become a candidate pair (dropDuplicates over bands).
    """
    nh = bands * rows_per_band
    sig = docs.select(
        F.col(id_col).alias("id"),
        *[F.expr(minhash_sql(text_col, j, k)).alias(f"mh{j}") for j in range(nh)],
    )
    buckets = None
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band = sig.select(
            "id",
            F.concat_ws(
                ":", F.lit(str(b)), *[F.col(c).cast("string") for c in cols]
            ).alias("bucket"),
        )
        buckets = band if buckets is None else buckets.unionByName(band)
    left = buckets.withColumnRenamed("id", "a")
    right = buckets.withColumnRenamed("id", "b")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over whitespace tokens.

    explode tokens → per-(doc, bit) sign sums → bit-pack. Two shuffles on
    uniform keys; at scale the explode is map-side and the groupBy combines
    partially.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.expr(HASH32.format(col="tok")).alias("h")
    bit_rows = (
        toks.select("id", h)
        .select(
            "id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bits - 1}), "
                    f"i -> struct(i as i, (shiftright(h, i) & 1) * 2 - 1 as sgn))"
                )
            ).alias("bs"),
        )
        .select("id", F.col("bs.i").alias("i"), F.col("bs.sgn").alias("sgn"))
    )
    return (
        bit_rows.groupBy("id", "i")
        .agg(F.sum("sgn").alias("s"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), i)")).otherwise(0)
            ).alias("simhash")
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Jaccard over k-shingle sets for consecutive-id pairs (a, a+1).

    The consecutive pairing keeps the demo linear; swap the join condition
    for an LSH candidate table to scale to arbitrary pair generation.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.expr(shingles_sql(text_col, k)).alias("sh"),
    )
    a = sh.select(F.col("id").alias("a"), F.col("sh").alias("sha"))
    b = sh.select((F.col("id") - 1).alias("a"), F.col("id").alias("b"), F.col("sh").alias("shb"))
    return (
        a.join(b, "a")
        .select(
            "a", "b",
            (F.size(F.array_intersect("sha", "shb"))
             / F.size(F.array_union("sha", "shb"))).alias("jaccard"),
        )
        .withColumn("jaccard", F.round("jaccard", 6))
    )
