"""SRP hyperplane LSH and cluster-balanced-sample tests."""

import numpy as np
from pyspark.sql import functions as F

from webcrawl_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_srp_codes_match_independent_numpy_projection(spark):
    """Every bit of every code equals the sign of the int64 dot product
    of the x1000-quantized vector with the md5-derived hyperplane —
    recomputed here in numpy, independently of the Spark expression."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {r.id: r.code for r in SIM.srp_codes(emb).collect()}
    w = np.array(SIM.srp_weights(), dtype=np.int64)  # 16 x 64
    for row in emb.collect():
        q = np.floor(np.array(row.embedding, dtype=np.float64) * 1000 + 0.5
                     ).astype(np.int64)
        want = sum(1 << h for h in range(16) if int(w[h] @ q) >= 0)
        assert got[row.vec_id] == want, row.vec_id


def test_srp_identical_vectors_always_pair(spark):
    """Identical vectors share every bit, so they collide in every band
    and verify at cos 1.0; a near-orthogonal vector stays unpaired."""
    rows = [
        (0, [1.0, 0.5, -0.25, 2.0]),
        (1, [1.0, 0.5, -0.25, 2.0]),
        (2, [-0.9, 1.4, 0.1, -1.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r.a, r.b): r.cos for r in SIM.srp_pairs(emb, dim=4).collect()}
    assert pairs.get((0, 1)) == 1.0
    assert all(2 not in p for p in pairs)


def test_srp_pairs_subset_of_exact_and_recall_bounds(spark):
    """Banded SRP never invents a pair (candidates are verified by exact
    cosine), so srp ⊆ exact; recall is therefore in [0, 1]."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.a, r.b)
        for r in SIM.neardup_pairs(emb, n=10**9, threshold=0.3).collect()
    }
    srp = {(r.a, r.b) for r in SIM.srp_pairs(emb, tau=0.3).collect()}
    assert srp <= exact
    assert len(srp) > 0  # the family does find something on this corpus


def test_cluster_balanced_sample_cap_and_determinism(spark):
    rows = [(i, 100) for i in range(5)] + [(9, 9), (10, 10)]
    clusters = spark.createDataFrame(rows, "id long, cluster_id long")
    out = SIM.cluster_balanced_sample(clusters, cap=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append((r.rk, r.id))
    assert sorted(by_cluster[100])[0][0] == 1 and len(by_cluster[100]) == 2
    assert by_cluster[9] == [(1, 9)] and by_cluster[10] == [(1, 10)]
    # membership is hash-ordered — reversing input row order changes nothing
    rev = spark.createDataFrame(list(reversed(rows)), "id long, cluster_id long")
    out2 = SIM.cluster_balanced_sample(rev, cap=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_srp_incremental_equals_full_restriction(spark):
    """Codes are data-independent, so the incremental path must equal the
    full srp_pairs over corpus ∪ delta restricted to cross pairs — an
    EXACT equivalence, not a recall trade (unlike the IVF/PQ deltas)."""
    emb = _emb(spark)
    is_delta = F.col("vec_id") % 5 == 4
    corpus, delta = emb.filter(~is_delta), emb.filter(is_delta)
    codes = SIM.srp_codes(corpus)
    inc = {
        (r.a, r.b, r.cos)
        for r in SIM.srp_pairs_incremental(delta, codes, corpus).collect()
    }
    full = SIM.srp_pairs(emb, tau=0.3).collect()
    want = set()
    for r in full:
        da, db = r.a % 5 == 4, r.b % 5 == 4
        if da and not db:
            want.add((r.a, r.b, r.cos))
        elif db and not da:
            want.add((r.b, r.a, r.cos))
    assert inc == want and len(want) > 0


def test_srp_incremental_corpus_codes_from_existingrdd(spark):
    """The persisted-code consumer plan: the corpus CODE side starts from
    the materialized table (Scan ExistingRDD), no Python, no cartesian.
    (The corpus VECTOR side legitimately rescans parquet to verify
    survivors — that read is candidate-bounded, not corpus-wide work.)"""
    import io
    import contextlib

    emb = _emb(spark)
    is_delta = F.col("vec_id") % 5 == 4
    corpus, delta = emb.filter(~is_delta), emb.filter(is_delta)
    codes = SIM.srp_codes_cached(corpus, cache_key="srp-plan-guard")
    out = SIM.srp_pairs_incremental(delta, codes, corpus)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "ExistingRDD" in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
