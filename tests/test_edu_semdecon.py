"""Hand-computed tests for the two embedding-head passes added in the
tenth round-5 session: semantic benchmark decontamination
(operators/similarity.contamination_semantic) and the FineWeb-Edu-style
linear quality gate (similarity.edu_scores)."""

import hashlib
import math

from pyspark.sql import functions as F

from webcrawl_spark.operators import similarity as SIM


def _rnd4(x: float) -> float:
    """Spark F.round(_, 4) = HALF_UP."""
    s = 10_000.0
    return (math.floor(x * s + 0.5) / s) if x >= 0 else (math.ceil(x * s - 0.5) / s)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_contamination_semantic_hand_computed(spark):
    # 4 corpus vectors, 2 bench vectors: c0 == b0 (verbatim leak, cos 1),
    # c1 is a near-dup of b0, c2 is orthogonal-ish to both, c3 matches b1.
    vecs = {
        0: [1.0, 0.0, 0.0, 0.2],
        1: [0.9, 0.1, 0.0, 0.2],
        2: [0.0, 1.0, -1.0, 0.0],
        3: [0.0, 0.0, 1.0, 0.5],
    }
    bench = {10: vecs[0], 11: [0.0, 0.0, 1.0, 0.4]}
    corpus = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(i, v) for i, v in bench.items()], "bench_id long, embedding array<double>"
    )
    tau = 0.9
    got = {
        r.vec_id: r
        for r in SIM.contamination_semantic(corpus, b, tau=tau).collect()
    }
    exp = {}
    for cid, cv in vecs.items():
        hits = {bid: _cos(cv, bv) for bid, bv in bench.items()
                if _cos(cv, bv) >= tau}
        if hits:
            exp[cid] = (len(hits), min(hits), _rnd4(max(hits.values())))
    assert set(got) == set(exp) == {0, 1, 3}
    for cid, (n, bmin, mx) in exp.items():
        assert got[cid].n_bench_hits == n
        assert got[cid].bench_min == bmin
        assert abs(got[cid].max_cos - mx) < 1e-12


def test_contamination_semantic_self_leak_flags_exact_copy(spark):
    # a verbatim eval-set leak (identical vector) must flag with cos 1.0
    v = [0.3, -0.7, 0.2, 0.9]
    corpus = spark.createDataFrame([(5, v)], "vec_id long, embedding array<double>")
    b = spark.createDataFrame([(99, v)], "bench_id long, embedding array<double>")
    rows = SIM.contamination_semantic(corpus, b, tau=0.999).collect()
    assert len(rows) == 1 and rows[0].vec_id == 5 and rows[0].max_cos == 1.0


def _edu_expected(vec):
    w = SIM.edu_weights(len(vec))
    q = [math.floor(float(x) * 1000 + 0.5) for x in vec]
    score = sum(a * b for a, b in zip(q, w))
    bucket = min(5, max(0, score + SIM.EDU_SHIFT) // SIM.EDU_WIDTH)
    return score, bucket, bucket >= SIM.EDU_KEEP_MIN


def test_edu_weights_are_md5_derived():
    w = SIM.edu_weights(3)
    for d, wd in enumerate(w):
        h = int(hashlib.md5(f"{SIM.EDU_W_TAG}{d}".encode()).hexdigest()[:8], 16)
        assert wd == h % SIM.EDU_W_SPAN - (SIM.EDU_W_SPAN - 1) // 2
        assert -8 <= wd <= 8


def test_edu_scores_hand_computed(spark):
    # includes the clamp edges: a strongly-negative vector (bucket 0) and a
    # strongly-positive one (bucket 5); weights are fixed by md5 so the
    # expected values replay in plain Python
    w = SIM.edu_weights(64)
    lo = [-1.5 if wd > 0 else 1.5 for wd in w]   # minimizes the score
    hi = [1.5 if wd > 0 else -1.5 for wd in w]   # maximizes the score
    mid = [0.01 * ((d % 7) - 3) for d in range(64)]
    emb = spark.createDataFrame(
        [(0, lo), (1, hi), (2, mid)], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r for r in SIM.edu_scores(emb).collect()}
    for vid, vec in [(0, lo), (1, hi), (2, mid)]:
        score, bucket, keep = _edu_expected(vec)
        assert got[vid].score == score
        assert got[vid].edu_score == bucket
        assert got[vid].keep == keep
    assert got[0].edu_score == 0 and got[1].edu_score == 5


def test_edu_scores_zero_exchange_plan(spark):
    emb = spark.createDataFrame(
        [(0, [0.1] * 64)], "vec_id long, embedding array<double>"
    )
    plan = SIM.edu_scores(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_contamination_semantic_plan_broadcast_bench(spark):
    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    b = emb.select(F.col("vec_id").alias("bench_id"), "embedding").limit(2)
    plan = (
        SIM.contamination_semantic(emb, b)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan
