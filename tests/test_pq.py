"""Product-quantization ANN vs a plain-Python reference replay."""

import math
from collections import defaultdict

from webcrawl_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"
M, KS, SD, ITERS, NQ, K = 8, 4, 8, 2, 6, 4


def _py_pq(rows):
    cent = {(m, cid): rows[cid][m * SD:(m + 1) * SD]
            for m in range(M) for cid in range(KS)}
    for _ in range(ITERS):
        assign = {}
        for i, v in rows.items():
            for m in range(M):
                sv = v[m * SD:(m + 1) * SD]
                best = min(
                    ((sum((a - b) ** 2 for a, b in zip(sv, cent[(m, c)])), c)
                     for c in range(KS) if (m, c) in cent)
                )
                assign[(i, m)] = best[1]
        sums = defaultdict(lambda: [[0] * SD, 0])
        for (i, m), cid in assign.items():
            s = sums[(m, cid)]
            for p in range(SD):
                s[0][p] += rows[i][m * SD + p]
            s[1] += 1
        cent = {
            (m, cid): [math.floor(sv[p] * 1.0 / n + 0.5) for p in range(SD)]
            for (m, cid), (sv, n) in sums.items()
        }
    codes = {}
    for i, v in rows.items():
        for m in range(M):
            sv = v[m * SD:(m + 1) * SD]
            cids = sorted(c for (mm, c) in cent if mm == m)
            codes[(i, m)] = min(
                (sum((a - b) ** 2 for a, b in zip(sv, cent[(m, c)])), c)
                for c in cids
            )[1]
    out = {}
    for q in range(NQ):
        qv, qn = rows[q], sum(x * x for x in rows[q])
        scored = []
        for i in rows:
            if i == q:
                continue
            dot = nx = 0
            for m in range(M):
                c = cent[(m, codes[(i, m)])]
                qs = qv[m * SD:(m + 1) * SD]
                dot += sum(a * b for a, b in zip(qs, c))
                nx += sum(x * x for x in c)
            acos = dot / math.sqrt(float(nx * qn))
            scored.append((-acos, i, round(acos, 4)))
        scored.sort()
        out[q] = [(i, a) for _, i, a in scored[:K]]
    return out


def test_pq_topk_matches_python_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = {
        r.vec_id: [math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
        for r in emb.collect()
    }
    exp = _py_pq(rows)
    got = defaultdict(list)
    for r in SIM.pq_topk(emb, n_queries=NQ, k=K, ks=KS).collect():
        got[r.query_id].append((r.neighbor_id, r.acos))
    for q in exp:
        assert sorted(got[q], key=lambda t: (-t[1], t[0])) == exp[q], q


def test_pq_recall_is_measured_and_plan_is_jvm_only(spark):
    import io
    import contextlib

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bf = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, n_queries=NQ, k=K).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in SIM.pq_topk(emb, n_queries=NQ, k=K, ks=KS).collect()
    }
    recall = len(bf & pq) / len(bf)
    assert 0.0 <= recall <= 1.0
    # 2-bit codes over random vectors are a COARSE approximation — the
    # point of the recall entry is to measure that, not to hide it; still
    # expect better-than-nothing overlap on the tiny fixture
    assert recall >= 0.05, recall
    # determinism: two runs rank identically
    pq2 = {
        (r.query_id, r.neighbor_id)
        for r in SIM.pq_topk(emb, n_queries=NQ, k=K, ks=KS).collect()
    }
    assert pq == pq2

    df = SIM.pq_topk(emb, n_queries=NQ, k=K, ks=KS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p   # ADC lookup + codebooks broadcast


def test_pq_rerank_with_full_shortlist_equals_brute_force(spark):
    """shortlist >= corpus-1 makes the ADC stage a no-op filter, so the
    exact-cosine rerank must reproduce brute_force_topk EXACTLY (same
    float fold, same tie-break) — pinning the rerank stage's scoring."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    bf = sorted(
        map(tuple, SIM.brute_force_topk(emb, n_queries=NQ, k=K).collect())
    )
    rr = sorted(
        map(
            tuple,
            SIM.pq_topk_rerank(
                emb, n_queries=NQ, k=K, ks=KS, shortlist=n
            ).collect(),
        )
    )
    assert rr == bf


def test_pq_delta_equals_whole_corpus_modulo_self(spark):
    """Scoring a 'delta' that IS the query set against the full-corpus
    persisted model must reproduce pq_topk exactly once self-matches are
    removed — pinning the incremental path to the whole-corpus path."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, cent, codes = SIM.pq_model_cached(emb, ks=KS)
    full = {
        q: rows
        for q, rows in _group(
            SIM.pq_topk(emb, n_queries=NQ, k=K, ks=KS).collect()
        ).items()
    }
    delta_rows = SIM.pq_delta_topk(
        emb.filter(f"vec_id < {NQ}"), cent, codes, k=K + 1
    ).collect()
    for q, rows in _group(delta_rows).items():
        no_self = [(n, a) for n, a in rows if n != q][:K]
        assert no_self == full[q], q


def _group(rows):
    out = {}
    for r in rows:
        val = r.acos if hasattr(r, "acos") else r.cos
        out.setdefault(r.query_id, []).append((r.neighbor_id, val))
    for q in out:
        out[q].sort(key=lambda t: (-t[1], t[0]))
    return out


def test_pq_partition_invariant(spark):
    """Codebooks, codes, and the ADC ranking must not depend on
    parallelism — integer Lloyd + deterministic tie-breaks everywhere."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = []
    try:
        for n in ("1", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got.append(
                sorted(
                    map(
                        tuple,
                        SIM.pq_topk(emb, n_queries=4, k=3, ks=KS).collect(),
                    )
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert got[0] == got[1]


def test_pq_degenerate_inputs(spark):
    """Empty deltas yield empty results; a corpus smaller than ks still
    fits (fewer centroids) and ranks."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, cent, codes = SIM.pq_model_cached(emb.filter("vec_id < 40"), ks=KS)
    assert SIM.pq_delta_topk(
        emb.filter("vec_id < 0"), cent, codes
    ).count() == 0
    tiny = SIM.pq_topk(emb.filter("vec_id < 5"), n_queries=2, k=2, ks=8)
    assert tiny.count() == 4  # 2 queries x top-2 of the other 4 vectors


def test_pq_topk_salt_invariant(spark):
    """The salted two-level top-k that replaced the n_queries-partition
    window must be EXACT: any salt (including 1 = the unsalted global
    sort) yields the identical result set."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sub, cent, codes = SIM.pq_model_cached(emb, ks=KS)
    qsub = sub.filter("id < 6")
    scored = SIM._adc_core(qsub, cent, codes, exclude_self=True)
    outs = []
    for salt in (1, 3, SIM.PQ_TOPK_SALT, 64):
        rows = SIM._topk_scored(scored, K, salt=salt).collect()
        outs.append(sorted((r.qid, r.nid, r.acos) for r in rows))
    assert outs[0] == outs[1] == outs[2] == outs[3]
    assert len(outs[0]) > 0
    SIM.pq_cache_clear()
