"""ANN operator tests: k-means IVF determinism and recall vs brute force."""

from webcrawl_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_ivf_recall_vs_brute(spark):
    emb = _emb(spark)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, n_queries=6, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in SIM.kmeans_ivf_topk(emb, n_queries=6, k=5, probes=2).collect()
    }
    recall = len(brute & ann) / len(brute)
    # coarse quantizer + 2 probes on tiny data: expect meaningful overlap
    assert recall >= 0.4, recall
    # more probes can only widen the candidate set -> recall is monotone
    ann4 = {
        (r.query_id, r.neighbor_id)
        for r in SIM.kmeans_ivf_topk(emb, n_queries=6, k=5, probes=4).collect()
    }
    assert len(brute & ann4) >= len(brute & ann)


def test_kmeans_ivf_deterministic(spark):
    emb = _emb(spark)
    a = sorted(map(tuple, SIM.kmeans_ivf_topk(emb, n_queries=4, k=3).collect()))
    b = sorted(map(tuple, SIM.kmeans_ivf_topk(emb, n_queries=4, k=3).collect()))
    assert a == b


def test_neardup_incremental_subset_of_exact_and_deterministic(spark):
    """Incremental delta-vs-corpus near-dup: every emitted pair must exist
    in the exact delta x corpus cosine join (the probes only LIMIT the
    candidate set, never invent pairs), the cos values must be the exact
    scores, and two runs from the same persisted model are identical."""
    emb = _emb(spark)
    corpus = emb.filter("vec_id % 5 <> 4")
    delta = emb.filter("vec_id % 5 = 4")
    cent = SIM.kmeans_fit(corpus)
    ranked = SIM.assign_ranked(corpus, cent)
    inc = SIM.neardup_incremental(
        delta, ranked, cent, corpus, threshold=0.3, probes=2
    )
    got = {(r.a, r.b, r.cos) for r in inc.collect()}
    assert got, "tiny fixture should still produce some near-dup pairs"

    exact = {
        (r.a, r.b, r.cos)
        for r in SIM.neardup_pairs_cross(delta, corpus, threshold=0.3).collect()
    }
    assert got <= exact
    # delta ids on the left, corpus ids on the right — never flipped
    assert all(a % 5 == 4 and b % 5 != 4 for a, b, _ in got)

    again = {
        (r.a, r.b, r.cos)
        for r in SIM.neardup_incremental(
            delta, ranked, cent, corpus, threshold=0.3, probes=2
        ).collect()
    }
    assert got == again
