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
