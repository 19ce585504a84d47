"""k-NN graph, mutual-kNN semantic clustering, and tf-idf keyword tests."""

import math

from pyspark.sql import functions as F

from webcrawl_spark.operators import similarity as SIM
from webcrawl_spark.functions import textstats as TS

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_knn_graph_all_nodes_matches_query_subset(spark):
    """n_queries=None must rank EVERY vector exactly as the query-limited
    path ranks its prefix — same quantizer, same candidates, same top-k."""
    emb = _emb(spark)
    full = SIM.kmeans_ivf_topk(emb, n_queries=None, k=3, probes=2)
    sub = SIM.kmeans_ivf_topk(emb, n_queries=6, k=3, probes=2)
    got = sorted(map(tuple, full.filter("query_id < 6").collect()))
    want = sorted(map(tuple, sub.collect()))
    assert got == want

    n_vecs = emb.count()
    rows = full.collect()
    assert {r.query_id for r in rows} == set(range(n_vecs))
    assert all(r.query_id != r.neighbor_id for r in rows)
    per = {}
    for r in rows:
        per[r.query_id] = per.get(r.query_id, 0) + 1
    assert max(per.values()) <= 3


def _toy_emb(spark):
    """8 vectors in 4-d: ids 0/1 nearly parallel, 2/3 nearly parallel,
    4-7 mutually far apart AND far from both pairs."""
    rows = [
        (0, [1.0, 0.02, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.03, 0.0]),
        (2, [0.0, 1.0, 0.02, 0.0]),
        (3, [0.02, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, -0.9]),
        (5, [-1.0, 0.1, 0.0, 0.4]),
        (6, [0.3, -0.9, 0.1, 0.6]),
        (7, [-0.2, 0.1, -1.0, -0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_clusters_toy(spark):
    """The two near-parallel pairs cluster (min id canonical); everything
    else stays a singleton at a high tau."""
    out = {
        r.id: (r.cluster_id, r.is_canonical)
        for r in SIM.semantic_clusters(
            _toy_emb(spark), k=2, tau=0.9, k_clusters=4, iters=2, probes=2
        ).collect()
    }
    assert out[0] == (0, True) and out[1] == (0, False)
    assert out[2] == (2, True) and out[3] == (2, False)
    for i in range(4, 8):
        assert out[i] == (i, True), (i, out[i])


def test_semantic_clusters_requires_mutual_edges(spark):
    """A one-directional k-NN edge must NOT merge clusters: with k=1,
    node 2's nearest is node 1, but node 1's nearest is node 0 — so
    0~1 is mutual and 2 stays out even though cos(1,2) passes tau."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [0.9, 0.4, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    knn = SIM.kmeans_ivf_topk(
        emb, n_queries=None, k=1, k_clusters=4, iters=2, probes=2
    )
    edges = {(r.query_id, r.neighbor_id) for r in knn.collect()}
    assert (2, 1) in edges and (1, 0) in edges  # 2->1 one-directional
    out = {
        r.id: r.cluster_id
        for r in SIM.semantic_clusters(
            emb, k=1, tau=0.5, k_clusters=4, iters=2, probes=2
        ).collect()
    }
    assert out[0] == 0 and out[1] == 0
    assert out[2] == 2, "one-directional edge must not chain node 2 in"


def test_tfidf_topk_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha alpha beta gamma"),
            (1, "alpha delta delta"),
            (2, "beta gamma epsilon"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id, r.rk): (r.term, r.tf, r.score_micro)
        for r in TS.tfidf_topk(docs, k=3).collect()
    }
    ln43 = round(math.log(4 / 3) * 1e6)  # df=2: 287682
    ln2 = round(math.log(2) * 1e6)       # df=1: 693147
    assert got[(0, 1)] == ("alpha", 2, 2 * ln43)
    assert got[(0, 2)] == ("beta", 1, ln43)   # tie with gamma -> term ASC
    assert got[(0, 3)] == ("gamma", 1, ln43)
    assert got[(1, 1)] == ("delta", 2, 2 * ln2)
    assert got[(1, 2)] == ("alpha", 1, ln43)
    assert got[(2, 1)] == ("epsilon", 1, ln2)
    assert got[(2, 2)] == ("beta", 1, ln43)
    assert (1, 3) not in got  # only 2 qualifying terms in doc 1


def test_tfidf_min_term_len_and_k(spark):
    docs = spark.createDataFrame(
        [(0, "a bb ccc dddd eeee dddd"), (1, "dddd ffff")],
        "doc_id long, text string",
    )
    rows = TS.tfidf_topk(docs, k=1).collect()
    by_id = {r.id: r for r in rows}
    assert len(rows) == 2
    # short tokens never appear; doc 0's top term is its rarest long one?
    # dddd df=2 (idf ln(3/3)=0 -> 0), eeee df=1 -> positive: eeee wins.
    assert by_id[0].term == "eeee"
    assert by_id[1].term == "ffff"
