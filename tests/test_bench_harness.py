"""Pins for the bench.py scaling harnesses — the corpus synthesis and the
measured job must be deterministic, or the two parallelism legs compare
different work and the efficiency number is fiction."""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_synth_dedup_docs_structure(spark):
    """synth_dedup_docs: mult copies per base doc, copy%8==0 verbatim
    (exact-dup groups), other copies mutated but shingle-overlapping,
    ids are a disjoint re-keying."""
    mult = 8
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_base = base.count()
    rep = bench.synth_dedup_docs(spark, "/root/testdata/sf0.001", mult)
    rows = {r["doc_id"]: r["text"] for r in rep.collect()}
    assert len(rows) == n_base * mult
    texts = {r["doc_id"]: r["text"] for r in base.select("doc_id", "text").collect()}
    for d, t in list(texts.items())[:20]:
        # copy 0 (and only copy 0 at mult=8) keeps the text verbatim
        assert rows[d * mult] == t
        others = [rows[d * mult + c] for c in range(1, mult)]
        assert all(o != t for o in others)
        # mutation is rotation + inserted token: same multiset of chars
        # minus the injected " v<copy> " marker, so a long common
        # substring survives (near-dup, not noise)
        assert all(len(o) >= len(t) for o in others)
    # determinism: re-deriving the frame yields identical content
    again = {
        r["doc_id"]: r["text"]
        for r in bench.synth_dedup_docs(spark, "/root/testdata/sf0.001", mult).collect()
    }
    assert again == rows


def test_synth_ann_vecs_structure(spark):
    """synth_ann_vecs: queries (vec_id < n_base) are the verbatim base
    vectors at every scale; perturbed copies differ but stay within the
    lattice step of the base."""
    mult = 8
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_base = base.count()
    rep = bench.synth_ann_vecs(spark, "/root/testdata/sf0.001", mult)
    rows = {r["vec_id"]: list(r["embedding"]) for r in rep.collect()}
    assert len(rows) == n_base * mult
    for r in base.limit(10).collect():
        v = list(r["embedding"])
        assert rows[r["vec_id"]] == v                       # copy 0 verbatim
        pert = rows[1 * n_base + r["vec_id"]]               # copy 1 perturbed
        assert pert != v
        assert all(abs(a - b) <= 0.031 for a, b in zip(pert, v))


def test_run_ann_digest_layout_invariant(spark, tmp_path):
    """run_ann's result digest is independent of input layout — the
    property main_scaling_ann's cross-leg equality assertion relies on."""
    p1 = str(tmp_path / "v1")
    p2 = str(tmp_path / "v2")
    rep = bench.synth_ann_vecs(spark, "/root/testdata/sf0.001", 4)
    rep.repartition(2).write.parquet(p1)
    rep.repartition(7).write.parquet(p2)
    _, n1, d1 = bench.run_ann(spark, p1)
    _, n2, d2 = bench.run_ann(spark, p2)
    assert n1 == n2 == rep.count()
    assert d1 == d2


def test_run_dedup_deterministic_pairs(spark, tmp_path):
    """The measured job's pair count is independent of input layout
    (repartitioning the corpus must not change the candidate set) — the
    property the cross-leg `pairs` equality assertion in
    main_scaling_dedup relies on."""
    p1 = str(tmp_path / "d1")
    p2 = str(tmp_path / "d2")
    rep = bench.synth_dedup_docs(spark, "/root/testdata/sf0.001", 4)
    rep.repartition(2).write.parquet(p1)
    rep.repartition(7).write.parquet(p2)
    _, n1, pairs1 = bench.run_dedup(spark, p1)
    _, n2, pairs2 = bench.run_dedup(spark, p2)
    assert n1 == n2 == rep.count()
    assert pairs1 == pairs2 > 0
