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
