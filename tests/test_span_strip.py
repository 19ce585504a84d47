"""Hand-computed tests for duplicate_span_strip (the ExactSubstr removal
consumer of duplicate_spans)."""

import re

from webcrawl_spark.operators import textdedup as TD


def _replay(corpus: dict[int, str], n: int):
    """Plain-Python replay of flag + strip."""
    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in corpus.items()}
    grams: dict[str, set[int]] = {}
    starts: dict[int, list[int]] = {i: [] for i in corpus}
    for i, w in toks.items():
        for p in range(len(w) - n + 1):
            grams.setdefault(" ".join(w[p:p + n]), set()).add(i)
    dup = {g for g, ids in grams.items() if len(ids) >= 2}
    for i, w in toks.items():
        for p in range(len(w) - n + 1):
            if " ".join(w[p:p + n]) in dup:
                starts[i].append(p)
    out = {}
    for i, w in toks.items():
        cov = set()
        for p in starts[i]:
            cov.update(range(p, p + n))
        kept = [x for j, x in enumerate(w) if j not in cov]
        out[i] = (len(w), len(cov), " ".join(kept))
    return out


def test_duplicate_span_strip_hand_computed(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    corpus = {
        # doc 1: shared gram mid-document, unique pre/post text survives
        1: f"one two three {shared} nine ten",
        # doc 2: two OVERLAPPING flagged grams (the 9-word window opens
        # two 8-grams sharing 7 positions) — covered set must merge
        2: f"{shared} india x y z",
        # doc 3: fully covered (exactly the shared gram, nothing else)
        3: shared,
        # doc 4: no duplicated gram — passes through intact
        4: "the quick brown fox jumps over a lazy dog today",
    }
    # make doc 2's trailing 'india' extension also duplicated (doc 5
    # repeats it) so overlapping-window merging is actually exercised
    corpus[5] = f"{shared} india unique5 tail5 end5"
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in TD.duplicate_span_strip(docs, n=8).collect()}
    exp = _replay(corpus, 8)
    assert set(got) == set(exp)
    for i, (n_words, n_cut, clean) in exp.items():
        assert got[i].n_words == n_words, (i, got[i], exp[i])
        assert got[i].n_cut == n_cut, (i, got[i], exp[i])
        assert got[i].text_clean == clean, (i, got[i], exp[i])
    # the fixture exercised all three regimes
    assert exp[3][2] == ""                      # fully covered
    assert exp[4][1] == 0                       # untouched
    assert 0 < exp[1][1] < exp[1][0]            # partial cut


def test_duplicate_span_strip_short_docs_pass_through(spark):
    # documents shorter than n words can open no gram and survive whole
    docs = spark.createDataFrame(
        [(1, "too short to gram"), (2, "too short to gram")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TD.duplicate_span_strip(docs, n=8).collect()}
    for i in (1, 2):
        assert got[i].n_cut == 0
        assert got[i].text_clean == "too short to gram"
