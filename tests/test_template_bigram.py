"""Hand-traced cases for per-host template detection and held-out bigram
LM scoring with stupid backoff (functions/textstats.template_lines /
.bigram_lm_score)."""

import math

from webcrawl_spark.functions import textstats as TS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_template_lines_thresholds_and_within_doc_dedup(spark):
    rows = []
    for i in range(10):
        lines = ["nav"]
        if i == 0:
            lines.append("nav")        # duplicate within one doc: counts ONCE
        if i < 5:
            lines.append("five")       # 500 permille -> flagged template
        if i < 3:
            lines.append("three")      # 300 permille -> reported, not flagged
        if i < 1:
            lines.append("one")        # 100 permille -> dropped
        rows.append((i, "h1", "\n".join(lines)))
    got = {
        r.line: (r.n_docs, r.frac_permille, r.is_template)
        for r in TS.template_lines(_docs(spark, rows)).collect()
    }
    assert got == {
        "nav": (10, 1000, True),
        "five": (5, 500, True),
        "three": (3, 300, False),
    }


def test_template_lines_are_per_host(spark):
    """The same line shared by two hosts is judged against EACH host's
    doc count, never pooled."""
    rows = [(0, "a", "shared"), (1, "a", "other"),
            (2, "b", "shared"), (3, "b", "shared")]
    got = {
        (r.grp, r.line): r.frac_permille
        for r in TS.template_lines(_docs(spark, rows)).collect()
    }
    assert got[("a", "shared")] == 500
    assert got[("b", "shared")] == 1000
    assert got[("a", "other")] == 500


def test_bigram_lm_branches_hand_traced(spark):
    """train 'a b c a b': cb={(a,b):2,(b,c):1,(c,a):1}, cc={a:2,b:1,c:1},
    uni={a:2,b:2,c:1}, T=5. score 'a b x c': (a,b) bigram hit lp=0;
    (b,x) OOV floor; (x,c) unigram backoff — both ln(0.4/5)."""
    train = _docs(spark, [(1, "s", "a b c a b")])
    score = _docs(spark, [(2, "s", "a b x c")])
    got = TS.bigram_lm_score(train, score).collect()
    assert len(got) == 1
    r = got[0]
    lp_floor = round(math.log(0.4 * 1.0 / 5) * 1e6)
    assert (r.n_bigrams, r.n_backoff, r.n_oov) == (3, 1, 1)
    assert r.sum_lp_micronat == 0 + 2 * lp_floor
    assert r.avg_lp_micronat == int((2 * lp_floor) / 3)  # div truncates to zero


def test_bigram_lm_short_docs_drop_out(spark):
    train = _docs(spark, [(1, "s", "a b a b")])
    score = _docs(spark, [(2, "s", "a"), (3, "s", "  "), (4, "s", "a b")])
    got = {r.doc_id for r in TS.bigram_lm_score(train, score).collect()}
    assert got == {4}


def test_strip_template_lines_order_and_accounting(spark):
    rows = []
    for i in range(4):
        lines = [f"body {i} first", "nav", f"body {i} second"]
        rows.append((i, "h1", "\n".join(lines)))
    docs = _docs(spark, rows)
    tmpl = TS.template_lines(docs)   # nav at 1000 permille -> template
    got = {r.doc_id: r for r in TS.strip_template_lines(docs, tmpl).collect()}
    assert got[0].text_clean == "body 0 first\nbody 0 second"
    assert (got[0].n_kept, got[0].n_stripped) == (2, 1)


def test_strip_template_lines_all_template_doc_survives_empty(spark):
    rows = [(i, "h1", "nav") for i in range(4)] + [(9, "h1", "nav\nnav")]
    docs = _docs(spark, rows)
    tmpl = TS.template_lines(docs)
    got = {r.doc_id: r for r in TS.strip_template_lines(docs, tmpl).collect()}
    assert got[9].text_clean == ""
    assert (got[9].n_kept, got[9].n_stripped) == (0, 2)  # dup line: both pos
