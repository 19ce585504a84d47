"""Unit battery for the composite quality gate, per-group term stats,
class-balanced sampling (functions/textstats) and the inter-crawl
snapshot diff (operators/snapshot)."""

from pyspark.sql import functions as F

from webcrawl_spark.functions.textstats import (
    GOPHER_MIN_WORDS,
    balanced_sample,
    gopher_filter,
    topk_terms,
    unigram_lm_score,
)
from webcrawl_spark.operators.snapshot import (
    change_rate_estimate,
    recrawl_ranks,
    snapshot_diff,
    snapshot_diff_stats,
)

OK_TEXT = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the woods while birds watch from tall trees near a quiet river "
    "bank where children often play games during long summer afternoons"
)


def test_gopher_filter_rules_fire_in_order(spark):
    docs = spark.createDataFrame(
        [
            (1, OK_TEXT),                       # passes all rules
            (2, "too short"),                   # rule: too_few_words
            (3, " ".join(["ab"] * 40)),         # mwl 200 < 300 → word_length
            # enough words, sane mwl, but one bigram dominates → repetition
            (4, " ".join(["the spam"] * 20)),
            # 30+ distinct words, no stopwords → no_stopwords
            (5, " ".join(f"w{i:02d}xx" for i in range(35))),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert out[1].reason == "ok" and out[1].keep
    assert out[2].reason == "too_few_words" and not out[2].keep
    assert out[2].n_words < GOPHER_MIN_WORDS
    assert out[3].reason == "word_length" and out[3].mwl_x100 == 200
    assert out[4].reason == "repetition" and out[4].dup_ngram_frac > 0.05
    assert out[5].reason == "no_stopwords" and out[5].stop_hits < 2


def test_gopher_filter_first_failing_rule_wins(spark):
    # 2 words AND no stopwords AND bad mwl: reason must be the FIRST rule
    docs = spark.createDataFrame([(1, "zz zz")], "doc_id long, text string")
    assert gopher_filter(docs).collect()[0].reason == "too_few_words"


def test_topk_terms_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "alpha alpha alpha beta beta gamma"),
            (2, "a", "beta delta delta"),
            (3, "b", "omega"),
        ],
        "doc_id long, source string, text string",
    )
    rows = topk_terms(docs, "source", k=2, min_len=4).collect()
    a = sorted((r.term, r.tf, r.rank) for r in rows if r.grp == "a")
    # alpha tf=3 rank1; beta tf=3 rank2 (tie broken alphabetically)
    assert a == [("alpha", 3, 1), ("beta", 3, 2)]
    b = [(r.term, r.tf, r.rank) for r in rows if r.grp == "b"]
    assert b == [("omega", 1, 1)]


def test_topk_terms_min_len_drops_short_words(spark):
    docs = spark.createDataFrame(
        [(1, "a", "to be or not longword longword")],
        "doc_id long, source string, text string",
    )
    rows = topk_terms(docs, "source", k=5, min_len=4).collect()
    assert [(r.term, r.tf) for r in rows] == [("longword", 2)]


def test_balanced_sample_caps_big_class_keeps_small_whole(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 280, "en").otherwise("fr").alias("lang"),
    )
    out = balanced_sample(docs, "lang", cap=20, id_col="doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # fr (20 rows ≤ cap): kept whole. en (280 rows): hash-rate sampled at
    # 20/280 — expected 20, binomial spread tolerated.
    assert counts["fr"] == 20
    assert 5 <= counts["en"] <= 45

    # determinism + partition independence: same membership at 1 partition
    one = balanced_sample(docs.coalesce(1), "lang", cap=20, id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in one.collect()
    )


def test_unigram_lm_score_hand_computed(spark):
    # corpus: tf(a)=2 tf(b)=2 tf(c)=1, T=5
    # lp(a)=lp(b)=round(ln(0.4)*1e6)=-916291; lp(c)=round(ln(0.2)*1e6)=-1609438
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    assert (out[1].n_tokens, out[1].sum_lp_micronat) == (3, 3 * -916291)
    assert out[1].avg_lp_micronat == -916291
    assert (out[2].n_tokens, out[2].sum_lp_micronat) == (2, -916291 - 1609438)
    # integer div truncates toward zero: -2525729 / 2 -> -1262864
    assert out[2].avg_lp_micronat == -1262864
    # common-word doc scores HIGHER (less negative) than the rare-token doc
    assert out[1].avg_lp_micronat > out[2].avg_lp_micronat


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d2"), ("u3", "d3")], "url string, digest string"
    )
    new = spark.createDataFrame(
        [("u1", "d1"), ("u2", "dX"), ("u4", "d4")], "url string, digest string"
    )
    out = {r.url: r for r in snapshot_diff(old, new).collect()}
    assert out["u1"].status == "unchanged"
    assert out["u2"].status == "changed" and out["u2"].new_digest == "dX"
    assert out["u3"].status == "deleted" and out["u3"].new_digest is None
    assert out["u4"].status == "new" and out["u4"].old_digest is None
    stats = {r.status: r.n_urls for r in snapshot_diff_stats(
        snapshot_diff(old, new)).collect()}
    assert stats == {"unchanged": 1, "changed": 1, "deleted": 1, "new": 1}


def test_recrawl_ranks_rate_boost_and_exclusions(spark):
    # hot host: 2 changed / 1 unchanged + 1 new + 1 deleted
    # cold host: 2 unchanged; fresh host: 1 new (no revisits → rate 0)
    diff = spark.createDataFrame(
        [
            ("http://hot.test/a", "changed"),
            ("http://hot.test/b", "changed"),
            ("http://hot.test/c", "unchanged"),
            ("http://hot.test/d", "new"),
            ("http://hot.test/e", "deleted"),
            ("http://cold.test/a", "unchanged"),
            ("http://cold.test/b", "unchanged"),
            ("http://fresh.test/a", "new"),
        ],
        "url string, status string",
    )
    out = {r.url: r.rank for r in recrawl_ranks(diff).collect()}
    # hot rate = 2*1000 // 3 = 666; changed urls get +1000 on top
    assert out["http://hot.test/a"] == 1666
    assert out["http://hot.test/c"] == 666
    assert out["http://hot.test/d"] == 666      # new inherits host rate
    assert out["http://cold.test/a"] == 0
    assert out["http://fresh.test/a"] == 0      # all-new host: rate 0
    assert "http://hot.test/e" not in out       # deleted dropped


def test_recrawl_ranks_feed_priority_fold(spark):
    """The snapshot→rank loop closes: recrawl_ranks output is a valid
    ranks table for the crawler's shared priority fold — a changed url
    on a churny host sorts ahead of an unchanged same-class url."""
    from webcrawl_spark.functions.rankprio import fold_rank_priority

    diff = spark.createDataFrame(
        [
            ("http://h.test/chg", "changed"),
            ("http://h.test/same", "unchanged"),
        ],
        "url string, status string",
    )
    frontier = spark.createDataFrame(
        [("http://h.test/chg", 3), ("http://h.test/same", 3)],
        "url string, priority long",
    )
    got = {
        r.url: r.priority
        for r in fold_rank_priority(frontier, recrawl_ranks(diff)).collect()
    }
    # same base class: higher rank → smaller folded priority → fetched first
    assert got["http://h.test/chg"] < got["http://h.test/same"]


def test_host_quality_rollup_rules_fire_in_order(spark):
    from webcrawl_spark.functions.textstats import host_quality_rollup

    good = OK_TEXT + " with extra padding words appended here"  # score > 40
    poor = "tiny text"                  # score under 40
    rows = []
    rows += [(i, "few.test", good) for i in range(2)]          # too_few_docs
    rows += [(10 + i, "low.test", poor) for i in range(4)]     # low_quality
    # 4 docs, 2 of them the same fingerprint → 500 permille > 150
    rows += [(20, "dup.test", good + " one"), (21, "dup.test", good + " one"),
             (22, "dup.test", good + " two"), (23, "dup.test", good + " three")]
    rows += [(30 + i, "ok.test", good + f" v{i}") for i in range(4)]  # ok
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r.host: r for r in host_quality_rollup(docs).collect()}
    assert out["few.test"].reason == "too_few_docs" and not out["few.test"].keep
    assert out["low.test"].reason == "low_quality"
    assert out["dup.test"].reason == "too_many_dups"
    assert out["dup.test"].dup_permille == 500
    assert out["ok.test"].reason == "ok" and out["ok.test"].keep


def test_host_quality_rollup_charges_cross_host_dups(spark):
    from webcrawl_spark.functions.textstats import host_quality_rollup

    good = OK_TEXT + " with extra padding words appended here"
    # the duplicate pair is SPLIT across hosts — both must be charged
    docs = spark.createDataFrame(
        [
            (1, "a.test", good + " same"), (2, "b.test", good + " same"),
            (3, "a.test", good + " ua1"), (4, "a.test", good + " ua2"),
            (5, "b.test", good + " ub1"), (6, "b.test", good + " ub2"),
        ],
        "doc_id long, host string, text string",
    )
    out = {r.host: r for r in host_quality_rollup(docs).collect()}
    assert out["a.test"].n_dups == 1 and out["b.test"].n_dups == 1
    assert out["a.test"].dup_permille == 333  # div(1000, 3)


def test_change_rate_estimate_hand_computed(spark):
    import math

    # u_never: 4 obs, 0 changes → λ̂ = -ln(3.5/3.5)·3/3 = 0, revisit NULL
    # u_every: 4 obs, 3/3 changes → λ̂ = -ln(0.5/3.5)·3/3 (the X=n edge)
    # u_gap:   obs at snaps 0,2,3 → n=2, span=3, 1 change
    # u_once:  single observation → no pair evidence, dropped
    hist = spark.createDataFrame(
        [
            ("u_never", 0, "a"), ("u_never", 1, "a"),
            ("u_never", 2, "a"), ("u_never", 3, "a"),
            ("u_every", 0, "a"), ("u_every", 1, "b"),
            ("u_every", 2, "c"), ("u_every", 3, "d"),
            ("u_gap", 0, "a"), ("u_gap", 2, "a"), ("u_gap", 3, "b"),
            ("u_once", 1, "z"),
        ],
        "url string, snap int, digest string",
    )
    out = {r.url: r for r in change_rate_estimate(hist).collect()}
    assert "u_once" not in out and len(out) == 3

    r = out["u_never"]
    assert (r.n_obs, r.n_changes, r.span) == (3, 0, 3)
    assert r.lambda_micro == 0 and r.revisit_snaps is None

    r = out["u_every"]
    assert (r.n_obs, r.n_changes, r.span) == (3, 3, 3)
    expected = round(-math.log(0.5 / 3.5) * 1e6)
    assert r.lambda_micro == expected
    assert r.revisit_snaps == 1  # ceil(1e6 / 1945910) = 1

    r = out["u_gap"]
    assert (r.n_obs, r.n_changes, r.span) == (2, 1, 3)
    expected = round(-math.log(1.5 / 2.5) * 2 / 3 * 1e6)
    assert r.lambda_micro == expected
    assert r.revisit_snaps == 3  # ceil(1e6 / 340573) = 3


def test_change_rate_single_exchange_plan(spark):
    import re

    hist = spark.createDataFrame(
        [("u", 0, "a"), ("u", 1, "b")], "url string, snap int, digest string"
    )
    plan = (
        change_rate_estimate(hist)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the lag window and the per-url aggregate share one url partitioning
    assert len(re.findall(r"\bExchange\b", plan)) == 1
    assert "EvalPython" not in plan


def test_change_rate_ranks_feed_priority_fold(spark):
    """The adaptive-recrawl loop closes: change_rate_ranks output is a
    valid ranks table for the crawler's shared priority fold — the
    every-snapshot-changing url sorts ahead of the never-changing one
    within the same base class."""
    from webcrawl_spark.functions.rankprio import fold_rank_priority
    from webcrawl_spark.operators.snapshot import change_rate_ranks

    hist = spark.createDataFrame(
        [
            ("http://h.test/hot", 0, "a"), ("http://h.test/hot", 1, "b"),
            ("http://h.test/hot", 2, "c"), ("http://h.test/hot", 3, "d"),
            ("http://h.test/cold", 0, "a"), ("http://h.test/cold", 1, "a"),
            ("http://h.test/cold", 2, "a"), ("http://h.test/cold", 3, "a"),
        ],
        "url string, snap int, digest string",
    )
    ranks = change_rate_ranks(change_rate_estimate(hist))
    got_ranks = {r.url: r.rank for r in ranks.collect()}
    assert got_ranks["http://h.test/hot"] == 1945  # -ln(0.5/3.5)·1e6 div 1e3
    assert got_ranks["http://h.test/cold"] == 0
    frontier = spark.createDataFrame(
        [("http://h.test/hot", 3), ("http://h.test/cold", 3)],
        "url string, priority long",
    )
    got = {
        r.url: r.priority
        for r in fold_rank_priority(frontier, ranks).collect()
    }
    assert got["http://h.test/hot"] < got["http://h.test/cold"]


def test_host_rank_feeds_priority_fold(spark):
    """The domain-rank loop closes: host_rank output rolled to URL ranks
    is a valid table for the crawler's shared priority fold — a URL on
    the high-rank host sorts ahead of a same-class URL on the low-rank
    host, and the base class still dominates the rank."""
    from webcrawl_spark.functions.rankprio import fold_rank_priority
    from webcrawl_spark.operators.graph import host_ranks_to_url_ranks

    host_ranks = spark.createDataFrame(
        [("big.test", 4_000_000), ("small.test", 160_000)],
        "host string, hrank long",
    )
    frontier = spark.createDataFrame(
        [
            ("http://big.test/a", 3),    # same class, high-rank host
            ("http://small.test/a", 3),  # same class, low-rank host
            ("http://small.test/r", 2),  # BETTER class, low-rank host
        ],
        "url string, priority long",
    )
    ranks = host_ranks_to_url_ranks(host_ranks, frontier.select("url"))
    got = {r.url: r.priority for r in fold_rank_priority(frontier, ranks).collect()}
    assert got["http://big.test/a"] < got["http://small.test/a"]
    assert got["http://small.test/r"] < got["http://big.test/a"]


def test_host_backoff_thresholds_and_floor(spark):
    """AIMD politeness: 429/5xx are pushback, plain 4xx is not; each
    crossed threshold halves the budget; the budget floors at 1."""
    from webcrawl_spark.operators.snapshot import host_backoff

    rows = (
        [("a.t", 200)] * 19 + [("a.t", 503)]          # exactly 50 permille
        + [("b.t", 200)] * 19 + [("b.t", 404)]        # 4xx: no pushback
        + [("c.t", 429)] * 7 + [("c.t", 200)] * 3     # 700 permille
        + [("d.t", 500)] * 10                          # 1000 permille
    )
    log = spark.createDataFrame(rows, "host string, status int")
    got = {
        r.host: (r.err_permille, r.backoff_shift, r.budget)
        for r in host_backoff(log, base_budget=64).collect()
    }
    assert got["a.t"] == (50, 1, 32)    # boundary: >= threshold counts
    assert got["b.t"] == (0, 0, 64)
    assert got["c.t"] == (700, 3, 8)
    assert got["d.t"] == (1000, 3, 8)
    # floor: a tiny base budget never reaches zero
    floor = {
        r.host: r.budget
        for r in host_backoff(log, base_budget=2).collect()
    }
    assert floor["d.t"] == 1


def test_host_backoff_plan_shape(spark):
    from webcrawl_spark.operators.snapshot import host_backoff

    log = spark.createDataFrame([("a.t", 200)], "host string, status int")
    plan = (
        host_backoff(log)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_focused_crawl_ranks_feed_priority_fold(spark):
    """The focused-crawl loop closes: edu-classifier buckets shaped as a
    (url, rank) table steer the crawler's shared priority fold — within
    a class the predicted-educational URL fetches first, and the base
    class still dominates the classifier signal."""
    from webcrawl_spark.functions.rankprio import fold_rank_priority
    from webcrawl_spark.queries import EDU_RANK_SCALE

    ranks = spark.createDataFrame(
        [("http://a.test/edu", 5 * EDU_RANK_SCALE),
         ("http://a.test/junk", 0 * EDU_RANK_SCALE)],
        "url string, rank long",
    )
    frontier = spark.createDataFrame(
        [
            ("http://a.test/edu", 3),
            ("http://a.test/junk", 3),   # same class, zero-bucket page
            ("http://a.test/seed", 2),   # better class beats any bucket
        ],
        "url string, priority long",
    )
    got = {
        r.url: r.priority
        for r in fold_rank_priority(frontier, ranks).collect()
    }
    assert got["http://a.test/edu"] < got["http://a.test/junk"]
    assert got["http://a.test/seed"] < got["http://a.test/edu"]


def test_backoff_budgets_feed_politeness_selection(spark):
    """The AIMD loop closes: per-host budgets from host_backoff drive
    the REAL select_polite as a Column — the degraded host is throttled
    to its halved budget, the healthy host fetches in full."""
    from webcrawl_spark.operators.snapshot import host_backoff
    from webcrawl_spark.plans.round import select_polite

    log = spark.createDataFrame(
        [("bad.t", 500)] * 6 + [("bad.t", 200)] * 4 + [("ok.t", 200)] * 10,
        "host string, status int",
    )
    budgets = host_backoff(log, base_budget=4).select("host", "budget")
    fr = spark.createDataFrame(
        [(h, p, p, f"{h}/{p}") for h in ("bad.t", "ok.t") for p in range(9)],
        "host string, priority long, seq long, url_key string",
    )
    sel = select_polite(
        fr.join(budgets, "host"), F.col("budget"), salt_buckets=2,
        rank_col="rn",
    )
    got = {}
    for r in sel.collect():
        got.setdefault(r.host, []).append(r.seq)
    # bad.t: 600 permille -> shift 3 -> budget max(1, 4 div 8) = 1
    assert sorted(got["bad.t"]) == [0]
    # ok.t: full base budget 4, lowest priorities first
    assert sorted(got["ok.t"]) == [0, 1, 2, 3]


def test_host_backoff_null_status_is_not_pushback(spark):
    from webcrawl_spark.operators.snapshot import host_backoff

    log = spark.createDataFrame(
        [("a.t", None), ("a.t", None), ("b.t", 503), ("b.t", None)],
        "host string, status int",
    )
    got = {
        r.host: (r.n_fetches, r.n_errors, r.budget)
        for r in host_backoff(log, base_budget=8).collect()
    }
    assert got["a.t"] == (2, 0, 8)       # all-NULL host: zero errors
    assert got["b.t"] == (2, 1, 1)       # 500 permille crosses all 3 thresholds
