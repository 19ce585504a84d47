"""PII scrub unit battery (functions/textstats.pii_scrub)."""

from webcrawl_spark.functions.textstats import pii_scrub


def test_pii_scrub_kinds_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.example.com and root@h.io now"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 or 555.987.6543"),
            (4, "clean text, no pii at all"),
            (5, "mixed bob@example.org from 8.8.8.8 dial 555-000-1111"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text_clean == "mail <EMAIL> and <EMAIL> now"
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (2, 0, 0)
    assert out[2].text_clean == "server <IP> and <IP> up"
    assert out[2].n_ip == 2
    assert out[3].text_clean == "call <PHONE> or <PHONE>"
    assert out[3].n_phone == 2
    assert out[4].text_clean == "clean text, no pii at all"
    assert (out[4].n_email, out[4].n_ip, out[4].n_phone) == (0, 0, 0)
    assert out[5].text_clean == "mixed <EMAIL> from <IP> dial <PHONE>"


def test_pii_scrub_email_domain_not_half_eaten_as_ip(spark):
    """Emails are scrubbed before IPs: a numeric-ish domain must not
    leave a dangling IP match behind."""
    docs = spark.createDataFrame(
        [(1, "x 1a@127.0.0.1.example.com y")], "doc_id long, text string"
    )
    r = pii_scrub(docs).collect()[0]
    assert r.n_email == 1 and r.n_ip == 0
    assert r.text_clean == "x <EMAIL> y"


def test_repetition_stats_fractions(spark):
    from webcrawl_spark.functions.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # 3 bigrams, all 'spam spam'
            (2, "all words here are different"), # 4 bigrams, all distinct
            (3, "word"),                          # shorter than n → no signal
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs, n=2).collect()}
    assert (out[1].total_ngrams, out[1].distinct_ngrams) == (3, 1)
    assert out[1].dup_ngram_frac == 0.666667 and out[1].top_ngram_frac == 1.0
    assert (out[2].total_ngrams, out[2].distinct_ngrams) == (4, 4)
    assert out[2].dup_ngram_frac == 0.0 and out[2].top_ngram_frac == 0.25
    # no-signal doc: zero counts, NULL fractions (not a perfect score)
    assert (out[3].total_ngrams, out[3].distinct_ngrams) == (0, 0)
    assert out[3].dup_ngram_frac is None and out[3].top_ngram_frac is None


def test_pmi_collocations_hand_computed(spark):
    """3-doc corpus: sentinel bigram table, marginals, micro-nat PMI and
    the min_count / sentinel-exclusion rules, replayed by hand."""
    import math

    from webcrawl_spark.functions.textstats import pmi_collocations

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    got = [tuple(r) for r in pmi_collocations(df, top_k=10, min_count=2).collect()]
    # bigrams: (<s>,a)x3 (a,b)x2 (b,</s>)x2 (a,c) (c,</s>); T=9
    # survivors of (c12>=2, w1!=<s>, w2!=</s>): only (a,b); c1(a)=3, c2(b)=2
    assert got == [("a", "b", 2, 3, 2, round(math.log(2 * 9 / (3 * 2)) * 1e6))]


def test_pmi_collocations_order_and_floor(spark):
    from webcrawl_spark.functions.textstats import pmi_collocations

    df = spark.createDataFrame(
        [(i, "x y common common z w x y") for i in range(5)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(df, top_k=3, min_count=5).collect()
    assert len(rows) == 3
    pmis = [r.pmi_micronat for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    keys = [(-r.pmi_micronat, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)


def test_pmi_incremental_merge_equals_batch(spark):
    """Delta counts merged into stored state reconstruct the whole-corpus
    collocation list exactly; the plan tokenizes ONLY the delta (one
    Generate; the stored side enters as Scan ExistingRDD)."""
    import io
    import contextlib

    from webcrawl_spark.functions.textstats import (
        bigram_counts,
        pmi_collocations,
        pmi_incremental,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma d{i % 7} alpha beta") for i in range(40)],
        "doc_id long, text string",
    )
    stored = bigram_counts(df.where("doc_id >= 10")).localCheckpoint(
        eager=True
    )
    inc = pmi_incremental(df.where("doc_id < 10"), stored, 50, 2)
    batch = pmi_collocations(df, 50, 2)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, batch.collect())
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inc.explain("formatted")
    plan = buf.getvalue()
    gen = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Generate" in line.split(")", 1)[-1]
    )
    # the count table is lineage-cut before the 4-consumer finisher, so
    # the final plan holds NO tokenize subtree at all (neither corpus nor
    # delta is re-read) and starts from the one materialization
    assert gen == 0
    assert "Scan ExistingRDD" in plan and "Scan parquet" not in plan
    assert "EvalPython" not in plan


def test_zipf_fit_matches_python_least_squares(spark):
    """Spec pin for the integer Zipf fit: hand-built corpus with known
    term frequencies; the milli-log moments and pinned division order
    replayed in plain Python must equal the engine row exactly."""
    import math

    # build a corpus whose tf table is exactly {a:8, b:4, c:2, d:1}
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    from pyspark.sql import functions as F, Window

    tf = [(1, 8), (2, 4), (3, 2), (4, 1)]  # (rank, tf) by (tf desc, term)
    xy = [
        (round(math.log(r) * 1000), round(math.log(t) * 1000)) for r, t in tf
    ]
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)

    def tdiv(a, b):  # truncate toward zero, both engines' semantics
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slope = tdiv((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
    intercept = tdiv(sy - tdiv(slope * sx, 1_000_000), n)

    # run the engine formula over the same tiny frame
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    ).filter("term <> ''")
    tfdf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    ranked = tfdf.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("term")))
    ).select(
        F.expr("CAST(ROUND(ln(rk) * 1000) AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(ln(tf) * 1000) AS BIGINT)").alias("y"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    ).select(
        F.expr(
            "((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"
        ).alias("slope_micro"),
        F.expr(
            "(sy - (((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx))"
            " * sx div 1000000) div n"
        ).alias("intercept_milli"),
    ).collect()[0]
    assert m.slope_micro == slope
    assert m.intercept_milli == intercept
    # slope of a perfect tf = 8/2^rank-ish curve is strongly negative
    assert slope < -900_000
