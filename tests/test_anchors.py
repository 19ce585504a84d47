"""Unit battery for inbound anchor-text aggregation (functions/anchors)."""

from webcrawl_spark.functions.anchors import anchor_text_stats, extract_anchors


def test_extract_anchors_fields_case_and_trim(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a.test/",
                '<p>x</p><a href="http://t.test/p.html"> hello world </a>'
                '<A HREF="http://t.test/q.html">UPPER</A>'
                '<a class="z" href="http://t.test/r.html"></a>'
                '<img src="http://img.test/i.png">',
            )
        ],
        "url string, html string",
    )
    rows = {r.target: r for r in extract_anchors(pages).collect()}
    # the img src is NOT an anchor and must not appear
    assert set(rows) == {
        "http://t.test/p.html", "http://t.test/q.html", "http://t.test/r.html"
    }
    assert rows["http://t.test/p.html"].anchor == "hello world"  # trimmed
    assert rows["http://t.test/q.html"].anchor == "UPPER"        # (?i) tag
    assert rows["http://t.test/r.html"].anchor == ""             # empty body


def test_anchor_text_stats_counts_and_top(spark):
    t = "http://hub.test/"
    pages = spark.createDataFrame(
        [
            ("s1", f'<a href="{t}">home</a><a href="{t}">home</a>'),
            ("s2", f'<a href="{t}">start</a>'),
            ("s3", f'<a href="{t}">home</a><a href="http://x.test/">x</a>'),
        ],
        "url string, html string",
    )
    out = {r.target: r for r in anchor_text_stats(pages).collect()}
    hub = out[t]
    assert hub.n_inbound == 4          # all anchors, including s1's two
    assert hub.n_sources == 3          # distinct linking pages
    assert hub.top_anchor == "home" and hub.top_anchor_count == 3
    assert out["http://x.test/"].n_inbound == 1


def test_anchor_text_stats_tie_breaks_lexicographically(spark):
    t = "http://tie.test/"
    pages = spark.createDataFrame(
        [
            ("s1", f'<a href="{t}">zeta</a>'),
            ("s2", f'<a href="{t}">alpha</a>'),
        ],
        "url string, html string",
    )
    row = anchor_text_stats(pages).collect()[0]
    assert row.top_anchor == "alpha" and row.top_anchor_count == 1
