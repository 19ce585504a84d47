"""Discovery-union unit battery (operators/discovery.py).

Literal bodies pin the union/dedup/anti-join mechanics; the oracle
battery entry (queries.url_discovery) hash-checks the composed plan
against an independent DuckDB re-derivation over all 32 synthetic hosts.
"""

from webcrawl_spark.operators.discovery import discover_urls

ROBOTS = """User-agent: *
Disallow: /private
Sitemap: http://a.test/maps/a.xml
sitemap:http://a.test/feed.xml
# Sitemap: http://a.test/commented-out.xml
Sitemap:
"""

SITEMAP_INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>http://a.test/maps/a.xml</loc></sitemap>"
    "<sitemap><loc>http://a.test/maps/b.xml</loc></sitemap>"
    "</sitemapindex>"
)

FEED = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<item><link>http://a.test/blog/1</link></item>"
    "<item><link>http://a.test/blog/2</link></item>"
    "<item><link>http://a.test/blog/2</link></item>"
    "</channel></rss>"
)


def _run(spark, seen_urls):
    one = lambda body: spark.createDataFrame(  # noqa: E731
        [("a.test", body)], "host string, body string"
    )
    seen = (
        spark.createDataFrame([(u,) for u in seen_urls], "url string")
        if seen_urls is not None
        else None
    )
    out = discover_urls(
        one(ROBOTS), one(SITEMAP_INDEX), one(FEED), seen
    ).toPandas()
    return {r.loc: (r.sources, r.n_refs) for r in out.itertuples()}


def test_union_dedup_and_multisource(spark):
    rows = _run(spark, None)
    # robots Sitemap line AND index child point at the same sitemap →
    # one row, sorted '+'-joined sources, both references counted
    assert rows["http://a.test/maps/a.xml"] == ("robots+sitemap_index", 2)
    assert rows["http://a.test/maps/b.xml"] == ("sitemap_index", 1)
    # no-space lowercase field parsed; commented-out and empty-value
    # Sitemap lines dropped
    assert rows["http://a.test/feed.xml"] == ("robots", 1)
    assert not any("commented-out" in k for k in rows)
    # same-source duplicate reference collapses but keeps the ref count
    assert rows["http://a.test/blog/1"] == ("feed", 1)
    assert rows["http://a.test/blog/2"] == ("feed", 2)
    assert len(rows) == 5


def test_seen_antijoin(spark):
    rows = _run(
        spark, ["http://a.test/blog/1", "http://a.test/maps/a.xml"]
    )
    assert "http://a.test/blog/1" not in rows
    assert "http://a.test/maps/a.xml" not in rows
    assert len(rows) == 3


def test_refresh_fourth_edge(spark):
    """pages= adds meta-refresh targets as the fourth edge: resolved
    targets enter the union (deduped against the other edges, source-
    tagged), unresolved relatives never do."""
    one = lambda body: spark.createDataFrame(  # noqa: E731
        [("a.test", body)], "host string, body string"
    )
    pages = spark.createDataFrame(
        [
            # absolute target duplicating a feed entry → sources merge
            ("http://p.test/a",
             '<meta http-equiv="refresh" content="0;url=http://a.test/blog/1">'),
            # root-relative resolves against the page origin
            ("http://p.test/b",
             '<meta http-equiv="refresh" content="3;url=/landing.html">'),
            # path-relative stays unresolved → contributes nothing
            ("http://p.test/c",
             '<meta http-equiv="refresh" content="1;url=rel.html">'),
            ("http://p.test/d", "<html>no refresh</html>"),
        ],
        "url string, text string",
    )
    out = discover_urls(
        one(ROBOTS), one(SITEMAP_INDEX), one(FEED), None, pages=pages
    ).toPandas()
    rows = {r.loc: (r.sources, r.n_refs) for r in out.itertuples()}
    assert rows["http://a.test/blog/1"] == ("feed+refresh", 2)
    assert rows["http://p.test/landing.html"] == ("refresh", 1)
    assert not any("rel.html" in k for k in rows)
    assert len(rows) == 6
