"""Feed parser unit battery (operators/feeds.py).

Literal XML bodies pin each RSS 2.0 / Atom branch; the oracle battery
entry (queries.feed_parse) hash-checks the composed plan against an
independent DuckDB re-derivation over all 32 synthetic hosts.
"""

from webcrawl_spark.operators.feeds import parse_feeds

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Channel title must not leak into items</title>
  <link>http://a.test/</link>
  <item>
    <title>Post &amp; one</title>
    <link>http://a.test/blog/1?x=1&amp;y=2</link>
    <guid isPermaLink="false">tag:a:1</guid>
    <pubDate>Tue, 10 Jun 2003 04:00:00 GMT</pubDate>
  </item>
  <item><title>No link — dropped</title><guid>tag:a:2</guid></item>
  <item><link>
      http://a.test/blog/2.html
  </link></item>
  <item><link>http://a.test/blog/3</link><pubDate>1 Feb 2024 00:00:00 GMT</pubDate></item>
  <item><link>http://a.test/blog/4</link><pubDate>not a date</pubDate></item>
</channel></rss>
"""

ATOM = """<?xml version="1.0"?>
<feed>
  <title>Feed title must not leak into entries</title>
  <entry>
    <title>Alpha</title>
    <link rel="alternate" href="http://b.test/a/1?x=1&amp;y=2"/>
    <id>urn:b:1</id>
    <updated>2024-07-15T10:30:00Z</updated>
  </entry>
  <entry><title>No link — dropped</title><id>urn:b:2</id></entry>
  <entry><link href="http://b.test/a/2"/></entry>
</feed>
"""

NOT_A_FEED = "<html><body>hello</body></html>"


def _parse(spark, cases):
    bodies = spark.createDataFrame(cases, "host string, body string")
    out = parse_feeds(bodies).toPandas()
    return {
        (r.host, r.kind, r.loc): (
            r.title,
            r.guid,
            None if r.published is None else str(r.published),
        )
        for r in out.itertuples()
    }


def test_rss_and_atom(spark):
    rows = _parse(
        spark, [("a.test", RSS), ("b.test", ATOM), ("c.test", NOT_A_FEED)]
    )
    # full RSS item: entity decode on title+link, guid attr tolerated,
    # weekday'd RFC 822 pubDate → date
    assert rows[("a.test", "rss", "http://a.test/blog/1?x=1&y=2")] == (
        "Post & one",
        "tag:a:1",
        "2003-06-10",
    )
    # link-less item dropped
    assert not any("tag:a:2" in str(v) for v in rows.values())
    # whitespace-padded link trimmed; absent title/guid/pubDate → NULLs
    assert rows[("a.test", "rss", "http://a.test/blog/2.html")] == (
        None,
        None,
        None,
    )
    # weekday-less single-digit-day pubDate (RFC 822 makes the weekday
    # optional) still parses
    assert rows[("a.test", "rss", "http://a.test/blog/3")] == (
        None,
        None,
        "2024-02-01",
    )
    # unparseable pubDate → NULL published, row kept
    assert rows[("a.test", "rss", "http://a.test/blog/4")] == (None, None, None)
    # Atom: href attribute (rel tolerated), id as guid, RFC 3339 prefix
    assert rows[("b.test", "atom", "http://b.test/a/1?x=1&y=2")] == (
        "Alpha",
        "urn:b:1",
        "2024-07-15",
    )
    # link-less entry dropped; bare-link entry kept with NULLs
    assert not any("urn:b:2" in str(v) for v in rows.values())
    assert rows[("b.test", "atom", "http://b.test/a/2")] == (None, None, None)
    # non-feed bodies contribute nothing
    assert not any(k[0] == "c.test" for k in rows)
    assert len(rows) == 6


def test_plan_single_scan_no_exchange(spark):
    import re

    bodies = spark.createDataFrame([("a.test", RSS)], "host string, body string")
    plan = parse_feeds(bodies)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert len(re.findall(r"\bExchange\b", plan)) == 0
