"""Domain blocklist filter: subdomain semantics, most-specific-wins,
clean passthrough (operators/blocklist.blocklist_filter)."""

from webcrawl_spark.operators import blocklist as BLK


def _run(spark, urls, rules):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    b = spark.createDataFrame([(r,) for r in rules], "rule string")
    return {
        r.url: (r.host, r.blocked, r.matched_rule)
        for r in BLK.blocklist_filter(u, b).collect()
    }


def test_blocklist_subdomain_and_exact(spark):
    got = _run(
        spark,
        [
            "http://www.evil.test/a",     # subdomain of a blocked domain
            "http://evil.test/b",         # the blocked apex itself
            "http://cdn.ok.test/c",       # exact-host rule
            "http://ok.test/d",           # parent of an exact-host rule: clean
            "http://notevil.test/e",      # suffix must match on LABELS, not substrings
        ],
        ["evil.test", "cdn.ok.test"],
    )
    assert got["http://www.evil.test/a"] == ("www.evil.test", True, "evil.test")
    assert got["http://evil.test/b"] == ("evil.test", True, "evil.test")
    assert got["http://cdn.ok.test/c"] == ("cdn.ok.test", True, "cdn.ok.test")
    assert got["http://ok.test/d"] == ("ok.test", False, None)
    assert got["http://notevil.test/e"] == ("notevil.test", False, None)


def test_blocklist_most_specific_rule_wins(spark):
    got = _run(
        spark,
        ["http://a.b.evil.test/x"],
        ["evil.test", "b.evil.test"],
    )
    assert got["http://a.b.evil.test/x"] == (
        "a.b.evil.test", True, "b.evil.test"
    )
