"""Registrable-domain extraction under PSL semantics (operators/psl):
plain / nested / wildcard / exception rules, the implicit * rule,
public-suffix hosts, and the politeness rollup."""

from pyspark.sql import functions as F

from webcrawl_spark.operators import psl as PSL

RULES = ["test", "co.test", "*.wild.test", "!free.wild.test", "example"]


def _run(spark, hosts, rules=RULES):
    h = spark.createDataFrame([(x,) for x in hosts], "host string")
    r = spark.createDataFrame([(x,) for x in rules], "rule string")
    return {
        row.host: (
            row.public_suffix,
            row.registrable_domain,
            row.matched_rule,
            row.is_exception,
        )
        for row in PSL.registrable_domains(h, r).collect()
    }


def test_plain_and_nested_rules(spark):
    got = _run(spark, ["www.site1.test", "a.b.site2.co.test", "site3.test"])
    assert got["www.site1.test"] == ("test", "site1.test", "test", False)
    # co.test has more labels than test → it prevails
    assert got["a.b.site2.co.test"] == (
        "co.test", "site2.co.test", "co.test", False
    )
    assert got["site3.test"] == ("test", "site3.test", "test", False)


def test_wildcard_rule(spark):
    got = _run(spark, ["x.w9.wild.test", "w3.wild.test"])
    # *.wild.test: the matched host label joins the public suffix
    assert got["x.w9.wild.test"] == (
        "w9.wild.test", "x.w9.wild.test", "*.wild.test", False
    )
    # the wildcard-matched host IS a public suffix → no registrable domain
    assert got["w3.wild.test"] == ("w3.wild.test", None, "*.wild.test", False)


def test_exception_rule_beats_wildcard(spark):
    got = _run(spark, ["free.wild.test", "sub.free.wild.test"])
    # exception: public suffix is the rule minus its leftmost label
    assert got["free.wild.test"] == (
        "wild.test", "free.wild.test", "!free.wild.test", True
    )
    # a subdomain of the exception host matches the same exception rule
    assert got["sub.free.wild.test"] == (
        "wild.test", "free.wild.test", "!free.wild.test", True
    )


def test_implicit_star_and_public_suffix_hosts(spark):
    got = _run(spark, ["site5.unknown", "unknown", "co.test", "example"])
    # no rule matches → the implicit * rule: the TLD is the public suffix
    assert got["site5.unknown"] == ("unknown", "site5.unknown", None, False)
    assert got["unknown"] == ("unknown", None, None, False)
    # hosts that ARE public suffixes have no registrable domain
    assert got["co.test"] == ("co.test", None, "co.test", False)
    assert got["example"] == ("example", None, "example", False)


def test_label_not_substring_match(spark):
    # suffix matching is on LABELS: notwild.test must not hit *.wild.test
    got = _run(spark, ["a.notwild.test"])
    assert got["a.notwild.test"] == ("test", "notwild.test", "test", False)


def test_domain_rollup(spark):
    urls = [
        "http://www.shop.test/a",
        "http://cdn.shop.test/b",
        "http://shop.test/c",
        "http://x.w1.wild.test/d",
        "http://y.w1.wild.test/e",
        "http://co.test/f",  # public-suffix host budgets under its own name
    ]
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    r = spark.createDataFrame([(x,) for x in RULES], "rule string")
    got = {
        row.registrable_domain: (row.n_hosts, row.n_urls)
        for row in PSL.domain_rollup(u, r).collect()
    }
    assert got == {
        "shop.test": (3, 3),
        "x.w1.wild.test": (1, 1),
        "y.w1.wild.test": (1, 1),
        "co.test": (1, 1),
    }


def test_plan_shape(spark):
    """Plan guard: zero Python stages, zero cartesian products, and the
    per-host winner is an aggregate (no window over hosts)."""
    h = spark.createDataFrame([("a.b.test",)], "host string")
    r = spark.createDataFrame([(x,) for x in RULES], "rule string")
    plan = PSL.registrable_domains(h, r)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
