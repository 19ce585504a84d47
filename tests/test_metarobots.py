"""In-page REP gate (functions/metarobots.py): directive parsing edges
and the zero-exchange plan guard."""

import io
import contextlib

from webcrawl_spark.functions.metarobots import gated_links, meta_robots


def _gate(spark, html, url="http://p.test/"):
    df = spark.createDataFrame([(url, html)], "url string, text string")
    return sorted(
        (r.href, r.page_noindex, r.page_nofollow, r.link_nofollow, r.followed)
        for r in gated_links(df).collect()
    )


def test_directive_whole_token_only(spark):
    df = spark.createDataFrame(
        [
            ("a", '<meta name="robots" content="noindexfoo">x'),
            ("b", '<meta name="robots" content="index, noindex">x'),
            ("c", '<meta name="robots" content="NOFOLLOW">x'),
            ("d", "no meta at all"),
        ],
        "url string, text string",
    )
    got = {r.url: (r.noindex, r.nofollow) for r in meta_robots(df).collect()}
    assert got == {
        "a": (False, False),  # noindexfoo is not the noindex token
        "b": (True, False),
        "c": (False, True),
        "d": (False, False),
    }


def test_null_text_has_no_directives(spark):
    df = spark.createDataFrame([("u", None)], "url string, text string")
    r = meta_robots(df).collect()[0]
    assert (r.noindex, r.nofollow) == (False, False)
    assert gated_links(df).count() == 0  # and no link rows


def test_page_nofollow_blocks_every_link(spark):
    html = (
        '<meta name="robots" content="nofollow">'
        '<a href="http://t/1">x</a><a href="http://t/2" rel="me">y</a>'
    )
    got = _gate(spark, html)
    assert got == [
        ("http://t/1", False, True, False, False),
        ("http://t/2", False, True, False, False),
    ]


def test_rel_nofollow_blocks_its_own_link_only(spark):
    html = (
        '<a href="http://t/1" rel="nofollow">x</a>'
        '<a href="http://t/2" rel="external NoFollow">y</a>'
        '<a href="http://t/3">z</a>'
        "<a name=\"anchor-only\">w</a>"
    )
    got = _gate(spark, html)
    assert got == [
        ("", False, False, False, False),  # hrefless never followed
        ("http://t/1", False, False, True, False),
        ("http://t/2", False, False, True, False),
        ("http://t/3", False, False, False, True),
    ]


def test_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame([("u", "t")], "url string, text string")
    plan_df = gated_links(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()

    def nodes(kind):
        return sum(
            1
            for line in plan.splitlines()
            if line.strip().startswith("(")
            and kind in line.split(")", 1)[-1]
        )

    assert nodes("Exchange") == 0
    assert nodes("Generate") == 1  # the single anchor-tag explode
    assert "EvalPython" not in plan and "Join" not in plan


def test_rel_canonical_election_ladder(spark):
    from webcrawl_spark.functions.metarobots import rel_canonical

    rows = [
        # declared target: canonical is the target, one hop
        ("http://a.test/1", '<link rel="canonical" href="http://a.test/0">'),
        # upper-case attribute names still match
        ("http://a.test/2", '<LINK REL="canonical" HREF="http://a.test/0">'),
        # explicit self-declaration
        ("http://a.test/0", '<link rel="canonical" href="http://a.test/0">'),
        # empty href falls back to self
        ("http://a.test/3", '<link rel="canonical" href="">'),
        # no declaration at all
        ("http://a.test/4", "<html>plain</html>"),
        # NULL text (fetch-failed page)
        ("http://a.test/5", None),
        # chain head: 6 -> 4, and 4 is its own canonical above — the
        # one-hop rule must NOT rewrite 6 to 4's canonical-of-canonical
        ("http://a.test/6", '<link rel="canonical" href="http://a.test/4">'),
    ]
    got = {
        r.url: (r.canonical_url, r.is_self, r.n_aliases)
        for r in rel_canonical(
            spark.createDataFrame(rows, "url string, text string")
        ).collect()
    }
    assert got["http://a.test/1"] == ("http://a.test/0", False, 3)
    assert got["http://a.test/2"] == ("http://a.test/0", False, 3)
    assert got["http://a.test/0"] == ("http://a.test/0", True, 3)
    assert got["http://a.test/3"] == ("http://a.test/3", True, 1)
    assert got["http://a.test/4"] == ("http://a.test/4", True, 2)
    assert got["http://a.test/5"] == ("http://a.test/5", True, 1)
    assert got["http://a.test/6"] == ("http://a.test/4", False, 2)
