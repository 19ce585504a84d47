"""robots.txt parser unit battery (operators/robotsparse.py).

Literal bodies pin each RFC 9309 group-semantics branch; the oracle
battery entry (queries.robots_parse) hash-checks the composed plan
against an independent DuckDB re-derivation over all 32 synthetic hosts.
The parsed output must feed kernels/robots.py unchanged — the last test
closes that loop (parse → build_rule_index → robots_allowed decisions).
"""

import pandas as pd
import pytest

from webcrawl_spark.kernels.robots import build_rule_index, crawl_delays, robots_allowed
from webcrawl_spark.operators.robotsparse import parse_robots

BODY_BASIC = """# comment line
User-Agent: *
Disallow: /private
Allow: /private/pub
Crawl-delay: 2.5
"""

BODY_EXACT_OVERRIDES_STAR = """User-agent: *
Disallow: /everything

User-agent: amwc
Disallow: /amwc-only
"""

BODY_CONSECUTIVE_HEADS = """User-agent: amwc
User-agent: otherbot
Disallow: /shared
"""

BODY_OTHER_BOT_ONLY = """User-agent: heavybot
Disallow: /
"""

BODY_EMPTY_VALUE_NOOP = """User-agent: *
Disallow:
"""

BODY_DELAY_ONLY = """User-agent: *
Crawl-delay: 7
"""

BODY_ORPHAN_RULES = """Disallow: /before-any-group
User-agent: *
Allow: /ok
"""

BODY_MERGE_EQUAL_SPEC = """User-agent: *
Disallow: /a

User-agent: *
Disallow: /b
Crawl-delay: 3
"""


def _parse(spark, cases: dict) -> pd.DataFrame:
    bodies = spark.createDataFrame(
        [(h, b) for h, b in cases.items()], "host string, body string"
    )
    out = parse_robots(bodies, user_agent="amwc").toPandas()
    return out.sort_values(["host", "path_prefix", "allow"]).reset_index(drop=True)


def test_group_semantics(spark):
    out = _parse(
        spark,
        {
            "basic.test": BODY_BASIC,
            "exact.test": BODY_EXACT_OVERRIDES_STAR,
            "heads.test": BODY_CONSECUTIVE_HEADS,
            "other.test": BODY_OTHER_BOT_ONLY,
            "noop.test": BODY_EMPTY_VALUE_NOOP,
            "delay.test": BODY_DELAY_ONLY,
            "orphan.test": BODY_ORPHAN_RULES,
            "merge.test": BODY_MERGE_EQUAL_SPEC,
        },
    )
    rows = {
        (r.host, r.path_prefix, r.allow): r.crawl_delay for r in out.itertuples()
    }
    # basic: comment stripped, mixed-case field, delay attached to both rules
    assert rows[("basic.test", "/private", False)] == 2.5
    assert rows[("basic.test", "/private/pub", True)] == 2.5
    # exact-UA group wins; the '*' group's /everything must NOT appear
    assert ("exact.test", "/everything", False) not in rows
    assert ("exact.test", "/amwc-only", False) in rows
    # consecutive User-agent heads form ONE group
    assert ("heads.test", "/shared", False) in rows
    # a group for another bot contributes nothing
    assert not any(h == "other.test" for h, _, _ in rows)
    # empty-value Disallow is a no-op (host absent entirely)
    assert not any(h == "noop.test" for h, _, _ in rows)
    # delay with no path rules → '' carrier row
    assert rows[("delay.test", "", True)] == 7.0
    # rules before any group are ignored
    assert not any(h == "orphan.test" and p == "/before-any-group" for h, p, _ in rows)
    assert ("orphan.test", "/ok", True) in rows
    # equal-specificity groups merge (both rules + the delay survive)
    assert rows[("merge.test", "/a", False)] == 3.0
    assert rows[("merge.test", "/b", False)] == 3.0


def test_parse_feeds_kernel(spark):
    """parse → build_rule_index → decisions: the longest-prefix kernel
    consumes the parsed table unchanged."""
    rules = _parse(spark, {"e.test": BODY_BASIC, "d.test": BODY_DELAY_ONLY})
    idx = build_rule_index(rules)
    hosts = pd.Series(["e.test", "e.test", "e.test", "unknown.test"])
    paths = pd.Series(["/private/x", "/private/pub/x", "/other", "/private"])
    assert list(robots_allowed(hosts, paths, idx)) == [False, True, True, True]
    assert crawl_delays(rules) == {"e.test": 2.5, "d.test": 7.0}


def test_plan_is_pure_jvm(spark):
    """No Python evaluation anywhere in the parse plan."""
    bodies = spark.createDataFrame(
        [("x.test", BODY_BASIC)], "host string, body string"
    )
    plan = parse_robots(bodies)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_sitemap_urls_global_extraction(spark):
    from webcrawl_spark.operators.robotsparse import sitemap_urls

    body = (
        "Sitemap: http://s.test/maps/root.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "SITEMAP: http://s.test/maps/other.xml  # trailing comment\n"
        "sitemapX: not-a-field\n"
    )
    bodies = spark.createDataFrame([("s.test", body)], "host string, body string")
    out = sorted(r.sitemap_url for r in sitemap_urls(bodies).collect())
    # global: extracted even from inside a non-matching bot's group;
    # case-insensitive field; comment stripped; URL's :// intact
    assert out == [
        "http://s.test/maps/other.xml",
        "http://s.test/maps/root.xml",
    ]


def test_wildcard_patterns_rfc9309():
    """RFC 9309 §2.2.3 special characters: ``*`` spans any sequence,
    trailing ``$`` anchors end-of-path, a mid-pattern ``$`` is literal,
    and specificity is the RAW pattern length (* and $ counted)."""
    import pandas as pd

    rules = pd.DataFrame(
        {
            "host": ["h"] * 6,
            "path_prefix": [
                "/img/*.png$",   # 11: block pngs under /img, exact suffix
                "/img/pub*",     # 9: re-allow the public subtree
                "/img",          # 4: block the tree
                "/a*c*e$",       # multi-star with anchor
                "/lit$eral",     # mid-pattern $ is a literal character
                "",              # matches everything (lowest specificity)
            ],
            "allow": [False, True, False, False, False, True],
            "crawl_delay": [None] * 6,
        }
    )
    idx = build_rule_index(rules)
    cases = [
        ("/img/x.png", False),        # anchored block wins
        ("/img/x.png.bak", False),    # NOT the $ rule ('/img' blocks it)
        ("/img/pub/x.png", False),    # 11 > 9: block still wins on pngs
        ("/img/pub/x.gif", True),     # re-allowed subtree
        ("/img/other.gif", False),    # '/img' tree block
        ("/abcde", False),            # /a*c*e$ spans
        ("/abcdef", True),            # $ anchor rejects the longer path
        ("/lit$eral-rest", False),    # literal $ matched as itself
        ("/anything", True),          # '' allow
    ]
    hosts = pd.Series(["h"] * len(cases))
    paths = pd.Series([p for p, _ in cases])
    got = list(robots_allowed(hosts, paths, idx))
    assert got == [e for _, e in cases], list(zip(cases, got))


def test_wildcard_index_is_broadcast_picklable():
    import pandas as pd
    import pickle

    rules = pd.DataFrame(
        {
            "host": ["h"],
            "path_prefix": ["/x/*.mp4$"],
            "allow": [False],
            "crawl_delay": [None],
        }
    )
    idx = pickle.loads(pickle.dumps(build_rule_index(rules)))
    assert list(
        robots_allowed(
            pd.Series(["h", "h"]), pd.Series(["/x/a.mp4", "/x/a.mp3"]), idx
        )
    ) == [False, True]


BODY_WILDCARDS = """User-agent: *
Disallow: /*.pdf$
Disallow: /cgi/*/raw
Allow: /cgi/pub*/raw
"""


def test_parse_to_wildcard_decisions(spark):
    """parse → build_rule_index → RFC 9309 wildcard decisions: the parser
    passes * and $ through untouched and the kernel interprets them —
    the full robots loop handles wildcard lines end-to-end."""
    rules = _parse(spark, {"w.test": BODY_WILDCARDS})
    idx = build_rule_index(rules)
    hosts = pd.Series(["w.test"] * 5)
    paths = pd.Series(
        [
            "/docs/a.pdf",        # anchored block
            "/docs/a.pdf.html",   # $ rejects the longer path
            "/cgi/x/raw",         # star-segment block
            "/cgi/pub9/raw",      # longer allow overrides (13 > 11)
            "/cgi/pub",           # no rule matches
        ]
    )
    assert list(robots_allowed(hosts, paths, idx)) == [
        False, True, False, True, True,
    ]
