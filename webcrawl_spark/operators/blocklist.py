"""URL / domain blocklist filtering — the RefinedWeb §3.1 URL-filter pass.

Production web pipelines gate crawled URLs against curated domain
blocklists (UT1, adult/fraud/malware lists) BEFORE fetch/dedup spend
anything on them. The semantics everyone implements: a rule blocks a host
and every subdomain of it (``bad.test`` blocks ``x.bad.test``), and the
most specific (longest) matching rule wins for reporting.

Reference analog: the reference's scope filter (Crawler.cs IsUriAllowed)
is a per-crawl allow/deny predicate over hosts; this operator is its
corpus-scale batch counterpart driven by an external rules TABLE rather
than crawl settings.

100-TB shape: each host explodes into its ≤ label-count domain suffixes
(a bounded ~5-way fan-out, one codegen projection), which join the rules
table on the uniform ``rule`` key — a UT1-sized list (millions of rows)
is NOT hand-broadcast; AQE broadcasts when it fits and a uniform shuffle
join handles it when it doesn't. The per-URL winner is a min-struct
aggregate (longest rule, then lexicographic), never a corpus window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the scheme://host extractor shared with recrawl_ranks' oracle
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def host_suffixes_sql(host_col: str = "host") -> str:
    """SQL (Spark) building the array of domain suffixes of ``host_col``:
    ``www.a.test → [www.a.test, a.test, test]``."""
    ls = f"split({host_col}, '[.]')"
    return (
        f"transform(sequence(1, size({ls})), "
        f"i -> array_join(slice({ls}, i, size({ls}) - i + 1), '.'))"
    )


def blocklist_filter(
    urls: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(url, host, blocked, matched_rule) — gate every URL against a
    ``(rule)`` blocklist table with subdomain semantics; ``matched_rule``
    is the most specific (longest, then lexicographically smallest)
    matching rule, NULL for clean URLs."""
    host = F.regexp_extract(F.col(url_col), HOST_RE, 1)
    base = urls.select(F.col(url_col).alias("url"), host.alias("host"))
    sfx = base.select(
        "url", F.explode(F.expr(host_suffixes_sql("host"))).alias("rule")
    )
    hits = (
        sfx.join(blocklist.select("rule"), "rule")
        .groupBy("url")
        .agg(
            F.min(
                F.struct(
                    (-F.length("rule")).alias("neg"),
                    F.col("rule").alias("rule"),
                )
            ).alias("__m")
        )
    )
    return base.join(hits, "url", "left").select(
        "url",
        "host",
        F.col("__m").isNotNull().alias("blocked"),
        F.col("__m.rule").alias("matched_rule"),
    )
