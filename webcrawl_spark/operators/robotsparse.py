"""robots.txt text → rules-table parser (north_rule loop closure).

The engine consumes a broadcast rules table ``(host, path_prefix, allow,
crawl_delay)`` — ``kernels/robots.py``, mandated by BASELINE.json's
north_star ("robots.txt rules applied as a broadcast-joined rules table";
the C# reference has no robots support — grep "robots" over
/root/reference returns nothing). At Common-Crawl scale that table is not
hand-written: it is PARSED from the fetched ``/robots.txt`` bodies
themselves. This operator is that parse, as a pure DataFrame plan
(whole-stage codegen; no Python anywhere), implementing RFC 9309 group
semantics plus the de-facto ``Crawl-delay`` extension:

- comments (``#…``) are stripped; field names are case-insensitive;
  unknown fields are ignored (RFC 9309 §2.2.4)
- a *group* = one or more CONSECUTIVE ``User-agent:`` lines followed by
  rule lines; a rule line before any group is ignored
- only the group(s) with the most specific user-agent match apply: the
  crawler's product token beats ``*``; groups for other bots are ignored
  entirely (RFC 9309 §2.2.1); equal-specificity groups merge
- ``Disallow:`` / ``Allow:`` with a non-empty value become prefix rules
  (longest-match decision happens downstream in ``kernels/robots.py``);
  an EMPTY value is a no-op (RFC 9309 §2.2.2)
- ``Crawl-delay:`` is host-level: max over the matched groups' values; a
  host whose matched groups carry a delay but no path rule emits an
  ``('', allow=True)`` carrier row so the delay survives into the table

100-TB shape: input is one row per host (10^7 hosts at CC scale, a few
KB each). The whole parse is ONE pass — a single scan of the bodies
table, then window functions over (host) / (host, gid): group membership
is a running sum, group/host specificity and the host-level delay are
windowed maxima, and the carrier row is selected by a windowed
row_number — no self-joins, so the bodies table is never re-scanned
(audited: 1 scan, 4 exchanges, 0 EvalPython). Keys are uniform (one row
per host-line; bodies are size-capped by fetchers in practice). Output
is the small broadcast-side table the crawl plan already consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RULES_SCHEMA = "host string, path_prefix string, allow boolean, crawl_delay double"

_KNOWN_FIELDS = ("user-agent", "allow", "disallow", "crawl-delay")


def parse_robots(bodies: DataFrame, user_agent: str = "amwc") -> DataFrame:
    """Parse ``(host, body)`` robots.txt rows into the engine's rules table.

    ``user_agent`` is the crawler's product token (matched
    case-insensitively against ``User-agent:`` values; ``*`` is the
    fallback group).
    """
    ua = user_agent.lower()

    lines = (
        bodies.select(
            "host", F.posexplode(F.split(F.col("body"), "\n")).alias("pos", "raw")
        )
        .select(
            "host", "pos", F.trim(F.regexp_replace("raw", "#.*", "")).alias("line")
        )
        .where((F.col("line") != "") & (F.instr("line", ":") > 0))
        .select(
            "host",
            "pos",
            F.lower(F.trim(F.substring_index("line", ":", 1))).alias("field"),
            F.trim(F.expr("substring(line, instr(line, ':') + 1)")).alias("value"),
        )
        .where(F.col("field").isin(*_KNOWN_FIELDS))
    )

    w = Window.partitionBy("host").orderBy("pos")
    wg = Window.partitionBy("host", "gid")
    wh = Window.partitionBy("host")

    matched = (
        lines.withColumn("is_ua", F.col("field") == "user-agent")
        .withColumn(
            "gstart",
            (F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))).cast(
                "int"
            ),
        )
        .withColumn("gid", F.sum("gstart").over(w))
        # specificity: exact product token (2) beats '*' (1); other bots'
        # groups (0) never match; rule lines contribute 0, and gid=0
        # (orphan rules before any group) has no UA line at all
        .withColumn(
            "ua_spec",
            F.when(
                F.col("is_ua"),
                F.when(F.lower("value") == ua, 2)
                .when(F.col("value") == "*", 1)
                .otherwise(0),
            ).otherwise(0),
        )
        .withColumn("group_spec", F.max("ua_spec").over(wg))
        .withColumn("best_spec", F.max("group_spec").over(wh))
        .where(
            (F.col("group_spec") > 0)
            & (F.col("group_spec") == F.col("best_spec"))
            & ~F.col("is_ua")
        )
    )

    ranked = (
        matched.withColumn(
            "is_path",
            F.col("field").isin("allow", "disallow") & (F.col("value") != ""),
        )
        .withColumn(
            "delay_val",
            F.when(
                F.col("field") == "crawl-delay", F.expr("try_cast(value AS double)")
            ),
        )
        .withColumn("crawl_delay", F.max("delay_val").over(wh))
        .withColumn("has_path", F.max(F.col("is_path").cast("int")).over(wh))
        # first parseable crawl-delay line per host — the carrier-row
        # representative when the host has a delay but no path rules
        .withColumn(
            "delay_rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.col("delay_val").isNull(), "pos")
            ),
        )
    )
    return (
        ranked.where(
            F.col("is_path")
            | (
                (F.col("has_path") == 0)
                & F.col("crawl_delay").isNotNull()
                & (F.col("delay_rank") == 1)
            )
        )
        .select(
            "host",
            F.when(F.col("is_path"), F.col("value"))
            .otherwise(F.lit(""))
            .alias("path_prefix"),
            F.when(F.col("is_path"), F.col("field") == "allow")
            .otherwise(F.lit(True))
            .alias("allow"),
            "crawl_delay",
        )
        .distinct()
    )


def sitemap_urls(bodies: DataFrame) -> DataFrame:
    """Extract ``Sitemap:`` lines from robots.txt bodies →
    ``(host, sitemap_url)``.

    Per sitemaps.org / RFC 9309 §2.2.4 these lines are GLOBAL — valid
    anywhere in the file, independent of user-agent groups — which is
    why this is a separate single-projection pass rather than part of
    the group-scoped rules parse (``parse_robots`` ignores the field).
    The first ``:`` is the field separator, so the URL's own ``://``
    survives intact. Zero exchanges.
    """
    return (
        bodies.select(
            "host", F.explode(F.split(F.col("body"), "\n")).alias("raw")
        )
        .select(
            "host", F.trim(F.regexp_replace("raw", "#.*", "")).alias("line")
        )
        .where(F.lower(F.col("line")).startswith("sitemap:"))
        .select(
            "host",
            F.trim(F.expr("substring(line, instr(line, ':') + 1)")).alias(
                "sitemap_url"
            ),
        )
        .where(F.col("sitemap_url") != "")
    )
