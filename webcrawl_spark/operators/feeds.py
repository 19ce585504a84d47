"""RSS/Atom feed XML → URL-discovery table (third crawl ingestion edge).

The reference discovers URLs only by scanning fetched bodies
(Crawler.cs ``ScanForLinks`` regexes); a Common-Crawl-scale frontier
also ingests syndication feeds — the freshest discovery channel a site
offers (news/blog URLs appear in the feed minutes after publication,
long before any sitemap regenerates). This operator completes the
discovery trio next to ``robotsparse`` (robots.txt) and ``sitemap``
(sitemaps.org): it parses RSS 2.0 ``<item>`` and Atom (RFC 4287)
``<entry>`` blocks into frontier-feedable rows as a pure column plan
(``regexp_extract_all`` + explode — JVM-side, no Python):

- RSS 2.0 documents (``<rss`` present) → one row per ``<item>`` with
  ``kind='rss'``: ``loc`` from ``<link>`` (items without a link are
  dropped — nothing to enqueue), optional ``<title>``, optional
  ``<guid>``, optional ``<pubDate>`` (RFC 822: ``Tue, 10 Jun 2003
  04:00:00 GMT`` — parsed by extracting day/month-name/year and mapping
  the month through a shared constant table, so both engines agree
  bit-exactly without locale-dependent datetime parsers)
- Atom documents (``<feed`` present) → one row per ``<entry>`` with
  ``kind='atom'``: ``loc`` from the first ``<link ... href="...">``
  (ADAPT: RFC 4287 prefers ``rel="alternate"``; feeds in the wild
  overwhelmingly emit it first and unadorned, and a rel-aware pick is a
  second regex pass a deployment adds behind the same column), optional
  ``<title>``, ``<id>`` as the guid, ``<updated>`` (RFC 3339 — the date
  is always the first 10 chars)
- minimal XML entity decoding on ``loc``/``title``/``guid`` (the five
  predefined entities, ``&amp;`` last so double-escapes stay escaped —
  shared with the sitemap parser)

100-TB shape: ONE scan of the bodies table, zero exchanges —
embarrassingly parallel narrow explode; the caller joins the output
against the frontier (the same seen-set anti-join every discovery edge
feeds, §2 op 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sitemap import _decode_entities

FEED_SCHEMA = (
    "host string, kind string, loc string, title string, guid string,"
    " published date"
)

# RFC 822 month names → month number; ONE constant interpolated into both
# engines (the lsh_bucket_stats single-constant lesson).
FEED_MONTHS = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "May": 5, "Jun": 6,
    "Jul": 7, "Aug": 8, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}

_ITEM_BLOCKS = "regexp_extract_all(body, '(?s)<item>(.*?)</item>', 1)"
_ENTRY_BLOCKS = "regexp_extract_all(body, '(?s)<entry>(.*?)</entry>', 1)"

# RFC 822 date-time: "[Tue, ]10 Jun 2003 04:00:00 GMT" — the weekday is
# optional per the grammar and ignored here either way. Deliberately
# backslash-free ([0-9]/[ ] instead of \d/\s): this regex is embedded in
# ONE SQL string evaluated by BOTH engines, and Spark SQL string literals
# consume backslash escapes while DuckDB's do not — a bare character-class
# regex parses identically in both.
_RFC822 = (
    "([0-9]{1,2})[ ]+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    "[ ]+([0-9]{4})"
)


def rfc822_date_sql(raw: str) -> str:
    """Portable SQL (Spark SQL ∩ DuckDB) turning an RFC 822 date-time
    string column into a DATE via the shared month table — exact string
    surgery, no locale-dependent parser on either engine."""
    mon_case = " ".join(
        f"WHEN '{name}' THEN '{num:02d}'" for name, num in FEED_MONTHS.items()
    )
    return (
        f"try_cast("
        f"regexp_extract({raw}, '{_RFC822}', 3)"
        f" || '-' || (CASE regexp_extract({raw}, '{_RFC822}', 2) {mon_case} END)"
        f" || '-' || lpad(regexp_extract({raw}, '{_RFC822}', 1), 2, '0')"
        f" AS date)"
    )


def parse_feeds(bodies: DataFrame) -> DataFrame:
    """Parse ``(host, body)`` feed-XML rows into discovery rows
    ``(host, kind, loc, title, guid, published)`` — single scan, no
    exchange. Bodies that are neither RSS nor Atom yield no rows."""
    return (
        bodies.withColumn(
            "kind",
            F.when(F.col("body").contains("<rss"), "rss").when(
                F.col("body").contains("<feed"), "atom"
            ),
        )
        .where(F.col("kind").isNotNull())
        .select(
            "host",
            "kind",
            F.explode(
                F.expr(
                    f"CASE WHEN kind = 'rss' THEN {_ITEM_BLOCKS}"
                    f" ELSE {_ENTRY_BLOCKS} END"
                )
            ).alias("entry"),
        )
        .select(
            "host",
            "kind",
            F.when(
                F.col("kind") == "rss",
                F.regexp_extract("entry", r"(?s)<link>\s*(.*?)\s*</link>", 1),
            )
            .otherwise(
                F.regexp_extract(
                    "entry", r'<link[^>]*href\s*=\s*"([^"]*)"', 1
                )
            )
            .alias("rawloc"),
            F.regexp_extract("entry", r"(?s)<title>\s*(.*?)\s*</title>", 1).alias(
                "rawtitle"
            ),
            F.when(
                F.col("kind") == "rss",
                F.regexp_extract("entry", r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>", 1),
            )
            .otherwise(
                F.regexp_extract("entry", r"(?s)<id>\s*(.*?)\s*</id>", 1)
            )
            .alias("rawguid"),
            F.when(
                F.col("kind") == "rss",
                F.regexp_extract(
                    "entry", r"(?s)<pubDate>\s*(.*?)\s*</pubDate>", 1
                ),
            )
            .otherwise(
                F.regexp_extract(
                    "entry", r"(?s)<updated>\s*(.*?)\s*</updated>", 1
                )
            )
            .alias("rawdate"),
        )
        .where(F.col("rawloc") != "")
        .select(
            "host",
            "kind",
            _decode_entities(F.col("rawloc")).alias("loc"),
            F.when(F.col("rawtitle") == "", None)
            .otherwise(_decode_entities(F.col("rawtitle")))
            .alias("title"),
            F.when(F.col("rawguid") == "", None)
            .otherwise(_decode_entities(F.col("rawguid")))
            .alias("guid"),
            F.when(
                F.col("kind") == "rss", F.expr(rfc822_date_sql("rawdate"))
            )
            .otherwise(F.expr("try_cast(substring(rawdate, 1, 10) AS date)"))
            .alias("published"),
        )
    )
