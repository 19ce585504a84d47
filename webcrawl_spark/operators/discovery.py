"""URL-discovery union: the out-of-band ingestion edges → one frontier feed.

The reference discovers URLs from exactly one channel — scanning fetched
bodies (Crawler.cs ``ScanForLinks``, the five regexes in kernels/links.py).
At Common-Crawl scale a frontier ingests three more channels, each already
implemented as its own single-scan parser:

- ``robotsparse.sitemap_urls`` — global ``Sitemap:`` lines in robots.txt
  (RFC 9309 §2.2.4 / sitemaps.org discovery)
- ``sitemap.parse_sitemaps`` — ``<urlset>`` page URLs and
  ``<sitemapindex>`` child sitemaps
- ``feeds.parse_feeds`` — RSS 2.0 / Atom syndication entries
- ``metarobots.meta_refresh`` (optional 4th edge) — in-page
  ``<meta http-equiv="refresh">`` client-side redirect targets

This operator is the capstone that merges them into ONE deduplicated
candidate table ``(host, loc, sources, n_refs)`` and optionally anti-joins
the crawler's seen set (the same §2 op-10 pattern the in-crawl frontier
dedup uses), so a crawl can bootstrap or refresh from every discovery
channel at once. ``sources`` is the sorted '+'-joined set of edges that
referenced the URL (e.g. ``robots+sitemap_index`` when a robots Sitemap
line and a sitemap index both point at the same child sitemap) — a signal
downstream prioritization can weight; ``n_refs`` counts raw references.

100-TB shape: three narrow parser scans union into ONE exchange on the
uniform ``(host, loc)`` key with map-side partial ``collect_set`` (the
source set is ≤4 elements by construction, so partial aggregation
collapses duplicate references before the shuffle); the optional seen
anti-join is a second uniform-key exchange on ``loc`` — identical scaling
behavior to the frontier's seen anti-join. No skew risk: a URL referenced
by every channel still contributes ≤4 rows per channel-scan partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .feeds import parse_feeds
from .robotsparse import sitemap_urls
from .sitemap import parse_sitemaps

DISCOVERY_SCHEMA = "host string, loc string, sources string, n_refs bigint"


def discover_urls(
    robots_bodies: DataFrame,
    sitemap_bodies: DataFrame,
    feed_bodies: DataFrame,
    seen: DataFrame | None = None,
    pages: DataFrame | None = None,
) -> DataFrame:
    """Union the discovery edges into one deduplicated candidate table.
    ``seen`` (a one-column ``url`` frame, e.g. ``SparkCrawler.seen()``'s
    keys) removes already-crawled URLs via left-anti join. ``pages``
    (url, text) adds the FOURTH edge: ``<meta http-equiv="refresh">``
    client-side redirect targets (``functions/metarobots.meta_refresh``
    — resolved targets only), source-tagged ``refresh``."""
    rb = sitemap_urls(robots_bodies).select(
        "host",
        F.col("sitemap_url").alias("loc"),
        F.lit("robots").alias("source"),
    )
    sm = parse_sitemaps(sitemap_bodies).select(
        "host",
        "loc",
        F.when(F.col("kind") == "url", "sitemap")
        .otherwise("sitemap_index")
        .alias("source"),
    )
    fd = parse_feeds(feed_bodies).select(
        "host", "loc", F.lit("feed").alias("source")
    )
    edges = rb.unionByName(sm).unionByName(fd)
    if pages is not None:
        from ..functions.metarobots import meta_refresh

        mr = (
            meta_refresh(pages)
            .filter(F.col("target").isNotNull())
            .select(
                F.regexp_extract(
                    "target", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1
                ).alias("host"),
                F.col("target").alias("loc"),
                F.lit("refresh").alias("source"),
            )
        )
        edges = edges.unionByName(mr)
    out = (
        edges
        .groupBy("host", "loc")
        .agg(
            F.array_join(F.sort_array(F.collect_set("source")), "+").alias(
                "sources"
            ),
            F.count(F.lit(1)).alias("n_refs"),
        )
    )
    if seen is not None:
        out = out.join(
            seen.select(F.col("url").alias("loc")).distinct(),
            "loc",
            "left_anti",
        )
    return out.select("host", "loc", "sources", "n_refs")
