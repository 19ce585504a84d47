"""In-page Robots Exclusion Protocol: ``<meta name="robots">`` directives
and per-link ``rel="nofollow"`` — the page-level complement of the
robots.txt rules (kernels/robots.py / operators/robotsparse.py).

ADAPT note: the reference honors robots.txt only (Backend/Crawler.cs
robots handling; its link scanner never reads rel attributes,
Crawler.cs:2172-2182). Meta-robots / nofollow gating is the other half of
the REP every production crawler and every crawl-derived training corpus
applies (noindex pages must not be stored/trained on; nofollow links must
not be followed), so the engine carries it as a first-class stage.

100-TB shape: everything here is ONE zero-exchange whole-stage-codegen
projection plus the single anchor-tag ``Generate`` (explode) — the page
flags are computed BEFORE the explode and ride through it, so no join
reunites flags with links. All patterns are RE2-safe constants the DuckDB
oracle interpolates verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the meta tag's content attribute (name/content order fixed, the common
# emitted form; case-insensitive)
META_ROBOTS_RE = '(?i)<meta\\s+name="robots"\\s+content="([^"]*)"'
# directive matching inside the content list: comma/space separated,
# whole-token (noindexfoo must not match)
NOINDEX_RE = "(?i)(^|[,\\s])noindex([,\\s]|$)"
NOFOLLOW_RE = "(?i)(^|[,\\s])nofollow([,\\s]|$)"
# one <a ...> open tag; href and rel read from the tag separately
A_TAG_RE = "(?i)<a\\s[^>]*>"
A_HREF_RE = '(?i)href="([^"]*)"'
A_REL_NOFOLLOW_RE = '(?i)rel="[^"]*nofollow[^"]*"'


def meta_robots(
    pages: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """Per-page directive flags: ``(url, noindex, nofollow)``. Absent or
    empty meta tag → both false. Zero exchanges."""
    content = F.regexp_extract(F.col(text_col), META_ROBOTS_RE, 1)
    # NULL text (a fetch-failed page) carries no directives — flags are
    # false, not NULL
    return pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(content.rlike(NOINDEX_RE), F.lit(False)).alias("noindex"),
        F.coalesce(content.rlike(NOFOLLOW_RE), F.lit(False)).alias("nofollow"),
    )


def gated_links(
    pages: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """One row per ``<a>`` tag: ``(url, href, page_noindex,
    page_nofollow, link_nofollow, followed)`` — ``followed`` is the REP
    verdict (page-level nofollow blocks every link; ``rel="nofollow"``
    blocks its own). Hrefless anchors yield ``href = ''`` and are never
    followed. The page flags project before the explode and ride through
    it: one scan, one Generate, zero exchanges, zero joins."""
    content = F.regexp_extract(F.col(text_col), META_ROBOTS_RE, 1)
    tags = F.regexp_extract_all(F.col(text_col), F.lit(A_TAG_RE), F.lit(0))
    exploded = pages.select(
        F.col(url_col).alias("url"),
        content.rlike(NOINDEX_RE).alias("page_noindex"),
        content.rlike(NOFOLLOW_RE).alias("page_nofollow"),
        F.explode(tags).alias("tag"),
    )
    link_nofollow = F.col("tag").rlike(A_REL_NOFOLLOW_RE)
    href = F.regexp_extract("tag", A_HREF_RE, 1)
    return exploded.select(
        "url",
        href.alias("href"),
        "page_noindex",
        "page_nofollow",
        link_nofollow.alias("link_nofollow"),
        (
            ~F.col("page_nofollow")
            & ~link_nofollow
            & (href != F.lit(""))
        ).alias("followed"),
    )


# the canonical link element (rel/href order fixed, the common emitted
# form; case-insensitive) — the third in-page directive next to
# meta-robots and rel=nofollow
LINK_CANONICAL_RE = '(?i)<link\\s+rel="canonical"\\s+href="([^"]*)"'

# meta refresh (the fourth in-page directive): delay;url=target
META_REFRESH_RE = (
    '(?i)<meta\\s+http-equiv="refresh"\\s+content="'
    '(\\d+)\\s*;\\s*url=([^"]+)"'
)
# an absolute URI (scheme present) / the page's scheme://host origin
_ABS_URI_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"
_ORIGIN_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)"


def meta_refresh(
    pages: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """``<meta http-equiv="refresh">`` client-side redirects — a URL
    discovery edge the reference's five scan regexes never read
    (Crawler.cs:2190-2200 extracts only the meta CHARSET): production
    crawlers follow refresh targets as redirects and corpus pipelines
    treat an instant refresh (delay 0) as an alias. One row per
    declaring page: ``(url, delay_s, target_raw, target)`` — ``target``
    resolves absolute and root-relative ('/path') forms against the
    page's origin; other relative forms keep ``target = NULL`` (the
    documented subset — full RFC 3986 merging lives in the fetch-path
    kernel, not this zero-exchange projection)."""
    delay = F.regexp_extract(F.col(text_col), META_REFRESH_RE, 1)
    raw = F.regexp_extract(F.col(text_col), META_REFRESH_RE, 2)
    origin = F.regexp_extract(F.col(url_col), _ORIGIN_RE, 1)
    resolved = (
        F.when(raw.rlike(_ABS_URI_RE), raw)
        # protocol-relative '//host/x' is NOT root-relative — unresolved
        .when(raw.startswith("//"), F.lit(None).cast("string"))
        .when(raw.startswith("/"), F.concat(origin, raw))
    )
    return (
        pages.select(
            F.col(url_col).alias("url"),
            delay.alias("__delay"),
            raw.alias("target_raw"),
            resolved.alias("target"),
        )
        .filter(F.col("target_raw") != "")
        .select(
            "url",
            F.col("__delay").cast("long").alias("delay_s"),
            "target_raw",
            "target",
        )
    )


def rel_canonical(
    pages: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """``<link rel="canonical">`` election + alias-group rollup:
    ``(url, canonical_url, is_self, n_aliases)`` — the in-page
    canonicalization signal a crawl-derived corpus folds into URL-alias
    dedup (the declared twin of ``url_alias_groups``' content-digest
    grouping: syndicated/parameterized copies NAME their original even
    when bytes differ).

    One-hop rule: the declared target IS the canonical; chains are
    deliberately not followed (the production treatment — a chained
    canonical is unreliable and search engines ignore it). No, empty, or
    unparseable declaration → the page is its own canonical; NULL text
    (a fetch-failed page) likewise.

    100-TB shape: the election is a zero-exchange projection; the
    rollup is one count aggregate on the canonical url (uniform key —
    a mega-group is one hash-agg key, combined map-side, never a
    window) plus the join reuniting sizes with members (AQE broadcasts
    only when the group table measures small)."""
    decl = F.regexp_extract(F.col(text_col), LINK_CANONICAL_RE, 1)
    canonical = F.coalesce(
        F.when(decl != "", decl), F.col(url_col)
    )
    per_page = pages.select(
        F.col(url_col).alias("url"),
        canonical.alias("canonical_url"),
        (canonical == F.col(url_col)).alias("is_self"),
    )
    groups = per_page.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_aliases")
    )
    return per_page.join(groups, "canonical_url").select(
        "url", "canonical_url", "is_self", "n_aliases"
    )
