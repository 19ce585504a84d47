"""URL template mining — structural pattern groups for trap detection.

A crawler trap rarely announces itself: it shows up as ONE URL *shape*
(``/cal/{n}/{n}/idx.html?sid=...``, ``/u/{hex}``) with an unbounded
number of instances. The reference caps runaway URL spaces per-URL
(Crawler.cs query-string length cap + directory-depth cap — kernels
``query_string_cap`` / trap caps here, SURVEY §2 item 11); this operator
is the corpus-scale ANALYSIS pass those caps can be tuned from: group
every URL by its structural template and surface the mega-groups.

Template rules (deterministic, RE2-safe — the DuckDB oracle runs the
same patterns verbatim):
- the path's hex runs of ≥ 8 chars become ``{hex}``, then digit runs
  become ``{n}`` (hex first — a long digit run is also a hex run);
- the query string is reduced to its SORTED parameter names (values
  and order never distinguish a shape);
- the template is ``host || path'' || '?' || names`` — hosts are part
  of the shape (one site's trap is not another's).

100-TB shape: template derivation is ONE zero-exchange codegen
projection (regexp_replace + split/sort higher-order functions); the
only shuffle is the uniform-key template aggregate with map-side
partial combine — a billion-instance trap group collapses map-side.
The distinct-instance count is exact per group via an inner distinct
on (template, path+query) — also uniform keys. No window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# shared with the DuckDB oracle verbatim (both engines are RE2-ish here)
URL_SPLIT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)([^?#]*)\??([^#]*)"
HEX_RUN_RE = "[0-9a-f]{8,}"
NUM_RUN_RE = "[0-9]+"

TRAP_MIN_URLS = 50  # groups at/above this size are trap candidates


def path_template_sql(path: str) -> str:
    """SQL normalizing a path to its structural template."""
    return (
        f"regexp_replace(regexp_replace({path}, '{HEX_RUN_RE}', '{{hex}}'), "
        f"'{NUM_RUN_RE}', '{{n}}')"
    )


def query_names_sql(query: str) -> str:
    """SQL reducing a query string to its sorted parameter-name list."""
    return (
        f"array_join(array_sort(transform(split({query}, '&'), "
        f"s -> split_part(s, '=', 1))), '&')"
    )


def url_pattern_groups(
    urls: DataFrame, url_col: str = "url", trap_min: int = TRAP_MIN_URLS
) -> DataFrame:
    """(template, n_urls, n_instances, sample_url, trap_candidate) — one
    row per structural URL template. ``n_urls`` counts rows (a recrawl
    log counts every visit), ``n_instances`` counts distinct path+query
    instances (the trap signal: instances ≈ visits means an unbounded
    space, not a hot page), ``sample_url`` is the lexicographically
    smallest member."""
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, URL_SPLIT_RE, 1).alias("host"),
        F.regexp_extract(url_col, URL_SPLIT_RE, 2).alias("path"),
        F.regexp_extract(url_col, URL_SPLIT_RE, 3).alias("query"),
    )
    t = u.select(
        "url",
        F.concat(
            F.col("host"),
            F.expr(path_template_sql("path")),
            F.when(
                F.col("query") != "",
                F.concat(F.lit("?"), F.expr(query_names_sql("query"))),
            ).otherwise(F.lit("")),
        ).alias("template"),
        F.concat(F.col("path"), F.lit("?"), F.col("query")).alias("instance"),
    )
    return (
        t.groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("instance").cast("long").alias("n_instances"),
            F.min("url").alias("sample_url"),
        )
        .select(
            "template", "n_urls", "n_instances", "sample_url",
            (F.col("n_urls") >= trap_min).alias("trap_candidate"),
        )
    )
