"""Offline-mirror link rewriting (SURVEY.md §2 op 14).

The reference rewrites links in saved pages to local paths via a dedicated
thread with placeholder tags (Backend/Crawler.cs:3223-3294, 2994-3023).
Batch re-expression, fully DISTRIBUTED (no driver-side mapping collect):

1. a span-scan stage emits one row per link occurrence with the href's
   exact character span (kernels/links.scan_html_spans) and its canonical
   resolution;
2. occurrences join the url→local-path mapping on the canonical target —
   an ordinary shuffle join, so whole-corpus rewrites scale (the mapping
   is as large as the fetched set and is never materialized anywhere);
3. per-page replacement lists (collect_list of span structs) join back to
   the pages and an Arrow-batched splice stage re-emits each document from
   its span segments.

Splicing by span replaces exactly the matched attribute values — one href
being a substring of another, or appearing in body text, can never corrupt
the output (the failure mode of naive str.replace).

Local path scheme (mirrors ``Service.baseDir`` + filename allocation,
Crawler.cs:2609-2616, 2384-2436, simplified): ``host/path`` with
query strings disambiguated by an md5-hex suffix and directory-index
paths mapped to ``index.html``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..kernels.links import scan_html_spans
from ..kernels.urlnorm import canonicalize, is_absolute_href, resolve_links


def local_paths(
    fetched: DataFrame, want_html: bool = True, want_nonhtml: bool = True
) -> DataFrame:
    """url → local mirror path for every fetched page the crawler WANTS.

    ``want_html`` / ``want_nonhtml`` mirror ``WantResource``
    (Crawler.cs:3330-3335): an unwanted type is still fetched and scanned
    for links, but never saved to the mirror (Crawler.cs:1673-1678 deletes
    it and triggers rewrite-to-original) — so it gets NO local path and
    links to it splice to the original URL instead."""
    out = fetched
    if not (want_html and want_nonhtml):
        from ..kernels.mime import _MIME_TO_TYPE

        # binary iff the recorded MIME is outside the html/css/js classes —
        # the exact classification WantResource applies; a plain JVM isin
        # over the (static, ~10-entry) non-binary MIME set. A NULL/absent
        # mime classifies as the html class (the same unknown-defaults-to-
        # HTML rule the decode path applies to extension-less URLs) — under
        # three-valued logic a bare `~isin` would be NULL and the row would
        # silently drop out of BOTH classes (ADVICE r4).
        base = F.lower(F.trim(F.split(F.col("mime"), ";").getItem(0)))
        binary = F.coalesce(~base.isin(list(_MIME_TO_TYPE)), F.lit(False))
        keep = F.lit(True)
        if not want_nonhtml:
            keep = keep & ~binary
        if not want_html:
            keep = keep & binary
        out = out.filter(keep)
    return out.select(
        "url", "host", "url_key",
        F.concat(
            F.col("host"),
            F.when(
                F.col("url_key").endswith("/"),
                F.concat(F.split("url_key", r"\?").getItem(0), F.lit("index.html")),
            ).otherwise(F.split(F.col("url_key"), r"\?").getItem(0)),
            F.when(
                F.col("url_key").contains("?"),
                F.concat(F.lit("_"), F.substring(F.md5("url_key"), 1, 8)),
            ).otherwise(F.lit("")),
        ).alias("local_path"),
    )


REWRITE_SCHEMA = "url string, rewritten string"
SPANS_SCHEMA = "url string, s long, e long, canon string, abs string, is_rel boolean"


def make_linkspan_stage():
    """(url, extracted_text) batches → one row per link occurrence:
    (url, span_start, span_end, canonical_target, resolved_absolute,
    was_relative)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["extracted_text"]):
                if not isinstance(text, str) or not text:
                    continue
                found = scan_html_spans(text)
                if not found:
                    continue
                hrefs = pd.Series([f[2] for f in found], dtype="object")
                dec = pd.Series([f[4] for f in found])
                resolved = resolve_links(hrefs, pd.Series([url] * len(hrefs)), dec)
                # relative = lacks its own scheme (syntax test, same
                # classification resolve_links applies) — NOT raw != resolved,
                # which would misclassify an absolute href differing from its
                # resolution only by normalization (entities, case,
                # whitespace) and mutate a link that must stay untouched
                rel = ~is_absolute_href(hrefs, dec)
                canon = canonicalize(resolved)
                rows.extend(
                    (url, f[0], f[1], c, r, bool(rl))
                    for f, r, c, rl in zip(found, resolved, canon["url"], rel)
                    if c is not None
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "s", "e", "canon", "abs", "is_rel"]
                )

    return stage


def _splice_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for text, repls in zip(pdf["extracted_text"], pdf["repls"]):
            if not isinstance(text, str) or repls is None or len(repls) == 0:
                outs.append(text)
                continue
            spans = sorted((int(r["s"]), int(r["e"]), r["local_path"]) for r in repls)
            parts, pos = [], 0
            for s, e, local in spans:
                if s < pos:
                    continue  # overlap guard (defensive; scans don't overlap)
                parts.append(text[pos:s])
                parts.append(local)
                pos = e
            parts.append(text[pos:])
            outs.append("".join(parts))
        yield pd.DataFrame({"url": pdf["url"], "rewritten": outs})


def rewrite_links(
    spark, fetched: DataFrame, unmapped_to_original: bool = True,
    want_html: bool = True, want_nonhtml: bool = True,
) -> DataFrame:
    """(url, rewritten) — fetched HTML with intra-mirror links localized.

    Every stage is distributed: span scan (mapInPandas) → mapping join on
    the canonical target → per-page replacement lists → splice
    (mapInPandas). Scales to whole-corpus rewrites; the mapping never
    leaves the executors.

    ``unmapped_to_original``: a RELATIVE link whose target is not in the
    mirror is spliced to its resolved absolute original URL, so it still
    works offline instead of dangling (the reference's
    BeginRewritingToOriginalUrl pass for failed/unfetched resources,
    Crawler.cs:3246-3294). Absolute unmapped links are already valid and
    stay untouched.

    ``want_html`` / ``want_nonhtml``: unwanted types (WantResource,
    Crawler.cs:3330-3335) get no mirror path — links to them behave as
    unmapped (relative ones splice to the original URL), matching the
    reference's delete-then-rewrite-to-original for fetched-but-unwanted
    resources (Crawler.cs:1673-1678)."""
    paths = local_paths(fetched, want_html, want_nonhtml).select(
        F.col("url").alias("canon"), "local_path"
    )
    spans = fetched.select("url", "extracted_text").mapInPandas(
        make_linkspan_stage(), SPANS_SCHEMA
    )
    joined = spans.join(paths, "canon", "left")
    new_text = F.coalesce(
        "local_path",
        F.when(F.col("is_rel"), F.col("abs")) if unmapped_to_original
        else F.lit(None).cast("string"),
    )
    repl = (
        joined.withColumn("local_path", new_text)
        .filter(F.col("local_path").isNotNull())
        .groupBy("url")
        .agg(F.collect_list(F.struct("s", "e", "local_path")).alias("repls"))
    )
    return (
        fetched.select("url", "extracted_text")
        .join(repl, "url", "left")
        .mapInPandas(_splice_stage, REWRITE_SCHEMA)
    )
