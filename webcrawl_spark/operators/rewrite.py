"""Offline-mirror link rewriting (SURVEY.md §2 op 14).

The reference rewrites links in saved pages to local paths via a dedicated
thread with placeholder tags (Backend/Crawler.cs:3223-3294, 2994-3023).
Batch re-expression: one vectorized pass over fetched HTML that replaces
every absolute link whose canonical key was fetched with its local mirror
path, and leaves everything else as the original URL — no placeholder
protocol needed because the whole mapping exists up front.

Local path scheme (mirrors ``Service.baseDir`` + filename allocation,
Crawler.cs:2609-2616, 2384-2436, simplified): ``host/path`` with
query strings disambiguated by an md5-hex suffix and directory-index
paths mapped to ``index.html``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..kernels.links import scan_html
from ..kernels.urlnorm import canonicalize, resolve_links


def local_paths(fetched: DataFrame) -> DataFrame:
    """url → local mirror path for every fetched page."""
    return fetched.select(
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


def make_rewrite_stage(mapping_bc):
    """(url, extracted_text) batches → (url, rewritten): every href whose
    canonical form maps to a fetched page becomes its local path."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mapping = mapping_bc.value
        for pdf in batches:
            outs = []
            for url, text in zip(pdf["url"], pdf["extracted_text"]):
                if not isinstance(text, str) or not text:
                    outs.append(text)
                    continue
                found = scan_html(text)
                hrefs = pd.Series([h for h, _t, _d in found], dtype="object")
                if hrefs.empty:
                    outs.append(text)
                    continue
                resolved = resolve_links(
                    hrefs, pd.Series([url] * len(hrefs)),
                    pd.Series([d for _h, _t, d in found]),
                )
                canon = canonicalize(resolved)
                repl = {
                    raw: mapping[c]
                    for raw, c in zip(hrefs, canon["url"])
                    if c is not None and c in mapping
                }
                out = text
                for raw, local in repl.items():
                    out = out.replace(raw, local)
                outs.append(out)
            yield pd.DataFrame({"url": pdf["url"], "rewritten": outs})

    return stage


def rewrite_links(spark, fetched: DataFrame) -> DataFrame:
    """(url, rewritten) — fetched HTML with intra-mirror links localized.

    The url→path mapping is collected and broadcast (mirror jobs are
    host-scoped and small); for whole-corpus rewrites partition pages AND
    mapping by host and feed per-host maps through a cogrouped
    applyInPandas instead of one global broadcast."""
    mapping = {
        r["url"]: r["local_path"] for r in local_paths(fetched).collect()
    }
    bc = spark.sparkContext.broadcast(mapping)
    return fetched.select("url", "extracted_text").mapInPandas(
        make_rewrite_stage(bc), REWRITE_SCHEMA
    )
