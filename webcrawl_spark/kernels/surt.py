"""SURT keys and CDX index records — the crawl archive's URL index.

SURT (Sort-friendly URI Reordering Transform) is the public key format of
web-archive indexes (the ``surt``/pywb libraries, Common Crawl's CC-INDEX
CDXJ files): ``http://Sub.Example.COM:8080/A/b?z=1&a=2#f`` becomes
``com,example,sub:8080)/a/b?a=2&z=1``, so a lexicographic sort clusters a
registered domain's URLs together and range scans answer "everything under
example.com". A CDX index is the sorted table of (surt key, timestamp,
original url, mime, status, payload digest, length) — the random-access
lookup structure a 100-TB WARC corpus needs (pairs with ``sources/warc``).

ADAPT note: the reference crawler has no archive index at all — its seen
set is an in-memory hashtable keyed by canonical URL (Crawler.cs:2301-2320)
and its output is a mirror directory tree. SURT/CDX is how the same corpus
is indexed at Common-Crawl scale; this module is additive capability, not
reference parity.

Canonicalization rules implemented (pywb's default canon, documented here
as the contract the tests pin):

- scheme is dropped; host, path and query are lowercased
- a leading ``www.`` / ``www2.`` … host label is dropped
- host labels are reversed and joined with commas
- default ports are dropped (``:80`` for http, ``:443`` for https); other
  ports survive, appended to the host part
- empty path becomes ``/``
- query parameters are sorted bytewise; an empty query drops the ``?``
- the fragment is dropped

Everything is Spark built-in column algebra — regexp_extract / split /
reverse / array_sort / array_join — one whole-stage-codegen projection, no
Python, no shuffle. The CDX sort itself is a global ``orderBy``: one
range-partitioned exchange, the unavoidable (and scalable) cost of a
sorted index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["surt_key", "cdx_index"]

# 14-digit CDX timestamp, the web-archive convention (yyyyMMddhhmmss)
CDX_TS_FMT = "yyyyMMddHHmmss"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def surt_key(url) -> Column:
    """SURT key column for an absolute http(s) URL column.

    Pure built-in expressions: the parse is three anchored regexes over the
    URL (host, port, path, query), the reorder is split/reverse/array_join,
    the query sort is split/array_sort/array_join. NULL/relative inputs
    yield NULL (no host match).
    """
    u = _c(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    port = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\d+)", 1)
    path = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    query = F.lower(F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1))

    rev_host = F.array_join(
        F.reverse(F.split(F.regexp_replace(host, r"^www\d*\.", ""), r"\.")), ","
    )
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.sort_array(F.split(query, "&")), "&"))
    )
    return F.when(
        host == "", F.lit(None).cast("string")
    ).otherwise(F.concat(rev_host, port_part, F.lit(")"), path_part, query_part))


def cdx_index(
    records: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
    mime_col=None,
    status_col=None,
    sort: bool = True,
) -> DataFrame:
    """CDX index rows from fetched/WARC response records.

    Output: (url_key, cdx_ts, url, mime, status, digest, length), optionally
    globally sorted by (url_key, cdx_ts) — the on-disk CDX contract. digest
    is md5 of the payload bytes, length the payload byte count; mime/status
    default to text/html / 200 when the source table carries none (the
    synthetic corpus), matching Common Crawl's response-record defaults.
    """
    mime = _c(mime_col) if mime_col is not None else F.lit("text/html")
    status = (
        _c(status_col).cast("int") if status_col is not None else F.lit(200)
    )
    out = records.select(
        surt_key(url_col).alias("url_key"),
        F.date_format(F.col(ts_col), CDX_TS_FMT).alias("cdx_ts"),
        F.col(url_col).alias("url"),
        mime.alias("mime"),
        status.alias("status"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("long").alias("length"),
    )
    return out.orderBy("url_key", "cdx_ts") if sort else out
