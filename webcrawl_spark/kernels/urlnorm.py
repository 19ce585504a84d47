"""URL canonicalization kernel — vectorized over pandas Series.

Re-expresses the reference's URL identity semantics:

- ``CleanupInputUri`` (Backend/Crawler.cs:2804-2821): collapse runs of ``//``
  in the *path* to a single ``/`` (query/fragment untouched).
- ``GetAbsoluteLinkUrl`` (Backend/Crawler.cs:1773-1797): HTML-entity-decode
  the link text, drop ``javascript:``/``mailto:`` links, resolve relative
  links against the page base URL.
- identity = ``Uri.GetLeftPart(UriPartial.Query)`` (Crawler.cs:345-357):
  scheme + authority + path + query, **fragment stripped**; .NET ``Uri``
  lower-cases scheme and host and drops default ports (80/http, 443/https,
  21/ftp).
- ``Service.MakeKey`` (Crawler.cs:2618-2625): dedup key within a host =
  AbsolutePath (lower-cased when ``CaseSensitivePaths`` is false) + Query.
- ``UrlFilters.StripWWWPrefix`` (Crawler.cs:3429-3437) and
  ``UrlFilters.NormalizeQuery`` (Crawler.cs:3387-3427): optional URL hacks —
  strip a leading ``www.`` and ordinal-sort ``k=v`` query pairs (only when
  the whole query matches the reference's ``queryRe``, Crawler.cs:3453).

Notes on fidelity: .NET ``Uri`` also removes dot-segments (``.``/``..``) from
paths; we implement that. Percent-encoding is treated as opaque (neither
re-encoded nor decoded) — deterministic on both engine and oracle since both
share this kernel. Empty paths normalize to ``/``.
"""

from __future__ import annotations

import html
import re
from urllib.parse import urljoin

import numpy as np
import pandas as pd

# RFC 3986 appendix-B split regex (public standard).
_URL_SPLIT_RE = (
    r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*):)?"  # 1 scheme
    r"(?://([^/?#]*))?"                   # 2 authority
    r"([^?#]*)"                           # 3 path
    r"(?:\?([^#]*))?"                     # 4 query
    r"(?:#(.*))?$"                        # 5 fragment
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# Reference queryRe (Crawler.cs:3453): ^\?(k=v)(&k=v)*&?$ with k,v in
# [\w\-/.!~*'()] (ECMAScript \w = [A-Za-z0-9_]).  We test the query without
# its leading '?'.
_PAIR = r"[A-Za-z0-9_\-/.!~*'()]+=[A-Za-z0-9_\-/.!~*'()]*"
_QUERY_OK_RE = re.compile(r"^%s(?:&%s)*&?$" % (_PAIR, _PAIR))

_DOT_SEG_RE = re.compile(r"/\.\.?(?:/|$)")


def split_urls(urls: pd.Series) -> pd.DataFrame:
    """Split absolute URLs into (scheme, authority, path, query, fragment).

    Vectorized via ``str.extract``. Missing parts are empty strings.
    """
    s = urls.astype("object").fillna("")
    parts = s.str.extract(_URL_SPLIT_RE)
    parts.columns = ["scheme", "authority", "path", "query", "fragment"]
    return parts.fillna("")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal (.NET Uri path normalization)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing '/' that a trailing '.' or '..' implies
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    result = "/".join(out)
    if not result:
        return "/"
    return result if result.startswith("/") else "/" + result


def normalize_paths(paths: pd.Series) -> pd.Series:
    """Collapse ``//`` runs (CleanupInputUri, Crawler.cs:2804-2821), remove
    dot-segments, and normalize empty paths to ``/``."""
    p = paths.fillna("").astype("object")
    p = p.where(p != "", "/")
    p = p.where(p.str.startswith("/"), "/" + p)
    # collapse runs of slashes — vectorized regex replace
    mask = p.str.contains("//", regex=False)
    if mask.any():
        p = p.where(~mask, p.str.replace(r"/{2,}", "/", regex=True))
    # dot segments are rare: per-element only on the minority that has them
    dmask = p.str.contains(_DOT_SEG_RE)
    if dmask.any():
        p = p.where(~dmask, p[dmask].map(_remove_dot_segments))
    return p


def sort_query(query: str) -> str:
    """Ordinal sort of k=v pairs — UrlFilters.NormalizeQuery semantics
    (Crawler.cs:3387-3427): only applies when the whole query matches the
    restricted ``queryRe`` grammar; pairs sorted by key (ordinal); a trailing
    ``&`` is dropped. Stable sort (documented divergence: .NET List.Sort is
    unstable; stability only matters for duplicate keys)."""
    if not query or not _QUERY_OK_RE.match(query):
        return query
    pairs = [p for p in query.split("&") if p]
    pairs.sort(key=lambda kv: kv.split("=", 1)[0])
    return "&".join(pairs)


def _split_authority(auth: pd.Series) -> tuple[pd.Series, pd.Series, pd.Series]:
    """authority → (userinfo, host, port); host lower-cased."""
    a = auth.fillna("")
    if len(a) == 0:
        empty = pd.Series([], index=a.index, dtype="object")
        return empty, empty.copy(), empty.copy()
    has_user = a.str.contains("@", regex=False)
    userinfo = pd.Series(np.where(has_user, a.str.rpartition("@")[0], ""), index=a.index)
    hostport = pd.Series(np.where(has_user, a.str.rpartition("@")[2], a), index=a.index)
    # IPv6 literals '[::1]:8080' — partition on last ':' after ']' check
    extracted = hostport.str.extract(r"^(\[[^\]]*\]|[^:]*)(?::(\d*))?$")
    host = extracted[0].fillna(hostport).str.lower()
    port = extracted[1].fillna("")
    return userinfo, host, port


def canonicalize(
    urls: pd.Series,
    *,
    strip_www: bool = False,
    normalize_query: bool = False,
    case_sensitive_paths: bool = True,
) -> pd.DataFrame:
    """Canonicalize absolute URLs.

    Returns DataFrame columns:
      url       — canonical absolute URL (fragment stripped, default port
                  stripped, host/scheme lower-cased, path slash-collapsed)
      host      — lower-cased host (no port)
      url_key   — MakeKey: path(+lower if case-insensitive) + '?query'
      service   — scheme + '_' + authority (GetServiceKey, Crawler.cs:2989-2992)
      scheme    — lower-cased scheme
      path      — normalized path
      query     — query ('' if none)

    Invalid/None inputs yield url=None rows.
    """
    parts = split_urls(urls)
    scheme = parts["scheme"].str.lower()
    userinfo, host, port = _split_authority(parts["authority"])

    if strip_www:
        host = host.str.replace(r"^www\.", "", regex=True, case=False)

    path = normalize_paths(parts["path"])
    query = parts["query"].fillna("")
    if normalize_query:
        qmask = query != ""
        if qmask.any():
            query = query.where(~qmask, query[qmask].map(sort_query))

    # drop default ports (.NET Uri.GetLeftPart drops them)
    default = scheme.map(_DEFAULT_PORTS).fillna("")
    port = port.where(port != default, "")

    auth = np.where(userinfo != "", userinfo + "@" + host, host)
    auth = pd.Series(auth, index=host.index)
    auth = auth.where(port == "", auth + ":" + port)

    qsuffix = np.where(query != "", "?" + query, "")
    url = scheme + "://" + auth + path + qsuffix

    key_path = path if case_sensitive_paths else path.str.lower()
    url_key = key_path + qsuffix
    service = scheme + "_" + auth

    valid = (scheme != "") & (host != "")
    url = url.where(valid, None)

    return pd.DataFrame(
        {
            "url": url,
            "host": host.where(valid, None),
            "url_key": url_key.where(valid, None),
            "service": service.where(valid, None),
            "scheme": scheme,
            "path": path,
            "query": query,
        }
    )


_ABS_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def is_absolute_href(
    hrefs: pd.Series, decode_entities: pd.Series | bool = True
) -> pd.Series:
    """Syntax test: does the (entity-decoded, stripped) href carry its own
    scheme? Matches the classification :func:`resolve_links` applies before
    resolving — an absolute href that differs from its canonical form only
    by normalization (entities, case, whitespace) is still absolute."""
    h = hrefs.astype("object").fillna("").str.strip()
    if isinstance(decode_entities, bool):
        decode_mask = pd.Series(decode_entities, index=h.index)
    else:
        decode_mask = decode_entities.astype(bool)
    ent = h.str.contains("&", regex=False) & decode_mask
    if ent.any():
        h = h.where(~ent, h[ent].map(html.unescape))
    return h.str.contains(_ABS_RE)


def resolve_links(hrefs: pd.Series, base_urls: pd.Series, decode_entities: pd.Series | bool = True) -> pd.Series:
    """GetAbsoluteLinkUrl (Crawler.cs:1773-1797), vectorized.

    - HTML-entity-decode the href (only for HTML-sourced links; CSS links are
      not decoded — Crawler.cs:1906 passes decodeEntities=false).
    - Drop ``javascript:`` / ``mailto:`` links → None.
    - Resolve relative hrefs against the base URL (the page URL or its
      ``<base href>`` override).

    Fast vectorized paths for absolute / root-relative / protocol-relative
    hrefs; generic ``urljoin`` only for the relative-path minority.
    """
    h = hrefs.astype("object").fillna("").str.strip()
    if isinstance(decode_entities, bool):
        decode_mask = pd.Series(decode_entities, index=h.index)
    else:
        decode_mask = decode_entities.astype(bool)
    ent = h.str.contains("&", regex=False) & decode_mask
    if ent.any():
        h = h.where(~ent, h[ent].map(html.unescape))

    bad = h.str.lower().str.startswith(("javascript:", "mailto:")) | (h == "")
    is_abs = h.str.contains(_ABS_RE)
    is_proto_rel = h.str.startswith("//")

    base_parts = split_urls(base_urls)
    bscheme = base_parts["scheme"].str.lower()
    bauth = base_parts["authority"]

    out = pd.Series(index=h.index, dtype="object")
    out[is_abs] = h[is_abs]
    m = is_proto_rel & ~is_abs
    if m.any():
        out[m] = bscheme[m] + ":" + h[m]
    root_rel = h.str.startswith("/") & ~is_proto_rel & ~is_abs
    if root_rel.any():
        out[root_rel] = bscheme[root_rel] + "://" + bauth[root_rel] + h[root_rel]
    rest = ~(is_abs | is_proto_rel | root_rel)
    if rest.any():
        out[rest] = [
            urljoin(b if isinstance(b, str) else "", u)
            for u, b in zip(h[rest], base_urls[rest])
        ]
    out[bad] = None
    return out
