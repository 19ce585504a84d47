"""HTML/CSS link-extraction kernel.

Ports the reference's five scan regexes to Python ``re`` with the same
options (IGNORECASE + DOTALL; VERBOSE where the original used
IgnorePatternWhitespace):

- ``baseRe``     (Backend/Crawler.cs:2170)      — ``<base href>`` override.
  The original uses a variable-length lookbehind (unsupported in Python re);
  rewritten as a capture group with identical match semantics for extraction.
- ``htmlLinkRe`` (Backend/Crawler.cs:2172-2182) — a/href, img|script|embed/src,
  i?frame/src, link/href, applet code|object, object data|codebase,
  param[name=src|href|file|filename|data|movie]/value, \\*[background|bgimage].
  ``link`` groups → LinkType.Link, ``resLink`` groups → LinkType.Resource
  (GetLinkMatchGroup, Crawler.cs:1800-1812). Python forbids duplicate group
  names, so groups are numbered and coalesced; alternation order preserved.
- ``styleRe``    (Backend/Crawler.cs:2184-2187) — <style> blocks + style= attrs.
- ``cssLinkRe``  (Backend/Crawler.cs:2198-2200) — ``@import "…"`` / ``url(…)``.
- ``metaRe``     (Backend/Crawler.cs:2192-2196) — meta content-type charset
  (used by the charset kernel, re-exported here).

Scan order follows ``ScanForLinks`` (Crawler.cs:1878-1921): HTML docs scan
htmlLinkRe matches first (entity-decoded), then css links inside style blocks
(not decoded); CSS docs scan cssLinkRe only. The per-document match ordinal is
preserved — it drives the engine's deterministic discovery sequence.
"""

from __future__ import annotations

import re

import pandas as pd

_OPTS = re.IGNORECASE | re.DOTALL

BASE_RE = re.compile(r'<base\s[^>]*href\s*=\s*"?([^">]+)', _OPTS)

HTML_LINK_RE = re.compile(
    r"""<(?:a\b[^>]*?\bhref\s*=\s*(?:"(?P<l1>[^">]+)|'(?P<l2>[^'>]+)|(?P<l3>[^>\s]+))|
         (?:img|script|embed)\b[^>]*?\bsrc\s*=\s*(?:"(?P<r1>[^">]+)|'(?P<r2>[^'>]+)|(?P<r3>[^>\s]+))|
         i?frame\b[^>]*?\bsrc\s*=\s*(?:"(?P<l4>[^">]+)|'(?P<l5>[^'>]+)|(?P<l6>[^>\s]+))|
         link\b[^>]*?\bhref\s*=\s*(?:"(?P<r4>[^">]+)|'(?P<r5>[^'>]+)|(?P<r6>[^>\s]+))|
         applet\b[^>]*?\b(?:code|object)\s*=\s*(?:"(?P<r7>[^"]+)|'(?P<r8>[^'>]+)|(?P<r9>[^>\s]+))|
         object\b[^>]*?\b(?:data|codebase)\s*=\s*(?:"(?P<r10>[^"]+)|'(?P<r11>[^'>]+)|(?P<r12>[^>\s]+))|
         param\s+name=["'](?:src|href|file|filename|data|movie)["']\s+value=(?:"(?P<r13>[^"]+)|'(?P<r14>[^'>]+)|(?P<r15>[^>\s]+))|
         \w+\b[^>]+?\b(?:background|bgimage)\s*=\s*(?:"(?P<r16>[^"]+)|'(?P<r17>[^'>]+)|(?P<r18>[^>\s]+)))""",
    _OPTS | re.VERBOSE,
)

STYLE_RE = re.compile(
    r"""<style(?:\s[^>]*)?>(?P<css1>.*?)</style>|<[^>]+\bstyle\s*=\s*(?:"(?P<css2>[^">]+)|'(?P<css3>[^'>]+))""",
    _OPTS,
)

CSS_LINK_RE = re.compile(
    r"""@import "(?P<r1>[^"]+)|url\(['"]?(?P<r2>[^)]+?)['"]?\)""", _OPTS
)

META_RE = re.compile(
    r"""<meta\b[^>]*?\b(?:http-equiv="content-type"[^>]*?\bcontent="[^"]*?charset=(?P<cs1>[\w-]+)"|
                         content="[^"]*?charset=(?P<cs2>[\w-]+)"[^>]*?\bhttp-equiv="content-type")""",
    _OPTS | re.VERBOSE,
)

LINK = "link"
RESOURCE = "resource"


def _html_match_group(m: re.Match) -> tuple[str, str]:
    """(group_name, link_type) of the successful group; l* → link, r* → resource."""
    d = m.groupdict()
    for name in ("l1", "l2", "l3", "l4", "l5", "l6"):
        if d.get(name) is not None:
            return name, LINK
    for i in range(1, 19):
        name = f"r{i}"
        if d.get(name) is not None:
            return name, RESOURCE
    return "r1", RESOURCE  # unreachable: some group always matches


def _html_match_link(m: re.Match) -> tuple[str, str]:
    """(href, link_type) — first successful group wins; l* → link, r* → resource."""
    name, ltype = _html_match_group(m)
    v = m.group(name)
    return (v if v is not None else "", ltype)


def find_base_href(content: str) -> str | None:
    """First <base href> value (ScanForLinks, Crawler.cs:1884-1890)."""
    m = BASE_RE.search(content)
    return m.group(1) if m else None


def scan_html(content: str) -> list[tuple[str, str, bool]]:
    """All links in an HTML document in reference scan order.

    Returns [(href_raw, link_type, decode_entities)]: htmlLinkRe matches
    (decode_entities=True) followed by css links inside <style> blocks /
    style= attributes (decode_entities=False) — Crawler.cs:1892-1912.
    """
    out: list[tuple[str, str, bool]] = []
    for m in HTML_LINK_RE.finditer(content):
        href, ltype = _html_match_link(m)
        out.append((href, ltype, True))
    for sm in STYLE_RE.finditer(content):
        css = sm.group("css1") or sm.group("css2") or sm.group("css3") or ""
        for lm in CSS_LINK_RE.finditer(css):
            href = lm.group("r1") or lm.group("r2") or ""
            out.append((href, RESOURCE, False))
    return out


def scan_html_spans(content: str) -> list[tuple[int, int, str, str, bool]]:
    """Like :func:`scan_html` but with the href's exact character span:
    [(start, end, href_raw, link_type, decode_entities)]. Spans anchor
    rewrites to the matched attribute value — replacing by span can never
    corrupt body text or collide when one href is a substring of another."""
    out: list[tuple[int, int, str, str, bool]] = []
    for m in HTML_LINK_RE.finditer(content):
        name, ltype = _html_match_group(m)
        out.append((m.start(name), m.end(name), m.group(name), ltype, True))
    for sm in STYLE_RE.finditer(content):
        for gname in ("css1", "css2", "css3"):
            css = sm.group(gname)
            if css:
                base = sm.start(gname)
                for lm in CSS_LINK_RE.finditer(css):
                    g = "r1" if lm.group("r1") is not None else "r2"
                    out.append(
                        (base + lm.start(g), base + lm.end(g), lm.group(g),
                         RESOURCE, False)
                    )
                break
    return out


def scan_css(content: str) -> list[tuple[str, str, bool]]:
    """Links in a pure-CSS document (Crawler.cs:1913-1920)."""
    return [
        (m.group("r1") or m.group("r2") or "", RESOURCE, False)
        for m in CSS_LINK_RE.finditer(content)
    ]


def extract_links_batch(contents: pd.Series, resource_types: pd.Series) -> pd.Series:
    """Per-document link lists: Series[list[(href, link_type, decode_entities)]].

    resource_types: 'html' | 'css' | other (other → no links scanned).
    Regex scan is C-driven per document (compiled once per executor import);
    the per-document loop is over matches, not rows×chars.
    """
    out = []
    for content, rtype in zip(contents, resource_types):
        if not isinstance(content, str) or not content:
            out.append([])
        elif rtype == "html":
            out.append(scan_html(content))
        elif rtype == "css":
            out.append(scan_css(content))
        else:
            out.append([])
    return pd.Series(out, index=contents.index, dtype="object")
