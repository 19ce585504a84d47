"""User URI / content filters — console semantics (Crawler/main.cs:285-319)
and GUI content filters (GuiCrawler/MainForm.cs:983-1012).

Order (crawl_FilterUris):
1. change filters: each filter whose regex matches rewrites the URL string to
   its replacement with ``$n`` / ``${n}`` substituted from the match groups
   (``varRe``, main.cs:404); filters chain over the mutated string.
2. positive filters: URL must match ALL, else rejected (None).
3. negative filters: URL rejected if ANY matches.
4. URL hacks (StripWWWPrefix + NormalizeQuery) — handled by the
   canonicalization kernel flags, applied after filters as in main.cs:316.

Content filters: regex replace over the decoded document text *before* link
extraction (the reference rewrites the file at Crawler.cs:1622, then scans at
1658 — order matters and is preserved).
"""

from __future__ import annotations

import re

import pandas as pd

_VAR_RE = re.compile(r"\$(?:\{(\d+)\}|(\d+))")  # varRe, main.cs:404


def _dollar_to_python(repl: str) -> str:
    r"""Convert ``$1`` / ``${1}`` group refs to Python ``\g<1>``."""
    return _VAR_RE.sub(lambda m: "\\g<%s>" % (m.group(1) or m.group(2)), repl)


def compile_uri_filters(change, positive, negative):
    """Precompile filter config → (change[(rx, py_repl)], pos[rx], neg[rx])."""
    ch = [(re.compile(p), _dollar_to_python(r)) for p, r in change]
    pos = [re.compile(p) for p in positive]
    neg = [re.compile(p) for p in negative]
    return ch, pos, neg


def apply_uri_filters(urls: pd.Series, change, positive, negative) -> pd.Series:
    """Vectorized filter chain; rejected URLs become None.

    change-filter fidelity note (main.cs:294-301): the reference substitutes
    groups of the *first* match into the replacement template, replacing the
    whole URL string; Python ``rx.sub(repl, s, count=1)`` replaces only the
    matched span. We therefore anchor semantics to the reference: when the
    regex matches, the new URL is the substituted replacement template alone.
    """
    s = urls.astype("object")
    for rx, repl in change:
        mask = s.notna()
        if not mask.any():
            break
        sub = s[mask].map(
            lambda u: (lambda m: m.expand(repl) if m else u)(rx.search(u))
        )
        s = s.where(~mask, sub)
    for rx in positive:
        mask = s.notna()
        ok = s[mask].str.contains(rx)
        s = s.where(~mask | ok.reindex(s.index, fill_value=False), None)
    for rx in negative:
        mask = s.notna()
        bad = s[mask].str.contains(rx)
        s = s.where(~mask | ~bad.reindex(s.index, fill_value=True), None)
    return s


def apply_content_filters(texts: pd.Series, content_filters) -> pd.Series:
    """Regex-replace chain over decoded text (MainForm.cs:983-1012)."""
    s = texts
    for pattern, repl in content_filters:
        rx = re.compile(pattern)
        py = _dollar_to_python(repl)
        mask = s.notna()
        s = s.where(~mask, s[mask].str.replace(rx, py, regex=True))
    return s
