"""Scope-filter kernel — ``IsUriAllowed`` (Backend/Crawler.cs:3108-3164).

Semantics, in order:

1. scheme must be http/https/ftp (Crawler.cs:3113-3118).
2. guessed type: supporting resources (LinkType.Resource) are treated as
   Binary; navigable links are guessed from the URL extension
   (Crawler.cs:3121). Binary is rejected when NonHtml downloads are off
   (Crawler.cs:3122-3125).
3. Everywhere + UpAndDown short-circuits to allowed (Crawler.cs:3127-3130).
4. per base URI: when directory navigation is constrained and the candidate
   is on the same host as the base, the directory relation must be ``Same``
   or exactly the configured direction (Crawler.cs:3137-3147); then the
   domain rule (SameHostName / SameDomain via ``domainRe`` / SameTLD via
   ``tldRe`` / Everywhere) must match (Crawler.cs:3151-3157).
5. otherwise the URL is *external*: allowed only if it is a supporting
   resource and ExternalResources is on (Crawler.cs:3160-3163).

Directory comparison (``CompareDirectories``, Crawler.cs:2885-2905) drops a
trailing filename segment and prefix-compares directory segments; because
directory strings always end in ``/``, segment-prefix comparison equals
string-prefix comparison on the directory part.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .config_free import SCHEMES  # re-exported constant set
from .mime import BINARY, guess_types_batch

DOMAIN_RE = re.compile(r"[\w-]+\.\w+$")   # Crawler.cs:3377
TLD_RE = re.compile(r"(?<=\.)\w+$")        # Crawler.cs:3379

SAME, UP, DOWN, UP_AND_DOWN = "Same", "Up", "Down", "UpAndDown"
EVERYWHERE, SAME_HOSTNAME, SAME_DOMAIN, SAME_TLD = (
    "Everywhere", "SameHostName", "SameDomain", "SameTLD",
)


def dir_of(path: pd.Series) -> pd.Series:
    """Directory part of a path: up to and including the last '/'
    (CompareDirectories drops a trailing non-'/' segment)."""
    p = path.fillna("/")
    idx = p.str.rfind("/")
    return pd.Series(
        [s[: i + 1] if i >= 0 else "/" for s, i in zip(p, idx)], index=p.index
    )


def _domain_key(host: str, rx: re.Pattern) -> str | None:
    m = rx.search(host)
    return m.group(0).lower() if m else None


def compare_dirs(uri_dir: str, base_dir: str, case_sensitive: bool = True) -> str:
    a, b = (uri_dir, base_dir) if case_sensitive else (uri_dir.lower(), base_dir.lower())
    if a == b:
        return SAME
    if a.startswith(b):
        return DOWN
    if b.startswith(a):
        return UP
    return UP_AND_DOWN


def scope_filter(
    cand: pd.DataFrame,
    base_uris: list[dict],
    *,
    domain_nav: str = SAME_HOSTNAME,
    dir_nav: str = DOWN,
    want_nonhtml: bool = True,
    external_resources: bool = True,
    case_sensitive_paths: bool = True,
) -> pd.DataFrame:
    """Vectorized IsUriAllowed over a candidate frame.

    ``cand`` columns: scheme, host, path, link_type ('link'|'resource').
    ``base_uris``: [{'host','path','scheme'}] — canonicalized seed URLs
    (AddBaseUri appends every seed, Crawler.cs:831-835).

    Returns DataFrame(allowed: bool, is_external: bool).
    """
    n = len(cand)
    idx = cand.index
    scheme_ok = cand["scheme"].isin(SCHEMES)

    is_link = cand["link_type"].eq("link")
    guessed = guess_types_batch(cand["path"])
    rtype_binary = np.where(is_link, guessed.eq(BINARY), True)
    type_ok = ~(rtype_binary & (not want_nonhtml))

    allowed = np.zeros(n, dtype=bool)
    matched_internal = np.zeros(n, dtype=bool)

    if domain_nav == EVERYWHERE and dir_nav == UP_AND_DOWN:
        matched_internal[:] = True
    else:
        cand_dir = dir_of(cand["path"])
        host = cand["host"].fillna("")
        if domain_nav == SAME_DOMAIN:
            cand_dom = host.map(lambda h: _domain_key(h, DOMAIN_RE))
        elif domain_nav == SAME_TLD:
            cand_dom = host.map(lambda h: _domain_key(h, TLD_RE))
        else:
            cand_dom = None

        remaining = np.ones(n, dtype=bool)
        for base in base_uris:
            bhost = base["host"].lower()
            bdir = dir_of(pd.Series([base["path"]])).iloc[0]
            same_host = (host == bhost).to_numpy()

            eligible = remaining.copy()
            if dir_nav != UP_AND_DOWN:
                # same-host candidates must satisfy the directory rule
                sh = same_host & eligible
                if sh.any():
                    cmp = np.array(
                        [
                            compare_dirs(d, bdir, case_sensitive_paths)
                            for d in cand_dir.to_numpy()[sh]
                        ]
                    )
                    ok = (cmp == dir_nav) | (cmp == SAME)
                    bad = sh.copy()
                    bad[sh] = ~ok
                    eligible &= ~bad
                if domain_nav == SAME_HOSTNAME:
                    eligible &= same_host

            if domain_nav == EVERYWHERE:
                dmatch = np.ones(n, dtype=bool)
            elif domain_nav == SAME_HOSTNAME:
                dmatch = same_host
            else:
                rx = DOMAIN_RE if domain_nav == SAME_DOMAIN else TLD_RE
                bkey = _domain_key(bhost, rx)
                dmatch = (
                    (cand_dom == bkey).to_numpy()
                    if bkey is not None
                    else np.zeros(n, dtype=bool)
                )

            hit = eligible & dmatch
            matched_internal |= hit
            remaining &= ~matched_internal

    is_external = ~matched_internal
    ext_ok = (~is_link).to_numpy() & external_resources
    allowed = matched_internal | (is_external & ext_ok)
    allowed &= scheme_ok.to_numpy() & type_ok

    return pd.DataFrame(
        {"allowed": allowed, "is_external": is_external & allowed}, index=idx
    )
