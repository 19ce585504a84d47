"""Robots-rules kernel — north_rule addition (no reference analog: grep for
"robots" over /root/reference returns nothing; mandated by
BASELINE.json:north_star "robots.txt rules applied as a broadcast-joined
rules table").

Rules table: (host, path_prefix, allow: bool, crawl_delay: double|None).

Decision semantics (RFC 9309 longest-match):
- candidate rules = rows for the URL's host whose pattern matches the URL
  path from its start ('' matches everything). Patterns support the RFC
  9309 §2.2.3 special characters: ``*`` matches any character sequence
  (including empty) and a TRAILING ``$`` anchors the end of the path; a
  pattern without them is a plain string prefix (the fast path).
- the longest pattern (raw octets, ``*``/``$`` counted — the RFC's
  specificity rule) wins; on a tie, allow wins.
- no matching rule (or no rules for the host) → allowed.

crawl_delay is host-level: ``max(crawl_delay)`` over the host's rules; the
engine converts it to a per-round fetch budget
``min(conns_per_server, max(1, floor(quantum / delay)))``.
"""

from __future__ import annotations

import math
import re

import pandas as pd


def _compile_pattern(pattern: str):
    """RFC 9309 §2.2.3 matcher for one rule pattern.

    Returns ``None`` for a plain prefix (no ``*``, no trailing ``$``) —
    the caller keeps ``str.startswith`` as the fast path — else a
    compiled-regex ``match`` callable: every literal escaped, ``*`` →
    ``.*``, a trailing ``$`` anchors end-of-path (a ``$`` anywhere else
    is a literal, the reference-parser behavior)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    if "*" not in body and not anchored:
        return None
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    if anchored:
        rx += "$"
    return re.compile(rx).match


def build_rule_index(rules: pd.DataFrame) -> dict:
    """host → sorted [(pattern, allow, matcher)] (longest raw pattern
    first, allow-first on ties; matcher None = plain-prefix fast path)."""
    index: dict[str, list[tuple[str, bool, object]]] = {}
    for host, prefix, allow in zip(rules["host"], rules["path_prefix"], rules["allow"]):
        pat = prefix or ""
        index.setdefault(host, []).append(
            (pat, bool(allow), _compile_pattern(pat))
        )
    for host in index:
        index[host].sort(key=lambda pa: (-len(pa[0]), not pa[1]))
    return index


def _first_verdict(entries, path: str) -> bool:
    for pat, allow, matcher in entries:
        if matcher(path) if matcher is not None else path.startswith(pat):
            return allow
    return True


def robots_allowed(hosts: pd.Series, paths: pd.Series, rule_index: dict) -> pd.Series:
    """Vectorized membership: hosts without rules short-circuit to True."""
    has_rules = hosts.isin(rule_index.keys())
    out = pd.Series(True, index=hosts.index)
    if has_rules.any():
        sub = [
            _first_verdict(rule_index[h], p)
            for h, p in zip(hosts[has_rules], paths[has_rules])
        ]
        out[has_rules] = sub
    return out


def crawl_delays(rules: pd.DataFrame) -> dict[str, float]:
    """host → max crawl_delay (seconds) over its rules."""
    if "crawl_delay" not in rules.columns or rules.empty:
        return {}
    g = rules.dropna(subset=["crawl_delay"]).groupby("host")["crawl_delay"].max()
    return g.to_dict()


def host_budget(base_budget: int, delay: float | None, quantum_s: float) -> int:
    """Per-round fetch budget for a host under a crawl_delay."""
    if delay is None or delay <= 0:
        return base_budget
    return min(base_budget, max(1, math.floor(quantum_s / delay)))
