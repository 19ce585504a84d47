"""Robots-rules kernel — north_rule addition (no reference analog: grep for
"robots" over /root/reference returns nothing; mandated by
BASELINE.json:north_star "robots.txt rules applied as a broadcast-joined
rules table").

Rules table: (host, path_prefix, allow: bool, crawl_delay: double|None).

Decision semantics (standard robots longest-match):
- candidate rules = rows for the URL's host whose path_prefix is a string
  prefix of the URL path ('' matches everything).
- the longest path_prefix wins; on a tie, allow wins.
- no matching rule (or no rules for the host) → allowed.

crawl_delay is host-level: ``max(crawl_delay)`` over the host's rules; the
engine converts it to a per-round fetch budget
``min(conns_per_server, max(1, floor(quantum / delay)))``.
"""

from __future__ import annotations

import math

import pandas as pd


def build_rule_index(rules: pd.DataFrame) -> dict:
    """host → sorted [(prefix, allow)] (longest first, allow-first on ties)."""
    index: dict[str, list[tuple[str, bool]]] = {}
    for host, prefix, allow in zip(rules["host"], rules["path_prefix"], rules["allow"]):
        index.setdefault(host, []).append((prefix or "", bool(allow)))
    for host in index:
        index[host].sort(key=lambda pa: (-len(pa[0]), not pa[1]))
    return index


def robots_allowed(hosts: pd.Series, paths: pd.Series, rule_index: dict) -> pd.Series:
    """Vectorized membership: hosts without rules short-circuit to True."""
    has_rules = hosts.isin(rule_index.keys())
    out = pd.Series(True, index=hosts.index)
    if has_rules.any():
        sub = [
            next((allow for prefix, allow in rule_index[h] if p.startswith(prefix)), True)
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
