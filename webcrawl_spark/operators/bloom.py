"""Bloom-filter sidecar for the URL-seen set (north_rule: "partitioned
Bloom/cuckoo-filter URL-seen set sharded by host-hash").

One bitset per host-hash partition, updated incrementally from each round's
seen delta and broadcast to executors. Candidates that miss the filter are
DEFINITELY new (a Bloom filter has no false negatives) and skip the exact
anti-join entirely; only possible-seen candidates enter the shuffle — at
10^10-URL scale the anti-join's shuffle volume drops to the rediscovery
rate (typically a few % of extracted links) plus the false-positive rate.

All hashing and bit manipulation is VECTORIZED: two independent 64-bit
hashes per key come from ``pd.util.hash_pandas_object`` with two fixed
16-byte keys (siphash, C-level, deterministic across processes — Python's
salted ``hash()`` would not be), and bit set/test use numpy scatter/gather.
No per-row Python anywhere (BASELINE.json:input_hint).

In-sandbox the bitsets live in driver memory and persist per round as a
compressed .npz next to the manifests (resume restores them; if absent they
are rebuilt from the seen table). On a cluster the same bitsets shard as
per-partition sidecar files maintained by the executors that own each
host-hash partition and merged into the broadcast at round start.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

K_PROBES = 4
DEFAULT_BITS = 1 << 17

_HK1 = "wcspark-bloom-k1"  # 16 bytes each — fixed => deterministic
_HK2 = "wcspark-bloom-k2"


def _hashes(hosts: pd.Series, url_keys: pd.Series):
    """(h1, h2) uint64 arrays for key = host + NUL + url_key, vectorized."""
    keys = hosts.astype(str) + "\0" + url_keys.astype(str)
    h1 = pd.util.hash_pandas_object(keys, index=False, hash_key=_HK1).to_numpy()
    h2 = pd.util.hash_pandas_object(keys, index=False, hash_key=_HK2).to_numpy()
    return h1, h2 | np.uint64(1)


class SeenBloom:
    """Partitioned bitset; partition = h1 % n_partitions."""

    def __init__(self, n_partitions: int, bits: int = DEFAULT_BITS):
        self.n = n_partitions
        self.m = bits
        self.parts = {
            p: np.zeros(bits // 8, dtype=np.uint8) for p in range(n_partitions)
        }

    # ------------------------------------------------------------------
    def add_frame(self, pdf: pd.DataFrame) -> None:
        """Add (host, url_key) rows, vectorized."""
        if len(pdf) == 0:
            return
        h1, h2 = _hashes(pdf["host"], pdf["url_key"])
        pids = (h1 % np.uint64(self.n)).astype(np.int64)
        m = np.uint64(self.m)
        for p in np.unique(pids):
            mask = pids == p
            arr = self.parts[int(p)]
            for i in range(K_PROBES):
                b = ((h1[mask] + np.uint64(i) * h2[mask]) % m).astype(np.int64)
                np.bitwise_or.at(arr, b >> 3, (1 << (b & 7)).astype(np.uint8))

    # ------------------------------------------------------------------
    def snapshot(self) -> dict:
        """Picklable payload for a Spark broadcast."""
        return {"m": self.m, "n": self.n,
                "parts": {p: a.tobytes() for p, a in self.parts.items()}}

    @staticmethod
    def contains_batch(snapshot: dict, hosts: pd.Series,
                       url_keys: pd.Series) -> pd.Series:
        """Vectorized membership test against a snapshot."""
        if len(hosts) == 0:
            return pd.Series([], dtype=bool, index=hosts.index)
        m = np.uint64(snapshot["m"])
        n = np.uint64(snapshot["n"])
        views = {
            p: np.frombuffer(b, dtype=np.uint8)
            for p, b in snapshot["parts"].items()
        }
        h1, h2 = _hashes(hosts, url_keys)
        pids = (h1 % n).astype(np.int64)
        out = np.ones(len(hosts), dtype=bool)
        for p in np.unique(pids):
            mask = pids == p
            arr = views[int(p)]
            hit = np.ones(int(mask.sum()), dtype=bool)
            for i in range(K_PROBES):
                b = ((h1[mask] + np.uint64(i) * h2[mask]) % m).astype(np.int64)
                hit &= (arr[b >> 3] >> (b & 7) & 1).astype(bool)
            out[mask] = hit
        return pd.Series(out, index=hosts.index)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez_compressed(
            path, m=self.m, n=self.n,
            **{f"p{p}": a for p, a in self.parts.items()},
        )

    @classmethod
    def load(cls, path: str) -> "SeenBloom":
        z = np.load(path)
        bl = cls(int(z["n"]), int(z["m"]))
        for p in range(bl.n):
            bl.parts[p] = z[f"p{p}"].copy()
        return bl


def bloom_path(state_root: str, rnd: int) -> str:
    d = os.path.join(state_root, "bloom")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"round-{rnd}.npz")
