"""Checkpointed crawl state with atomic per-round commits and resume.

Iceberg-style commit semantics over Parquet (in-sandbox stand-in; on a real
cluster the same layout maps 1:1 to Iceberg tables — append-only deltas for
``seen``/``fetch_log``, full snapshots for the mutable ``frontier`` — with
each round one multi-table transaction).

Layout under ``root``:

- ``frontier/round=k/``   full frontier snapshot entering round k
- ``seen/round=k/``       seen-set rows ADDED at round k (k=0: seeds)
- ``fetch_log/round=k/``  fetched pages ∪ error rows for round k (one
  commit; ``status`` column splits the two views)
- ``_manifests/round-k.json``  commit marker, written LAST via tmp+rename:
  a round is visible iff its manifest exists; it also carries the round's
  lineage counters (per-stage row counts) and sequence high-water marks.
  Resume = highest manifest; partially-written data from a crashed round
  is simply overwritten.

The per-path distinct-query counts (crawler-trap cap state) are DERIVED
from the seen table on read — each seen row contributes exactly one
distinct query string to its (host, path) — so they need no separate
table or write.

The reference persists only settings — a killed crawl loses its queue
(LoadSettings/SaveSettings, Backend/Crawler.cs:885-981). Our engine exceeds
it by design (north_rule resumability).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

PQ_SCHEMA = "host string, path string, n long"


@dataclass
class Manifest:
    next_round: int       # next round index to process
    next_seq: int         # next discovery sequence number
    next_fetch_seq: int   # next fetch sequence number
    frontier_rows: int    # rows in frontier/round=next_round
    done: bool = False
    counters: list = field(default_factory=list)  # (round, stage, metric, value)
    # true seen-key count (Bloom check-stage gate). None = unknown (old
    # manifests / after a requeue removal) → callers fall back to next_seq,
    # which only ever OVERSTATES (force-enqueues re-use seen keys).
    seen_rows: int = None


class CrawlState:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ---------------- paths ----------------
    def _dir(self, table: str, rnd: int) -> str:
        return os.path.join(self.root, table, f"round={rnd}")

    def _manifest_path(self, rnd: int) -> str:
        return os.path.join(self.root, "_manifests", f"round-{rnd}.json")

    # ---------------- commit ----------------
    def write_table(self, table: str, rnd: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._dir(table, rnd))

    def commit(self, manifest: Manifest) -> None:
        """Write the manifest atomically — the round's commit point."""
        path = self._manifest_path(manifest.next_round)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest.__dict__, f)
        os.replace(tmp, path)

    # ---------------- resume ----------------
    def latest_manifest(self) -> Manifest | None:
        rx = re.compile(r"round-(\d+)\.json$")
        best = None
        mdir = os.path.join(self.root, "_manifests")
        for name in os.listdir(mdir):
            m = rx.match(name)
            if m:
                k = int(m.group(1))
                if best is None or k > best:
                    best = k
        if best is None:
            return None
        with open(self._manifest_path(best)) as f:
            d = json.load(f)
        d.setdefault("counters", [])
        d.setdefault("seen_rows", None)
        return Manifest(**d)

    def manifests(self) -> list:
        out = []
        k = 0
        while os.path.exists(self._manifest_path(k)):
            with open(self._manifest_path(k)) as f:
                d = json.load(f)
            d.setdefault("counters", [])
            d.setdefault("seen_rows", None)
            out.append(Manifest(**d))
            k += 1
        return out

    # ---------------- reads ----------------
    def read_frontier(self, rnd: int) -> DataFrame:
        return self.spark.read.schema(schemas.FRONTIER).parquet(
            self._dir("frontier", rnd)
        )

    def read_table(self, table: str, rnd: int, schema) -> DataFrame:
        return self.spark.read.schema(schema).parquet(self._dir(table, rnd))

    def read_seen(self, upto_round: int) -> DataFrame:
        paths = self._paths("seen", upto_round)
        if not paths:
            return self.spark.createDataFrame([], schemas.SEEN)
        return self.spark.read.schema(schemas.SEEN).parquet(*paths)

    def read_pq(self, upto_round: int) -> DataFrame:
        """(host, path) → distinct-query counts, derived from seen."""
        return (
            self.read_seen(upto_round)
            .groupBy("host", "path")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def read_fetch_log(self, upto_round: int) -> DataFrame:
        paths = self._paths("fetch_log", upto_round)
        if not paths:
            return self.spark.createDataFrame([], schemas.FETCH_LOG)
        return self.spark.read.schema(schemas.FETCH_LOG).parquet(*paths)

    def _paths(self, table: str, upto_round: int) -> list[str]:
        return [
            self._dir(table, k)
            for k in range(upto_round + 1)
            if os.path.exists(self._dir(table, k))
        ]
