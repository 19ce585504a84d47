"""Checkpointed crawl state with atomic per-round commits and resume.

Iceberg-style commit semantics over Parquet (in-sandbox stand-in; on a real
cluster the same layout maps 1:1 to Iceberg tables — append-only deltas for
``seen``/``pq``/``fetched``/``errors``/``counters``, full snapshots for the
mutable ``frontier`` — with each round one multi-table transaction).

Layout under ``root``:

- ``frontier/round=k/``  full frontier snapshot entering round k
- ``seen/round=k/``      seen-set rows ADDED at round k (k=0: seeds)
- ``pq/round=k/``        (host, path, n) distinct-query-count deltas
- ``fetched/round=k/``   pages fetched during round k
- ``errors/round=k/``    error rows from round k
- ``counters/round=k/``  per-stage lineage row counts
- ``_manifests/round-k.json``  commit marker, written LAST via tmp+rename:
  a round is visible iff its manifest exists. Resume = highest manifest;
  partially-written data from a crashed round is simply overwritten.

The reference persists only settings — a killed crawl loses its queue
(LoadSettings/SaveSettings, Backend/Crawler.cs:885-981). Our engine exceeds
it by design (north_rule resumability).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

_TABLES = ("frontier", "seen", "pq", "fetched", "errors", "counters")
_DELTA_TABLES = ("seen", "pq", "fetched", "errors", "counters")

PQ_SCHEMA = "host string, path string, n long"


@dataclass
class Manifest:
    next_round: int       # next round index to process
    next_seq: int         # next discovery sequence number
    next_fetch_seq: int   # next fetch sequence number
    frontier_rows: int    # rows in frontier/round=next_round
    done: bool = False


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
            return Manifest(**json.load(f))

    # ---------------- reads ----------------
    def read_frontier(self, rnd: int) -> DataFrame:
        return self.spark.read.schema(schemas.FRONTIER).parquet(
            self._dir("frontier", rnd)
        )

    def read_seen(self, upto_round: int) -> DataFrame:
        paths = self._paths("seen", upto_round)
        if not paths:
            return self.spark.createDataFrame([], schemas.SEEN)
        return self.spark.read.schema(schemas.SEEN).parquet(*paths)

    def read_pq(self, upto_round: int) -> DataFrame:
        """Aggregated (host, path) → distinct-query counts up to a round."""
        paths = self._paths("pq", upto_round)
        if not paths:
            return self.spark.createDataFrame([], PQ_SCHEMA)
        return (
            self.spark.read.schema(PQ_SCHEMA).parquet(*paths)
            .groupBy("host", "path")
            .agg(F.sum("n").alias("n"))
        )

    def read_all(self, table: str, upto_round: int, schema) -> DataFrame:
        paths = self._paths(table, upto_round)
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def _paths(self, table: str, upto_round: int) -> list[str]:
        return [
            self._dir(table, k)
            for k in range(upto_round + 1)
            if os.path.exists(self._dir(table, k))
        ]
