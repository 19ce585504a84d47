"""Distributed Bloom-sidecar tests: executor-side build/update, carry-forward
links, completeness marker, rebuild-from-seen, and the guard that keeps the
seen set off the driver (VERDICT r1 item 1)."""

import os
import re

import pandas as pd
import pyspark.sql.functions as F

from webcrawl_spark.operators import bloom as B
from webcrawl_spark.plans.round import host_hash_col


def _keys_df(spark, pairs, P=8):
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["host", "url_key"]),
        schema="host string, url_key string",
    )
    return df.withColumn("host_hash", host_hash_col(P))


BITS = 1 << 12


def test_build_check_roundtrip(spark, tmp_path):
    pairs = [(f"h{i % 5}.com", f"/p{i}") for i in range(200)]
    keys = _keys_df(spark, pairs)
    d = str(tmp_path / "round-0")
    B.build_sidecar(keys, None, d, BITS)
    assert B.is_complete(d)

    # every inserted key must test maybe_seen (no false negatives)
    flagged = (
        keys.withColumnRenamed("host_hash", "__hh")
        .repartition(8, "__hh")
        .mapInPandas(
            B.make_check_stage(d, BITS),
            "host string, url_key string, __hh int, maybe_seen boolean",
        )
        .toPandas()
    )
    assert flagged["maybe_seen"].all()

    # novel keys mostly miss
    novel = _keys_df(spark, [(h, k + "-novel") for h, k in pairs])
    fp = (
        novel.withColumnRenamed("host_hash", "__hh")
        .repartition(8, "__hh")
        .mapInPandas(
            B.make_check_stage(d, BITS),
            "host string, url_key string, __hh int, maybe_seen boolean",
        )
        .toPandas()["maybe_seen"]
        .mean()
    )
    assert fp < 0.2


def test_delta_update_carries_forward_links(spark, tmp_path):
    d0 = str(tmp_path / "round-0")
    d1 = str(tmp_path / "round-1")
    base = _keys_df(spark, [("only-a.com", "/1"), ("only-a.com", "/2")])
    B.build_sidecar(base, None, d0, BITS)
    # delta touches a different partition set; base partitions carry forward
    delta = _keys_df(spark, [("other-b.net", "/x")])
    B.build_sidecar(delta, d0, d1, BITS)
    assert B.is_complete(d1)

    both = _keys_df(
        spark, [("only-a.com", "/1"), ("only-a.com", "/2"), ("other-b.net", "/x")]
    )
    flagged = (
        both.withColumnRenamed("host_hash", "__hh")
        .repartition(8, "__hh")
        .mapInPandas(
            B.make_check_stage(d1, BITS),
            "host string, url_key string, __hh int, maybe_seen boolean",
        )
        .toPandas()
    )
    assert flagged["maybe_seen"].all()


def test_gc_keeps_current_round(tmp_path):
    root = str(tmp_path)
    for k in range(4):
        os.makedirs(os.path.join(root, "bloom", f"round-{k}"))
    B.gc_sidecars(root, 2)
    left = sorted(os.listdir(os.path.join(root, "bloom")))
    assert left == ["round-2", "round-3"]


def test_no_driver_side_seen_materialization():
    """Guard: the crawl driver never pulls the seen set (or any O(corpus)
    table) onto the driver — no toPandas()/pd.read_parquet in plans/."""
    plans = os.path.join(os.path.dirname(__file__), "..", "webcrawl_spark", "plans")
    offenders = []
    for f in os.listdir(plans):
        if not f.endswith(".py"):
            continue
        src = open(os.path.join(plans, f)).read()
        for rx, label in [
            (re.compile(r"\.toPandas\(\)"), "driver toPandas"),
            (re.compile(r"pd\.read_parquet|read_parquet\("), "driver parquet read"),
        ]:
            for m in rx.finditer(src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"plans/{f}:{line} {label}")
    assert not offenders, "\n".join(offenders)
