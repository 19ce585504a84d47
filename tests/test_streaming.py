"""Structured Streaming ≡ batch equivalence (watermarked windows + custom
stateful operator)."""

import time

from pyspark.sql import functions as F

from webcrawl_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"


def _drain(q, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        q.processAllAvailable()
        if not q.status["isDataAvailable"]:
            break
        time.sleep(0.2)
    q.stop()


def test_stream_tumbling_equals_batch(spark):
    q = SE.stream_tumbling_counts(spark, SF, "tumbling_t")
    _drain(q)
    got = {
        (r["hour_bucket"], r["event_type"]): r["n"]
        for r in spark.sql("select * from tumbling_t").collect()
    }
    want = {
        (r["hb"], r["event_type"]): r["n"]
        for r in (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy(
                F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH").alias("hb"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want and len(got) > 0


def test_stream_stateful_counts(spark):
    q = SE.stream_session_counts(spark, SF, "sessions_t")
    _drain(q)
    # update-mode memory sink keeps every update; the MAX per user is the
    # final accumulated count
    got = {
        r["user_id"]: r["mx"]
        for r in spark.sql(
            "select user_id, max(n_events) as mx from sessions_t group by user_id"
        ).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want and len(got) > 0
