"""WARC source/sink: serialization round trips, the distributed
writer/reader pair, and crawl parity of WARC-ingested pages vs the same
pages served from parquet."""

import gzip

from pyspark.sql import functions as F

from webcrawl_spark.sources import warc as W
from webcrawl_spark.sources import synth_web as SW

SF = "/root/testdata/sf0.001"


def test_record_roundtrip_unit():
    recs = [
        ("response", "http://a.example/x", "2026-01-02T03:04:05Z",
         "héllo wörld".encode("utf-8")),
        ("response", "http://b.example/empty", "2026-01-02T03:04:06Z", b""),
        ("response", "http://a.example/bin", None, bytes(range(256))),
    ]
    blob = W.build_warc_file(recs, warcinfo="test writer")
    got = list(W.parse_warc_stream(blob))
    assert got[0][0] == "warcinfo" and got[0][4] == b"test writer"
    assert [(t, u, ts, p) for t, u, ts, _c, p in got[1:]] == recs
    assert all(c == len(p) for _t, _u, _ts, c, p in got)


def test_one_gzip_member_per_record():
    """Common Crawl layout: every record its own member (random access),
    and the whole blob still parses as one stream. Plain (uncompressed)
    input parses too."""
    recs = [("response", f"http://h.example/{i}", None, b"x" * i)
            for i in range(5)]
    blob = W.build_warc_file(recs, warcinfo=None)
    assert blob.count(b"\x1f\x8b\x08") == len(recs)
    assert len(list(W.parse_warc_stream(blob))) == len(recs)
    assert len(list(W.parse_warc_stream(gzip.decompress(blob)))) == len(recs)


def test_truncated_payload_raises():
    blob = W.build_warc_file(
        [("response", "http://a.example/x", None, b"0123456789")],
        warcinfo=None,
    )
    import pytest
    with pytest.raises(ValueError):
        list(W.parse_warc_stream(gzip.decompress(blob)[:-14]))


def test_write_read_distributed(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id < 100 and text is not null")
        .select(
            F.concat(F.lit("http://w.example/d/"), "doc_id").alias("url"),
            F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
            F.encode("text", "UTF-8").alias("html"),
        )
    )
    out = str(tmp_path / "warcs")
    manifest = W.write_warc(docs, out, n_files=3).collect()
    assert len(manifest) == 3
    assert sum(m.n_records for m in manifest) == docs.count()

    back = W.read_warc_records(spark, out)
    # every file leads with its warcinfo record
    assert back.filter("record_type = 'warcinfo'").count() == 3
    got = {
        (r.url, r.warc_ts, bytes(r.payload))
        for r in back.filter("record_type = 'response'").collect()
    }
    want = {
        (r.url, "2026-01-02T03:04:05Z", bytes(r.html))
        for r in docs.collect()
    }
    assert got == want


def test_warc_pages_crawl_parity(spark, tmp_path):
    """pages → WARC → pages → crawl must equal the crawl over the
    original pages: the ingestion edge is transparent to the engine."""
    import tempfile
    from webcrawl_spark.plans.crawl import SparkCrawler

    pages = SW.synth_pages(spark, SF, n_docs=60)
    out = str(tmp_path / "warcs")
    W.write_warc(pages, out, n_files=4).collect()

    ingested = W.warc_to_pages(W.read_warc_records(spark, out))
    # byte-identity of the ingested table (text is the UTF-8 decode of
    # html by construction in synth_pages; lang is NULL at ingest)
    orig = {
        (r.url, r.warc_ts, bytes(r.html), r.text)
        for r in pages.collect()
    }
    got = {
        (r.url, r.warc_ts, bytes(r.html), r.text)
        for r in ingested.collect()
    }
    assert got == orig

    def trace_of(pages_df):
        c = SparkCrawler(
            spark, pages_df, SW.seed_urls(),
            tempfile.mkdtemp(prefix="wc_warc_"),
            SW.crawl_config(num_partitions=4),
        )
        c.run(max_rounds=2)
        return [tuple(r) for r in c.trace().collect()]

    assert trace_of(ingested) == trace_of(pages)
