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


def test_wet_record_headers_and_roundtrip_unit():
    """WET conversion records: the extra headers serialize into the head
    block and the generic parser reads the record back intact."""
    recs = [
        ("conversion", "http://a.example/x", "2026-01-02T03:04:05Z",
         "extracted tëxt".encode("utf-8"),
         [("WARC-Refers-To", "<urn:md5:abc>"),
          ("Content-Type", "text/plain")]),
    ]
    blob = W.build_warc_file(recs, warcinfo=None)
    raw = gzip.decompress(blob)
    head = raw.split(b"\r\n\r\n", 1)[0]
    assert b"WARC-Type: conversion" in head
    assert b"WARC-Refers-To: <urn:md5:abc>" in head
    assert b"Content-Type: text/plain" in head
    got = list(W.parse_warc_stream(blob))
    assert len(got) == 1
    t, u, ts, c, p = got[0]
    assert (t, u, ts, p) == ("conversion", recs[0][1], recs[0][2], recs[0][3])
    assert c == len(recs[0][3])


def test_wet_blobs_distributed_roundtrip(spark):
    """wet_file_blobs -> records_from_blobs is identity on every page's
    extracted text, and every conversion record carries the WET headers."""
    import hashlib

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id < 80 and text is not null")
        .select(
            F.concat(F.lit("http://w.example/d/"), "doc_id").alias("url"),
            F.lit("2026-01-02T03:04:05Z").alias("ts"),
            "text",
        )
    )
    blobs = W.wet_file_blobs(docs, n_files=3)
    recs = W.records_from_blobs(blobs, "file_id", "content")
    conv = recs.filter("record_type = 'conversion'")
    got = {(r.url, r.warc_ts, bytes(r.payload)) for r in conv.collect()}
    want = {
        (r.url, "2026-01-02T03:04:05Z", r.text.encode("utf-8"))
        for r in docs.collect()
    }
    assert got == want
    # headers: spot-check the raw bytes of one file blob
    one = bytes(blobs.limit(1).collect()[0].content)
    raw = gzip.decompress(one)
    assert b"WARC-Type: conversion" in raw
    assert b"Content-Type: text/plain" in raw
    # refers-to is the md5 urn of the record's own target uri: every url
    # present in this blob must be accompanied by its urn
    blob_urls = [
        u for u, _, _ in want
        if (b"WARC-Target-URI: " + u.encode() + b"\r\n") in raw
    ]
    assert blob_urls
    for u in blob_urls:
        assert (
            f"<urn:md5:{hashlib.md5(u.encode()).hexdigest()}>".encode() in raw
        )


def test_wat_blobs_json_envelope_roundtrip(spark):
    """wat_file_blobs -> records_from_blobs: every metadata record's JSON
    envelope carries the page's identity, title, and link list in order,
    with deterministic serialization (sorted keys, no whitespace)."""
    import json

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id < 40 and text is not null")
        .select(
            F.concat(F.lit("http://w.example/d/"), "doc_id").alias("url"),
            F.lit("2026-01-02T03:04:05Z").alias("ts"),
            F.concat(F.lit("t"), "doc_id").alias("title"),
            F.length("text").cast("long").alias("content_length"),
            F.array(
                F.concat(F.lit("http://l.example/a/"), "doc_id"),
                F.concat(F.lit("http://l.example/b/"), "doc_id"),
            ).alias("links"),
        )
    )
    blobs = W.wat_file_blobs(docs, n_files=3)
    recs = W.records_from_blobs(blobs, "file_id", "content")
    meta = recs.filter("record_type = 'metadata'")
    got = {}
    for r in meta.collect():
        env = json.loads(bytes(r.payload).decode("utf-8"))["Envelope"]
        hm, pm = env["WARC-Header-Metadata"], env["Payload-Metadata"]
        html = pm["HTTP-Response-Metadata"]["HTML-Metadata"]
        assert hm["WARC-Type"] == "response"
        assert hm["WARC-Target-URI"] == r.url  # record header == envelope
        got[r.url] = (
            hm["WARC-Date"], html["Head"]["Title"],
            pm["Actual-Content-Length"],
            tuple(l["url"] for l in html["Links"]),
            tuple(l["path"] for l in html["Links"]),
        )
    want = {
        r.url: (
            "2026-01-02T03:04:05Z", r.title, r.content_length,
            tuple(r.links), ("A@/href",) * len(r.links),
        )
        for r in docs.collect()
    }
    assert got == want
    # serialization determinism: payload bytes are the canonical dump
    one = meta.limit(1).collect()[0]
    env = json.loads(bytes(one.payload).decode("utf-8"))
    assert bytes(one.payload) == json.dumps(
        env, separators=(",", ":"), sort_keys=True
    ).encode("utf-8")
    # file-level headers
    raw = gzip.decompress(bytes(blobs.limit(1).collect()[0].content))
    assert b"WARC-Type: metadata" in raw
    assert b"Content-Type: application/json" in raw


def test_revisit_blobs_headers_and_classification(spark):
    """revisit_file_blobs: unchanged url → payload-free revisit record
    whose HEADER BLOCK carries the identical-payload-digest profile, the
    urn:md5 payload digest, and the refers-to pointers (fields the
    generic parser does not surface — verified here on the raw bytes);
    changed and first-seen urls → full response records."""
    rows = [
        # (url, ts, payload, prev_digest, prev_ts)
        ("http://r.test/same", "2026-08-01T00:00:00Z", b"stable body",
         __import__("hashlib").md5(b"stable body").hexdigest(),
         "2026-07-01T00:00:00Z"),
        ("http://r.test/changed", "2026-08-01T00:00:00Z", b"new body",
         __import__("hashlib").md5(b"old body").hexdigest(),
         "2026-07-01T00:00:00Z"),
        ("http://r.test/fresh", "2026-08-01T00:00:00Z", b"first visit",
         None, None),
    ]
    docs = spark.createDataFrame(
        rows,
        "url string, ts string, payload binary, prev_digest string,"
        " prev_ts string",
    )
    blobs = {r.file_id: bytes(r.content)
             for r in W.revisit_file_blobs(docs, n_files=1).collect()}
    raw = gzip.decompress(b"".join(blobs.values()))
    recs = list(W.parse_warc_stream(raw))
    by_url = {u: (t, clen, p) for t, u, ts, clen, p in recs if u}
    assert by_url["http://r.test/same"][0] == "revisit"
    assert by_url["http://r.test/same"][1] == 0
    assert by_url["http://r.test/changed"] == ("response", 8, b"new body")
    assert by_url["http://r.test/fresh"] == ("response", 11, b"first visit")

    # the revisit record's raw header block
    head = raw.split(b"WARC-Type: revisit", 1)[1].split(b"\r\n\r\n", 1)[0]
    dig = __import__("hashlib").md5(b"stable body").hexdigest()
    assert b"WARC-Profile: " + W.REVISIT_PROFILE.encode() in head
    assert f"WARC-Payload-Digest: urn:md5:{dig}".encode() in head
    assert b"WARC-Refers-To-Target-URI: http://r.test/same" in head
    assert b"WARC-Refers-To-Date: 2026-07-01T00:00:00Z" in head
