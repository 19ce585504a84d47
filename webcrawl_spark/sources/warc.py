"""WARC source/sink: the ingestion edge between web archives and the
engine's ``pages`` table.

The reference fetches live HTTP one URL at a time
(Backend/Crawler.cs:1919-2056, ``System.Net.WebRequest``). At 100-TB
scale the web does not arrive as sockets — it arrives as WARC archives
(ISO 28500), the format Common Crawl publishes: ~1 GB ``.warc.gz`` files,
each a concatenation of per-record gzip members so readers can seek to a
record offset without decompressing the prefix. This module ADAPTs the
reference's fetch edge to that reality: parse WARC files into the pages
shape mandated by BASELINE.json:input_hint (``url, warc_ts, html, text,
lang``), and write pages back out as WARC for interchange.

Scale design
------------
- **File-level parallelism.** A ``.warc.gz`` file is not splittable
  mid-stream (gzip members carry no sync markers Spark can find), so the
  unit of parallelism is the file — exactly how Common Crawl is consumed
  in practice (a crawl snapshot is ~64k files ≈ 64k tasks). The reader is
  ``binaryFile`` scan → Arrow-batched ``mapInPandas`` record parse; one
  task per file, no shuffle.
- **Whole-file memory.** ``binaryFile`` materializes each file in one row
  (~1 GB at CC sizing) — the parse is a single sequential pass and emits
  bounded record batches, so peak memory is file size + one batch. A
  deployment that cannot afford that swaps the scan for a streaming
  custom data source; the record parser below is already incremental
  (header → Content-Length → payload) and reusable as-is.
- **Writer layout.** One file per deterministic group
  (``pmod(xxhash64(url), n_files)``), records sorted by url within the
  file, every record its own gzip member with ``mtime=0`` — byte-stable
  output for identical input, random-access-friendly like CC's own
  layout.

Everything is stdlib (``gzip``) + pandas; no codec or third-party WARC
library.
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_VERSION = "WARC/1.0"
_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

# ---------------------------------------------------------------------------
# record / file serialization (pure functions, driver- and executor-safe)
# ---------------------------------------------------------------------------


def build_record(
    record_type: str,
    payload: bytes,
    url: Optional[str] = None,
    ts: Optional[str] = None,
    extra_headers: Optional[List[Tuple[str, str]]] = None,
) -> bytes:
    """Serialize ONE uncompressed WARC/1.0 record.

    Header block, blank line, payload, and the two-CRLF record separator
    mandated by ISO 28500 §4. ``Content-Length`` counts payload octets
    only. Header order is fixed so output is byte-deterministic."""
    lines = [WARC_VERSION.encode("ascii")]
    lines.append(b"WARC-Type: " + record_type.encode("ascii"))
    if url is not None:
        lines.append(b"WARC-Target-URI: " + url.encode("utf-8"))
    if ts is not None:
        lines.append(b"WARC-Date: " + ts.encode("ascii"))
    for k, v in extra_headers or []:
        lines.append(k.encode("ascii") + b": " + v.encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    head = _CRLF.join(lines) + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def build_warc_file(
    records: List[Tuple[str, Optional[str], Optional[str], bytes]],
    warcinfo: Optional[str] = "webcrawl_spark warc writer",
) -> bytes:
    """Serialize a full ``.warc.gz`` file: optional leading ``warcinfo``
    record, then one gzip MEMBER PER RECORD (Common Crawl's layout — a
    reader with a byte offset can decompress one record without touching
    the rest; ``gzip.decompress`` on the whole blob transparently reads
    the concatenation). ``records`` rows are ``(record_type, url, ts,
    payload)`` or ``(record_type, url, ts, payload, extra_headers)`` —
    the optional 5th element feeds :func:`build_record`'s per-record
    headers (WET conversion records carry ``WARC-Refers-To`` /
    ``Content-Type`` this way). ``mtime=0`` keeps output
    byte-deterministic."""
    out = []
    if warcinfo is not None:
        out.append(
            gzip.compress(
                build_record("warcinfo", warcinfo.encode("utf-8")), mtime=0
            )
        )
    for rec in records:
        record_type, url, ts, payload = rec[0], rec[1], rec[2], rec[3]
        extra = rec[4] if len(rec) > 4 else None
        out.append(
            gzip.compress(
                build_record(record_type, payload, url, ts, extra), mtime=0
            )
        )
    return b"".join(out)


def parse_warc_stream(
    blob: bytes,
) -> Iterator[Tuple[str, Optional[str], Optional[str], int, bytes]]:
    """Yield ``(record_type, url, ts, content_length, payload)`` from a
    WARC blob — gzipped (single- or multi-member) or plain.

    One sequential pass: header block up to the blank line, then exactly
    ``Content-Length`` payload octets, then the record separator. Raises
    ``ValueError`` on a malformed header or a short payload — a truncated
    archive should fail the task loudly, not silently drop records."""
    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)
    pos, n = 0, len(blob)
    while pos < n:
        # tolerate stray separator bytes between records
        while pos < n and blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC: unterminated header block")
        head = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {lines[0]!r}")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError("WARC: record missing Content-Length")
        clen = int(headers["content-length"])
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("WARC: truncated payload")
        payload = blob[body_start : body_start + clen]
        yield (
            headers.get("warc-type", ""),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            clen,
            payload,
        )
        pos = body_start + clen


# ---------------------------------------------------------------------------
# distributed writer
# ---------------------------------------------------------------------------

WRITE_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def write_warc(
    docs: DataFrame,
    out_dir: str,
    n_files: int = 16,
    url_col: str = "url",
    ts_col: Optional[str] = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Write ``docs`` as ``n_files`` WARC files under ``out_dir`` —
    ``part-NNNNN.warc.gz``, one gzip member per record, records sorted by
    url inside each file. Returns the write manifest (one row per file);
    the caller triggers it with an action.

    One ``applyInPandas`` task per file: the exchange key is the uniform
    ``pmod(xxhash64(url), n_files)``, so file sizes are balanced
    regardless of host skew. Files land via write-then-rename so a killed
    task never leaves a half-written ``.warc.gz`` visible. Rows with a
    NULL payload (retryable fetch failures in the pages shape) are
    skipped — WARC has no "absent response" record."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col(url_col).alias("url"), F.col(payload_col).alias("payload")]
    if ts_col is not None:
        cols.append(
            F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts")
        )
    else:
        cols.append(F.lit(None).cast("string").alias("ts"))
    d = (
        docs.select(*cols)
        .filter(F.col("payload").isNotNull())
        .withColumn("file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)))
    )

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        records = [
            ("response", u, (None if ts is None or pd.isna(ts) else str(ts)),
             bytes(p))
            for u, ts, p in zip(pdf["url"], pdf["ts"], pdf["payload"])
        ]
        blob = build_warc_file(records)
        name = f"part-{fid:05d}.warc.gz"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame(
            {
                "warc_file": [name],
                "n_records": [len(records)],
                "n_bytes": [len(blob)],
            }
        )

    return d.groupBy("file_id").applyInPandas(
        _write_group, WRITE_MANIFEST_SCHEMA
    )


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_type", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_PARSE_BATCH = 256  # records per emitted Arrow batch (bounds parse memory)


def records_from_blobs(
    blobs: DataFrame, file_col: str = "path", blob_col: str = "content"
) -> DataFrame:
    """Parse a DataFrame of ``(file, blob)`` rows into WARC records —
    the shared stage behind :func:`read_warc_records` (blobs from a
    ``binaryFile`` scan) and the in-DataFrame round-trip battery query
    (blobs built by :func:`write_warc`'s group serializer). Emits bounded
    batches so a 1 GB file never becomes one Arrow allocation."""
    src = blobs.select(
        F.col(file_col).cast("string").alias("warc_file"),
        F.col(blob_col).alias("blob"),
    )

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(rows):
            return pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_type", "url", "warc_ts",
                    "content_length", "payload",
                ],
            )

        for pdf in it:
            rows = []
            for fname, blob in zip(pdf["warc_file"], pdf["blob"]):
                for rtype, url, ts, clen, payload in parse_warc_stream(
                    bytes(blob)
                ):
                    rows.append((fname, rtype, url, ts, clen, payload))
                    if len(rows) >= _PARSE_BATCH:
                        yield flush(rows)
                        rows = []
            if rows:
                yield flush(rows)

    return src.mapInPandas(_parse, RECORD_SCHEMA)


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (dir or glob of ``.warc[.gz]`` files) into one row
    per WARC record. One task per file — see the module docstring for why
    that is the right parallelism unit for this format."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    return records_from_blobs(blobs, "path", "content")


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Response records → the engine's pages shape (input_hint: ``url,
    warc_ts, html, text, lang``): ``html`` is the raw payload, ``text``
    its UTF-8 decode (the charset-sniffing decode kernel reads the raw
    bytes again downstream — kernels/textdec.py), ``lang`` unknown at
    ingest (NULL; the lang-ID stage fills it). Feed the result straight
    to ``SparkCrawler`` — crawl parity vs an equivalent parquet pages
    table is asserted in tests/test_warc.py."""
    return records.filter(F.col("record_type") == "response").select(
        F.col("url"),
        F.to_timestamp(
            F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


# ---------------------------------------------------------------------------
# in-DataFrame file builder (round-trip battery support)
# ---------------------------------------------------------------------------

FILE_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def warc_file_blobs(docs: DataFrame, n_files: int = 16) -> DataFrame:
    """Group ``(url, ts, payload)`` rows into ``n_files`` in-memory WARC
    file blobs — :func:`write_warc` without the filesystem side effect,
    so the writer+parser round trip can run as one declarative plan (the
    ``warc_roundtrip`` battery query) and be hash-checked against a
    DuckDB oracle that never sees WARC at all."""
    d = docs.withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("int")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        records = [
            ("response", u, (None if ts is None or pd.isna(ts) else str(ts)),
             bytes(p))
            for u, ts, p in zip(pdf["url"], pdf["ts"], pdf["payload"])
        ]
        return pd.DataFrame(
            {"file_id": [fid], "content": [build_warc_file(records)]}
        )

    return d.groupBy("file_id").applyInPandas(_build, FILE_BLOB_SCHEMA)


def wat_file_blobs(docs: DataFrame, n_files: int = 16) -> DataFrame:
    """WAT sibling of :func:`warc_file_blobs`: group ``(url, ts, title,
    links, content_length)`` rows into ``n_files`` in-memory
    ``.warc.wat.gz`` file blobs — Common Crawl's METADATA layer, one
    ``metadata`` record per page whose payload is the WAT JSON envelope
    (``Envelope.WARC-Header-Metadata`` identifying the source response +
    ``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata``
    carrying the page's ``Head.Title`` and extracted ``Links`` list in
    document order). With :func:`warc_file_blobs` (responses),
    :func:`wet_file_blobs` (conversions) and ``kernels/surt.cdx_index``,
    this completes the four-format Common Crawl interchange family.

    Determinism: the JSON serializes with sorted keys and no whitespace,
    records carry ``WARC-Refers-To`` (urn:md5 of the source URL — a
    deployment threads the response record's real ID) and ``Content-Type:
    application/json``, and the file layout is the shared one (leading
    warcinfo, one gzip member per record, mtime=0), so output is
    byte-stable and the generic record parser reads it back unchanged.

    100-TB shape: identical to the WARC/WET writers — one task per output
    file, Arrow-batched; the upstream ``links`` column comes from the
    reference link-extraction kernel (kernels/links.py), so the metadata
    layer reports exactly what the crawler itself scans."""
    import hashlib
    import json as _json

    d = docs.withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("int")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        records = []
        for u, ts, title, links, clen in zip(
            pdf["url"], pdf["ts"], pdf["title"], pdf["links"],
            pdf["content_length"],
        ):
            env = {
                "Envelope": {
                    "Format": "WARC",
                    "WARC-Header-Metadata": {
                        "WARC-Type": "response",
                        "WARC-Target-URI": str(u),
                        "WARC-Date": (
                            None if ts is None or pd.isna(ts) else str(ts)
                        ),
                    },
                    "Payload-Metadata": {
                        "Actual-Content-Length": int(clen),
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Head": {
                                    "Title": (
                                        None
                                        if title is None or pd.isna(title)
                                        else str(title)
                                    )
                                },
                                "Links": [
                                    {"path": "A@/href", "url": str(h)}
                                    for h in (
                                        [] if links is None else list(links)
                                    )
                                ],
                            }
                        },
                    },
                }
            }
            payload = _json.dumps(
                env, separators=(",", ":"), sort_keys=True
            ).encode("utf-8")
            records.append(
                (
                    "metadata", str(u),
                    (None if ts is None or pd.isna(ts) else str(ts)),
                    payload,
                    [
                        ("WARC-Refers-To",
                         f"<urn:md5:{hashlib.md5(str(u).encode()).hexdigest()}>"),
                        ("Content-Type", "application/json"),
                    ],
                )
            )
        return pd.DataFrame(
            {
                "file_id": [fid],
                "content": [
                    build_warc_file(records, warcinfo="webcrawl_spark wat writer")
                ],
            }
        )

    return d.groupBy("file_id").applyInPandas(_build, FILE_BLOB_SCHEMA)


def wet_file_blobs(docs: DataFrame, n_files: int = 16) -> DataFrame:
    """WET sibling of :func:`warc_file_blobs`: group ``(url, ts, text)``
    rows into ``n_files`` in-memory ``.warc.wet.gz`` file blobs — Common
    Crawl's extracted-text layer, one ``conversion`` record per page whose
    payload is the UTF-8 extracted text, with the ``WARC-Refers-To``
    (deterministic ``urn:md5`` of the source URL — a deployment threads
    the response record's real ID) and ``Content-Type: text/plain``
    headers the format mandates. Same Common-Crawl file layout as the
    WARC writer (leading warcinfo, one gzip member per record, mtime=0
    byte-determinism), so WET files are random-access like CC's own and
    the generic record parser reads them back unchanged.

    100-TB shape: identical to the WARC writer — one task per output
    file, Arrow-batched; the upstream extracted-text column comes from
    the crawl's decode kernel (kernels/textdec.py), proven byte-identical
    to the reference parser by the crawl goldens."""
    import hashlib

    d = docs.withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("int")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        records = [
            (
                "conversion", u,
                (None if ts is None or pd.isna(ts) else str(ts)),
                str(t).encode("utf-8"),
                [
                    ("WARC-Refers-To",
                     f"<urn:md5:{hashlib.md5(str(u).encode()).hexdigest()}>"),
                    ("Content-Type", "text/plain"),
                ],
            )
            for u, ts, t in zip(pdf["url"], pdf["ts"], pdf["text"])
        ]
        return pd.DataFrame(
            {
                "file_id": [fid],
                "content": [
                    build_warc_file(records, warcinfo="webcrawl_spark wet writer")
                ],
            }
        )

    return d.groupBy("file_id").applyInPandas(_build, FILE_BLOB_SCHEMA)


# ---------------------------------------------------------------------------
# revisit layer (CC's deduplicated refetch records)
# ---------------------------------------------------------------------------

REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def revisit_file_blobs(docs: DataFrame, n_files: int = 16) -> DataFrame:
    """Dedup-aware WARC writing — the REVISIT layer (ISO 28500 §6.7.2,
    the ``identical-payload-digest`` profile Common Crawl applies to
    unchanged refetches): a page whose payload digest equals the
    previous capture's becomes a ``revisit`` record with an EMPTY
    payload and ``WARC-Payload-Digest`` / ``WARC-Refers-To-Target-URI``
    / ``WARC-Refers-To-Date`` headers pointing at that capture; changed
    and first-seen pages get full ``response`` records. At CC scale the
    revisit layer is most of the archive's dedup win — unchanged bodies
    are stored once per epoch, not once per crawl.

    ``docs`` rows: ``(url, ts, payload, prev_digest, prev_ts)`` with
    ``prev_*`` NULL when the url was not previously captured (the
    persisted digest table is the dedup analog of the frontier seen
    set). The digest comparison is a JVM ``md5`` projection BEFORE the
    Arrow stage; grouping/serialization mirror
    :func:`warc_file_blobs` (one gzip member per record, mtime=0,
    url-sorted within file — byte-deterministic)."""
    d = docs.withColumn(
        "__revisit",
        F.col("prev_digest").isNotNull()
        & (F.md5("payload") == F.col("prev_digest")),
    ).withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("int")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        records = []
        for u, ts, p, pdig, pts, rev in zip(
            pdf["url"], pdf["ts"], pdf["payload"], pdf["prev_digest"],
            pdf["prev_ts"], pdf["__revisit"],
        ):
            ts_s = None if ts is None or pd.isna(ts) else str(ts)
            if bool(rev):
                records.append(
                    (
                        "revisit", u, ts_s, b"",
                        [
                            ("WARC-Profile", REVISIT_PROFILE),
                            ("WARC-Payload-Digest", f"urn:md5:{pdig}"),
                            ("WARC-Refers-To-Target-URI", u),
                            ("WARC-Refers-To-Date", str(pts)),
                        ],
                    )
                )
            else:
                records.append(("response", u, ts_s, bytes(p)))
        return pd.DataFrame(
            {"file_id": [fid], "content": [build_warc_file(records)]}
        )

    return d.groupBy("file_id").applyInPandas(_build, FILE_BLOB_SCHEMA)
