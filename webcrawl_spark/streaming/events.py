"""Streaming aggregations over an events feed.

- :func:`stream_tumbling_counts` — tumbling 1-hour windows with a
  watermark for late data; the streaming expression of the batch
  ``event_tumbling_counts`` query (same groups, same counts once the
  stream drains).
- :func:`stream_session_counts` — custom stateful operator via
  ``applyInPandasWithState``: per-user running event counts + last-seen
  timestamp, with timeout-based state expiry. The pattern a streaming
  frontier would use for per-host politeness state (deferred per
  SURVEY.md §2 streaming note).

Both read a bounded file-source stream (the events parquet dir) and write
to a memory sink via ``processAvailable``-style drains so tests can compare
against the batch equivalents exactly.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def table_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-source stream over a testdata table (bounded: drains once).

    The file source requires a DIRECTORY; the single-file testdata table is
    staged into a temp dir via symlink."""
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/{table}.parquet")
    stage = os.path.join(
        tempfile.gettempdir(), f"wc_stream_{table}_" + src.replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_stream(spark, sf_dir, "events")


def stream_dedup_docs(spark: SparkSession, sf_dir: str, query_name: str) -> "StreamingQuery":
    """Streaming exact dedup: first arrival per content digest survives
    (``dropDuplicates`` state = one md5 key per unique document) — the
    streaming form of the batch keeper selection, for dedup-at-ingest
    pipelines where documents arrive continuously. At 100 TB the digest
    state shards uniformly across the cluster (md5 keys); a bounded-state
    variant would swap in ``dropDuplicatesWithinWatermark`` when dups are
    known to arrive within a time horizon.

    NULL-text rows have no content to be duplicates of: ``dropDuplicates``
    treats NULL keys as equal and would silently collapse every content-less
    document onto the first — so their dedup key falls back to the doc_id,
    letting each pass through."""
    docs = table_stream(spark, sf_dir, "documents")
    deduped = docs.select(
        "doc_id",
        F.coalesce(
            F.md5(F.col("text")),
            F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
        ).alias("digest"),
    ).dropDuplicates(["digest"])
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )


def stream_neardup_flags(
    spark: SparkSession, stage_dir: str, corpus_sigs: DataFrame,
    out_dir: str, query_name: str,
    bands: int = 4, rows_per_band: int = 2, k: int = 5,
    max_bucket_size: int | None = 1000,
) -> "StreamingQuery":
    """Streaming near-dup-at-ingest: each micro-batch of arriving documents
    probes the PERSISTED corpus signature table via
    ``textdedup.lsh_pairs_incremental`` and appends its (a, b) candidate
    pairs to ``out_dir`` — the streaming form of the daily-delta dedup
    (battery `dedup_lsh_incremental`), for pipelines where today's crawl
    arrives continuously instead of as one batch.

    ``foreachBatch`` is the right tool here, not a stream-stream join: the
    probe is a plain batch computation per micro-batch against STATIC state
    (the corpus signature table — a parquet/Iceberg table in a deployment),
    so no streaming join state accumulates. The delta side runs UNCAPPED
    (``delta_max_bucket_size=None``): a capped delta side would make a
    document's pairs depend on which micro-batch it happened to arrive in —
    per-document results must be batch-split-invariant, which also makes
    the drained stream EXACTLY equal the one-shot batch operator (asserted
    in tests). The corpus-side cap stays, identical for every batch.

    Growing the corpus (appending each batch's own signatures so later
    arrivals can pair with earlier ones) is an out-of-band table append in
    this design — deliberately not done inside the hot probe path."""
    from ..operators import textdedup as TD

    schema = spark.read.parquet(stage_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )

    def _probe(batch_df: DataFrame, _batch_id: int) -> None:
        TD.lsh_pairs_incremental(
            batch_df, corpus_sigs,
            bands=bands, rows_per_band=rows_per_band, k=k,
            max_bucket_size=max_bucket_size, delta_max_bucket_size=None,
        ).write.mode("append").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(_probe)
        .queryName(query_name)
        .start()
    )


def stream_pq_topk(
    spark: SparkSession, stage_dir: str, cent: DataFrame, codes: DataFrame,
    out_dir: str, query_name: str, k: int = 5,
) -> "StreamingQuery":
    """Streaming similarity-at-ingest over the persisted PQ model: each
    micro-batch of arriving embedding rows is quantized and ADC-scored
    against yesterday's codebooks + code table
    (``similarity.pq_delta_topk``), appending its top-k corpus neighbors
    to ``out_dir`` — the streaming form of the battery's
    `ann_pq_incremental`, for pipelines where the delta arrives
    continuously.

    Same design argument as :func:`stream_neardup_flags`: ``foreachBatch``
    against STATIC state (the model tables), no streaming join state. A
    vector's top-k depends only on its own embedding and the static model,
    so per-document results are batch-split-invariant BY CONSTRUCTION (no
    cap caveat needed) — the drained stream exactly equals the one-shot
    incremental operator (asserted in tests)."""
    from ..operators import similarity as SIM

    schema = spark.read.parquet(stage_dir).schema
    emb = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )

    def _probe(batch_df: DataFrame, _batch_id: int) -> None:
        SIM.pq_delta_topk(batch_df, cent, codes, k=k).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        emb.writeStream.foreachBatch(_probe)
        .queryName(query_name)
        .start()
    )


def stream_tumbling_counts(spark: SparkSession, sf_dir: str, query_name: str) -> "StreamingQuery":
    """1-hour tumbling windows, 2-hour watermark, memory sink."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "2 hours")
        .groupBy(F.window("ts_tz", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour_bucket"),
            "event_type", "n",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


SESSION_STATE_SCHEMA = "n_events long, last_seen double"
SESSION_OUT_SCHEMA = "user_id long, n_events long"


def _session_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event counts across micro-batches.

    (No processing-time timeout: recurring expiry batches would keep a
    bounded drain from settling; production feeds would add
    ``setTimeoutDuration`` for state GC.)"""
    n, last = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last = max(last, pdf["ts"].astype("int64").max() / 1e9)
    state.update((n, last))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def stream_session_counts(spark: SparkSession, sf_dir: str, query_name: str) -> "StreamingQuery":
    """Stateful per-user counting via applyInPandasWithState."""
    ev = events_stream(spark, sf_dir).select("user_id", "ts")
    counted = ev.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        counted.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


def stream_paragraph_dedup(
    spark: SparkSession, stage_dir: str, phash_dir: str,
    out_dir: str, query_name: str,
) -> "StreamingQuery":
    """Streaming paragraph-dedup-at-ingest with a GROWING store: each
    micro-batch is cleaned against the persisted paragraph-hash table
    (``textdedup.paragraph_dedup_incremental``), then the hashes of its
    KEPT paragraphs are appended — so a line first kept in batch N is
    dropped from batch N+1 onward, exactly the day-over-day loop of the
    batch operator run per micro-batch.

    Unlike :func:`stream_neardup_flags` (static corpus, out-of-band
    growth), the growth here is IN the loop because paragraph dedup's
    semantics are first-occurrence-wins: without the append, two batches
    could both keep the same boilerplate line. The consequence is that
    per-document output depends on arrival order — with in-order arrival
    (FileStreamSource's oldest-first default) the drained stream equals
    the one-shot :func:`~webcrawl_spark.operators.textdedup
    .paragraph_dedup_incremental` over the whole delta (asserted in
    tests). ``foreachBatch`` keeps every step a plain batch job against
    parquet state; no streaming join state accumulates."""
    from ..operators import textdedup as TD

    schema = spark.read.parquet(stage_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )

    def _clean(batch_df: DataFrame, _batch_id: int) -> None:
        stored = spark.read.parquet(phash_dir)
        cleaned = TD.paragraph_dedup_incremental(batch_df, stored)
        # localCheckpoint: the append below must not re-run the probe
        # against a store we are about to grow
        cleaned = cleaned.localCheckpoint(eager=True)
        cleaned.write.mode("append").parquet(out_dir)
        TD.paragraph_hashes(cleaned, text_col="text_clean").write.mode(
            "append"
        ).parquet(phash_dir)

    return (
        docs.writeStream.foreachBatch(_clean)
        .queryName(query_name)
        .start()
    )


def clean_chunk_stream(
    docs: DataFrame, size: int = 8, stride: int = 6,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """C4 line cleaning + token-window chunking AT INGEST: both stages
    are stateless narrow projections (``functions/textstats.c4_clean`` /
    ``chunk_by_tokens``), so they run INSIDE the streaming plan — no
    ``foreachBatch``, no state store, no watermark (nothing aggregates) —
    and the drained stream equals the batch composition by construction
    (asserted in tests). The same expressions the batch path uses; one
    source, no drift.

    100-TB shape: per micro-batch this is the identical zero-exchange
    map-side plan as batch; throughput is bounded by the source, never by
    streaming state."""
    from ..functions import textstats as TS

    cleaned = (
        TS.c4_clean(docs, text_col=text_col, id_col=id_col)
        .filter("keep")
        .select(F.col("id").alias(id_col), F.col("text_clean").alias(text_col))
    )
    return TS.chunk_by_tokens(
        cleaned, size=size, stride=stride, text_col=text_col, id_col=id_col
    ).withColumnRenamed("id", id_col)


def stream_hll_registers(
    spark: SparkSession, sf_dir: str, query_name: str, shingle_k: int = 8
) -> "StreamingQuery":
    """HLL sketch-at-ingest: per-source distinct-shingle HLL registers
    maintained INCREMENTALLY by the streaming engine — a streaming
    max-aggregate IS the sketch's merge law (cellwise max), so every
    micro-batch folds into ≤ m rows of state per source and the
    distinct-vocabulary estimate is available at any instant without
    rescanning history. This is the streaming member of the mergeable-
    sketch family (KMV/CMS/HLL/histogram): at 100 TB/day ingest, the
    registers ARE the persisted state — no raw-shingle retention.
    Batch-equivalence (tested): once the bounded stream drains, the
    register table equals operators/sketches.hll_registers over the
    whole corpus, hence identical estimates."""
    from ..operators import sketches as SK
    from ..operators.textdedup import shingle_hashes_sql

    d = table_stream(spark, sf_dir, "documents")
    sh = d.select(
        F.col("source").alias("grp"),
        F.explode(F.expr(shingle_hashes_sql("text", k=shingle_k))).alias("h"),
    )
    idx, rho = SK.hll_rho_sql("h")
    regs = (
        sh.select("grp", F.expr(idx).alias("idx"), F.expr(rho).alias("rho"))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return (
        regs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_bloom_positions(
    spark: SparkSession, sf_dir: str, query_name: str
) -> "StreamingQuery":
    """Bloom filter at ingest: the seen-set sketch (operators/sketches
    .bloom_build — the battery-measured twin of the crawl's Bloom
    sidecar) maintained INCREMENTALLY by the streaming engine. Each
    micro-batch's content digests explode into their k bit positions and
    fold into a streaming distinct on the uniform ``pos`` key — state is
    ≤ m rows FOREVER (the filter's whole point), and the set-bit table is
    probeable at any instant without rescanning history. The streaming
    aggregate IS the Bloom merge law (position-set union), exactly as the
    HLL member's max-agg is cellwise max. Batch-equivalence (tested):
    once the bounded stream drains, the position set equals
    ``bloom_build`` over the whole corpus, hence identical probe answers.
    """
    from ..operators import sketches as SK

    d = table_stream(spark, sf_dir, "documents")
    pos = (
        d.filter(F.col("text").isNotNull())
        .select(F.md5("text").alias("item"))
        .select(
            F.explode(F.expr(SK.bloom_positions_sql("item"))).alias("pos")
        )
    )
    bits = pos.groupBy("pos").agg(F.count(F.lit(1)).alias("n_set"))
    return (
        bits.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_backoff_counts(
    spark: SparkSession, sf_dir: str, query_name: str, status_sql: str
) -> "StreamingQuery":
    """Politeness backoff at ingest: the per-host (fetches, pushback)
    counters that ``operators/snapshot.host_backoff`` folds into budgets,
    maintained INCREMENTALLY as fetch results stream in — counts are
    ADDITIVE, so a streaming sum-aggregate on the uniform host key IS the
    merge law, state is |hosts|-bounded, and the next round's budgets are
    derivable at any instant without rescanning the fetch log.
    ``status_sql``: expression deriving the HTTP status from the staged
    table's rows (the battery's deterministic synthesis). Batch
    equivalence (tested): the drained counters equal the batch
    aggregate, hence identical budgets."""
    d = table_stream(spark, sf_dir, "documents")
    log = d.select(
        F.expr("'h' || CAST(doc_id % 8 AS STRING) || '.test'").alias("host"),
        F.expr(status_sql).cast("int").alias("status"),
    )
    err = (F.col("status") == 429) | (F.col("status") >= 500)
    counts = log.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(err.cast("long")).alias("n_errors"),
    )
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_template_counts(
    spark: SparkSession, sf_dir: str, query_name: str
) -> "StreamingQuery":
    """Template detection at ingest: the per-(host, line) document counts
    that :func:`webcrawl_spark.functions.textstats.template_lines` derives
    batch-side, maintained INCREMENTALLY — a streaming count-aggregate IS
    the table's merge law (counts are additive across ingest batches)
    because each arriving document contributes its WITHIN-DOC-DISTINCT
    lines exactly once (``array_distinct`` inside the row projection, so
    no cross-batch distinct state is ever needed). At 100 TB/day the
    running (host, line, n_docs) table is the persisted state a nightly
    thresholding pass turns into the template blocklist — no raw-line
    retention, no corpus rescan. Batch-equivalence tested."""
    d = table_stream(spark, sf_dir, "documents")
    lines = d.select(
        F.col("source").alias("grp"),
        F.explode(
            F.expr(
                "array_distinct(filter("
                "transform(split(text, '\\n'), x -> trim(x)), x -> x != ''))"
            )
        ).alias("line"),
    )
    counts = lines.groupBy("grp", "line").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_bigram_counts(
    spark: SparkSession, sf_dir: str, query_name: str
) -> "StreamingQuery":
    """PMI state at ingest: the sentinel bigram count table that
    :func:`webcrawl_spark.functions.textstats.bigram_counts` derives
    batch-side, maintained INCREMENTALLY — a streaming count-aggregate IS
    the table's merge law (bigram counts are additive across ingest
    batches; each arriving document contributes its own bigrams exactly
    once, no cross-batch state beyond the running counts). At 100 TB/day
    the running (w1, w2, c12) table is the persisted state
    ``pmi_from_counts`` / ``pmi_incremental`` turn into the collocation
    list on demand — no raw-text retention, no corpus rescan.
    Batch-equivalence tested."""
    from ..functions.textstats import PMI_SENT_L, PMI_SENT_R

    d = table_stream(spark, sf_dir, "documents")
    bg = (
        d.filter(F.col("text").isNotNull())
        .select(
            F.expr(
                f"concat(array('{PMI_SENT_L}'), "
                f"regexp_extract_all(lower(text), '[a-z]+', 0), "
                f"array('{PMI_SENT_R}'))"
            ).alias("__w")
        )
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(__w, 1, size(__w) - 1)").alias("w1"),
                    F.expr("slice(__w, 2, size(__w) - 1)").alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_feed_discovery(
    spark: SparkSession, sf_dir: str, query_name: str
) -> "StreamingQuery":
    """Discovery at ingest: the per-(host, loc) reference-count table that
    :func:`webcrawl_spark.operators.discovery.discover_urls` derives
    batch-side from the feed edge, maintained INCREMENTALLY — a streaming
    count-aggregate IS the table's merge law (reference counts are
    additive across ingest batches; ``parse_feeds`` is a stateless narrow
    projection, so each arriving feed body contributes its entries exactly
    once). At Common-Crawl scale the running (host, loc, n_refs) table is
    the persisted discovery state the frontier's seen anti-join consumes
    each round — feeds are re-fetched constantly (they are the freshest
    channel), and the count accumulates re-announcements as a freshness
    signal without retaining any body. Batch-equivalence tested."""
    from ..operators.feeds import parse_feeds
    from ..queries import _feed_body_sql

    d = table_stream(spark, sf_dir, "documents")
    bodies = d.select(
        F.expr("'site' || CAST(doc_id AS STRING) || '.test'").alias("host"),
        F.expr(_feed_body_sql("doc_id")).alias("body"),
    )
    counts = (
        parse_feeds(bodies)
        .groupBy("host", "loc")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def stream_revisit_classify(
    spark: SparkSession, stage_dir: str, prev_digests: DataFrame,
    out_dir: str, query_name: str,
) -> "StreamingQuery":
    """Streaming revisit classification at ingest: each micro-batch of
    fetched pages joins the PERSISTED previous-capture digest table
    (``url``, ``prev_digest``, ``prev_ts``) and appends
    ``(url, ts, record_type)`` verdicts to ``out_dir`` — ``revisit``
    when the payload digest matches the prior capture, ``response``
    otherwise — the streaming half of the WARC revisit layer
    (``sources/warc.revisit_file_blobs``), for archive pipelines that
    classify while the crawl is still running instead of in one batch.

    Same design as ``stream_neardup_flags``: ``foreachBatch`` against
    STATIC state (no streaming-join state accumulates), per-document
    verdicts are batch-split-invariant by construction (each row's
    verdict depends only on its own digest + the static table), so the
    drained stream equals the one-shot classification (asserted in
    tests)."""
    schema = spark.read.parquet(stage_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )

    def _classify(batch_df: DataFrame, _batch_id: int) -> None:
        (
            batch_df.join(prev_digests, "url", "left")
            .select(
                "url",
                "ts",
                F.when(
                    F.col("prev_digest").isNotNull()
                    & (F.md5("payload") == F.col("prev_digest")),
                    F.lit("revisit"),
                )
                .otherwise(F.lit("response"))
                .alias("record_type"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        docs.writeStream.foreachBatch(_classify)
        .queryName(query_name)
        .start()
    )
