"""One BFS crawl round as a declarative DataFrame pipeline (SURVEY.md §3.2).

Dataflow (each step cites the reference semantics it re-expresses):

1.  SELECT   politeness top-k per host (MaxConnectionsPerServer,
    Crawler.cs:533-548 + robots crawl_delay budgets) via a window
    ``row_number() over (partition by host order by priority, seq)``;
    optional salt pre-prune bounds mega-host skew (north_rule explicit skew
    handling); global budget = ordered limit (MaxConnections,
    Crawler.cs:551-562); deterministic ``fetch_seq`` assignment.
2.  FETCH    left join vs the ``pages`` table on ``url`` (no network —
    BASELINE.json:input_hint): absent row = fatal 404 (IsFatalError,
    Crawler.cs:2121-2164); NULL html = retryable failure routed by
    MaxRetries (Crawler.cs:1814-1860). ``pages.url`` is assumed unique
    (the Iceberg table's key; multi-version corpora are pre-deduped
    latest-wins upstream, once, not per round).
3.  DECODE   Arrow-batched charset decode + content filters + MIME
    (mapInPandas; Crawler.cs:1619-1656).
4.  PARSE    link extraction + resolve + URI filters + canonicalize + scope
    + robots + depth rule (mapInPandas stages over the shared kernels).
5.  ENQUEUE  min-depth merge into the carried frontier (Crawler.cs:2303-2307);
    left-anti join vs the seen set (Service.Enqueue dedup,
    Crawler.cs:2301-2320); first-passing-discovery selection; crawler-trap
    caps (MaxQueryStringsPerFile Crawler.cs:2415-2423; MaxQueuedLinks
    Crawler.cs:2310-2315); deterministic global ``seq`` assignment.

Every ordering key is data-derived — the same trace falls out at any
parallelism (local[2] == local[32] == a 1000-executor cluster).

Physical-plan choices (the 100-TB story):

- the ``pages`` table is scanned EXACTLY ONCE per round: the fetch join
  result is checkpointed, and its size is bounded by the politeness budget
  (per-host cap × host count), never by corpus size.
- one combined ``fetch_log`` commit (fetched ∪ errors) doubles as the
  parse input — no decode recomputation, a hard lineage cut, one write.
- per-round stats ride a single aggregate over the checkpointed join plus
  write-side Observations — no standalone count jobs over big inputs.
- sequence assignment is adaptive: below
  ``cfg.small_round_threshold`` rows a lazy single-partition window embeds
  in downstream plans (zero extra jobs); above it, a range-partitioned
  two-phase numbering keeps every task bounded (``operators/seq.py``).
- the seen anti-join keys on (host, url_key) — uniform hash keys, so a
  mega-host cannot skew the dedup shuffle; politeness selection is the one
  host-partitioned window, protected by the salt pre-prune.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark import InheritableThread
from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.crawl_udfs import (
    CANDIDATE_SCHEMA,
    DECODE_SCHEMA,
    make_decode_stage,
    make_parse_candidate_stage,
)
from ..kernels import robots as R
from ..operators.ckpt import cut
from ..operators.seq import assign_global_seq

FRONTIER_COLS = [
    "url", "url_key", "host", "host_hash", "path", "query", "depth",
    "referrer", "link_type", "is_external", "priority", "seq", "failures",
    "round", "post_data",
]

def host_hash_col(P: int):
    """Deterministic host-hash partition id (shared by all state tables)."""
    return F.pmod(F.xxhash64("host"), F.lit(P)).cast("int")


@dataclass
class RoundContext:
    cfg: CrawlConfig
    base_uris_bc: object             # spark broadcast of the base-URI list
    uri_filters: tuple
    rule_index_bc: object = None     # spark broadcast of robots rule index
    delays: dict = field(default_factory=dict)  # host -> crawl_delay seconds
    bloom_dir: str = None            # complete sidecar dir for this round
    ranks: DataFrame = None          # (url, rank) priority weights — consumed
                                     # only when cfg.rank_priority is set


@dataclass
class RoundStats:
    next_seq: int
    next_fetch_seq: int
    frontier_rows: int
    counters: list
    n_new: int = 0                # seen keys added this round
    seen_keys: DataFrame = None   # (host, host_hash, url_key) of this round's
                                  # seen delta, backed by the acc checkpoint —
                                  # the Bloom sidecar update reads this instead
                                  # of re-scanning the written delta
    jobs: list = field(default_factory=list)  # in-flight background commits
                                  # (seen delta, frontier, Bloom sidecar);
                                  # the caller waits for them BEFORE
                                  # committing this round's manifest, but
                                  # AFTER the next round's compute — the
                                  # writes overlap it
    next_frontier: DataFrame = None  # checkpointed frontier entering the
                                     # next round (same rows the background
                                     # frontier write persists)
    seen_delta: DataFrame = None     # checkpoint-backed seen rows added this
                                     # round (same rows the seen write
                                     # persists) — the next round's anti-join
                                     # unions this instead of re-reading
                                     # parquet
    bloom_job: object = None         # the Bloom-sidecar member of ``jobs``:
                                     # the next round waits on it before any
                                     # action triggers its check stage


def _budget_col(ctx: RoundContext):
    cfg = ctx.cfg
    default = cfg.max_connections_per_server
    budgets = {
        h: R.host_budget(default, d, cfg.politeness_quantum_s)
        for h, d in ctx.delays.items()
    }
    budgets = {h: b for h, b in budgets.items() if b != default}
    if not budgets:
        return F.lit(default)
    m = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    return F.coalesce(m[F.col("host")], F.lit(default))


class _Job(InheritableThread):
    """Background Spark action: the round's independent commits (fetch_log,
    seen delta, frontier, Bloom sidecar) overlap instead of queueing as
    serial driver actions — the scheduler interleaves their tasks. Each
    writes its own directory; the manifest commit (after all joins) remains
    the only visibility point, so failure atomicity is unchanged."""

    def __init__(self, fn):
        super().__init__(target=self._run)
        self._fn = fn
        self.exc = None
        self.start()

    def _run(self):
        try:
            self._fn()
        except BaseException as e:  # re-raised on wait() in the driver thread
            self.exc = e

    def wait(self):
        self.join()
        if self.exc is not None:
            raise self.exc


def _lazy_seq(df: DataFrame, order_cols: list, start: int, out_col: str) -> DataFrame:
    """Single-partition global numbering — deterministic, zero extra jobs;
    for rounds below the small-round threshold only."""
    w = Window.orderBy(*order_cols)
    return df.coalesce(1).withColumn(
        out_col, (F.lit(start) + F.row_number().over(w) - F.lit(1)).cast("long")
    )


def select_polite(
    frontier: DataFrame, budget, salt_buckets: int = 1,
    max_connections: int | None = None, rank_col: str | None = None,
) -> DataFrame:
    """Per-host politeness selection: the top-``budget`` frontier rows per
    host by (priority, seq), with the mega-host salt pre-prune and the
    optional global connection cap (MaxConnectionsPerServer /
    MaxConnections; Crawler.cs:533-562). ``budget`` is an int or a Column
    (per-host crawl-delay budgets). The salt pre-prune is semantically
    transparent — the true per-host top-k is a subset of the union of
    per-(host, salt) top-ks — it only bounds what any single task sorts.
    ``rank_col`` optionally keeps the final per-host rank. Extracted from
    the round pipeline so the battery drives the REAL selection code path.
    """
    if not isinstance(budget, Column):
        budget = F.lit(budget)
    pool = frontier
    if salt_buckets > 1:
        # skew guard: per-(host, salt) pre-prune — no single task ever
        # sorts a mega-host's whole queue (north_rule explicit skew handling)
        wsalt = Window.partitionBy(
            "host", F.pmod(F.xxhash64("url_key"), F.lit(salt_buckets))
        ).orderBy("priority", "seq")
        pool = (
            frontier.withColumn("__rn", F.row_number().over(wsalt))
            .filter(F.col("__rn") <= budget)
            .drop("__rn")
        )
    w = Window.partitionBy("host").orderBy("priority", "seq")
    sel = pool.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= budget
    )
    sel = (
        sel.withColumnRenamed("__rn", rank_col) if rank_col else sel.drop("__rn")
    )
    if max_connections is not None:
        sel = sel.orderBy("priority", "seq").limit(max_connections)
    return sel


def run_round(
    spark: SparkSession,
    ctx: RoundContext,
    state,
    frontier: DataFrame,
    pages: DataFrame,
    seen: DataFrame,
    pq: DataFrame,
    rnd: int,
    next_seq: int,
    next_fetch_seq: int,
    frontier_rows: int,
    seen_rows: int = None,
    bloom_update=None,
    bloom_wait=None,
) -> RoundStats:
    cfg = ctx.cfg
    P = cfg.num_partitions
    small = frontier_rows <= cfg.small_round_threshold
    counters: list = []
    # seen feeds both the dedup anti-join and the derived query-string
    # counts — persist so the (large, growing) union scan happens once
    seen = seen.persist()
    _debug = os.environ.get("WC_ROUND_TIMING")
    _t0 = time.time()

    def _mark(label):
        nonlocal _t0
        if _debug:
            now = time.time()
            print(f"    [r{rnd}] {label}: {now - _t0:.2f}s", flush=True)
            _t0 = now

    # ---------------- 1. SELECT (politeness + budgets) ----------------
    sel = select_polite(
        frontier, _budget_col(ctx), cfg.salt_buckets, cfg.max_connections
    )
    if small:
        sel = _lazy_seq(sel, ["priority", "seq"], next_fetch_seq, "fetch_seq")
    else:
        sel = assign_global_seq(
            sel, ["priority", "seq"], start=next_fetch_seq,
            out_col="fetch_seq", num_partitions=P,
            reliable=cfg.reliable_checkpoints,
        )

    # ---------------- 2+3. FETCH + DECODE: ONE pages scan, ONE cut ----
    # Bounded by the politeness budget, not the corpus: the join holds at
    # most (hosts-with-work × per-host budget) rows of html. ``pages`` here
    # is the redirect-resolved effective view (operators/redirect.py):
    # (url, html, final_url, exceeded, final_present) — html is the chain-
    # terminal row's. The decode mapInPandas sees EVERY joined row (error
    # rows pass through with NULL decode columns, the routing flags computed
    # JVM-side below ride along), so the fetch join, charset decode, and
    # error routing all share a SINGLE checkpoint — and since html is
    # dropped inside the stage, the materialized cut is lighter than the
    # raw join it replaces.
    from ..kernels.errors import FATAL_CODES

    pg = pages.withColumn("__present", F.lit(True))
    present0 = F.col("__present").isNotNull()
    status0 = F.coalesce(F.col("http_status"), F.lit(200))
    ok0 = (
        present0
        & ~F.coalesce(F.col("exceeded"), F.lit(False))
        & F.coalesce(F.col("final_present"), F.lit(False))
        & (status0 == 200)
        & F.col("html").isNotNull()
    )
    # repartition by url BEFORE the cut: the join inherits the pages table's
    # layout (possibly a handful of files), and everything downstream — the
    # fetch_log files and therefore parse — would inherit that
    # serialization. The shuffle moves one round's html only (budget-bounded).
    # MaxFileSize truncates the TRANSFER, not just the reported byte count
    # (CopyStream, Crawler.cs:1743-1771; knob 583-598): the cut happens here
    # at the fetch boundary so decode, link-scan, and the bytes metric all
    # see the truncated body — and so one pathological multi-GB row can
    # never inflate the fetch shuffle or an Arrow decode batch.
    dec = (
        sel.join(pg, "url", "left")
        .repartition(P, "url")
        .select(
            *FRONTIER_COLS, "fetch_seq",
            # conditional so the (common) under-cap body passes by reference
            # instead of paying a per-row byte-array copy; None = Infinite
            (
                F.when(
                    F.length("html") > cfg.max_file_size,
                    F.expr(f"substring(html, 1, {int(cfg.max_file_size)})"),
                ).otherwise(F.col("html")).alias("html")
                if cfg.max_file_size is not None
                else F.col("html")
            ),
            "final_url", "server_mime",
            status0.cast("int").alias("http_status"),
            present0.alias("present"),
            F.coalesce(F.col("exceeded"), F.lit(False)).alias("exceeded"),
            F.coalesce(F.col("final_present"), F.lit(False)).alias("final_present"),
            F.coalesce(ok0, F.lit(False)).alias("ok"),
        )
        .mapInPandas(make_decode_stage(cfg, ctx.base_uris_bc), DECODE_SCHEMA)
    )
    dec = cut(dec, cfg.reliable_checkpoints)
    _mark("fetch_decode_ckpt")

    # routing (fatal taxonomy; IsFatalError Crawler.cs:2121-2164 + redirect
    # outcomes Crawler.cs:635-647, 1585-1597):
    #   original url absent                  → http_404 fatal
    #   redirect chain exceeds MaxRedirects  → too_many_redirects fatal
    #   chain lands on an absent url         → http_404 fatal
    #   status in the fatal table            → http_<code> fatal, no retry
    #   status retryable (5xx …) / html NULL → retryable (MaxRetries)
    #   downloaded but final url out of scope→ redirect_out_of_scope fatal
    #                                          (decided in DECODE, as the
    #                                          reference checks ResponseUri
    #                                          only after the response)
    # ``ok`` false + reachable + non-fatal status ⟺ the old
    # "status 200 with NULL html, or retryable status" condition — html
    # itself is gone from the checkpoint, the flag stands in for it.
    present = F.col("present")
    status_c = F.col("http_status")
    c_exceeded = present & F.col("exceeded")
    c_dead = present & ~F.col("exceeded") & ~F.col("final_present")
    reachable = present & ~F.col("exceeded") & F.col("final_present")
    c_fatal_status = (
        reachable & (status_c != 200) & status_c.isin(list(FATAL_CODES))
    )
    retry = (
        dec.filter(
            ~F.col("ok") & reachable & ~status_c.isin(list(FATAL_CODES))
        )
        .withColumn("__nf", (F.col("failures") + 1).cast("int"))
        .filter(F.col("__nf") <= cfg.max_retries)
    )

    ok_rows = dec.filter(F.col("ok") & F.col("reject").isNull()).select(
        "url", "url_key", "host",
        F.lit(rnd).cast("int").alias("round"),
        "fetch_seq", "depth", "link_type",
        F.lit(200).alias("http_status"),
        "mime", "charset", "bytes",
        F.col("text").alias("extracted_text"),
        "final_url",
        F.lit("ok").alias("status"),
        F.col("failures").cast("int").alias("failures"),
        F.lit(False).alias("fatal"),
    )

    # ALL error classes fed by the fetch join collapse into ONE branch with
    # CASE routing (a single scan of the shared checkpoint — a 6-way union
    # here re-read it per branch). failures is failures+1 for every
    # joined-side error.
    nf = (F.col("failures") + 1).cast("int")
    retryable_cond = (
        reachable
        & ~status_c.isin(list(FATAL_CODES))
        & (nf <= cfg.max_retries)
    )
    err_j = dec.filter(~F.col("ok")).select(
        "url", "url_key", "host",
        F.lit(rnd).cast("int").alias("round"),
        "fetch_seq", "depth", "link_type",
        F.when(~present | c_dead, 404)
         .when(c_fatal_status, status_c)
         .otherwise(0).cast("int").alias("http_status"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("charset"),
        F.lit(None).cast("long").alias("bytes"),
        F.lit(None).cast("string").alias("extracted_text"),
        "final_url",
        F.when(~present | c_dead, F.lit("http_404"))
         .when(c_exceeded, F.lit("too_many_redirects"))
         .when(c_fatal_status, F.concat(F.lit("http_"), status_c.cast("string")))
         .when(retryable_cond, F.lit("retryable"))
         .otherwise(F.lit("retries_exhausted")).alias("status"),
        nf.alias("failures"),
        (~retryable_cond).alias("fatal"),
    )
    scope_reject_rows = dec.filter(
        F.col("ok") & F.col("reject").isNotNull()
    ).select(
        "url", "url_key", "host",
        F.lit(rnd).cast("int").alias("round"),
        "fetch_seq", "depth", "link_type",
        F.lit(0).alias("http_status"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("charset"),
        F.lit(None).cast("long").alias("bytes"),
        F.lit(None).cast("string").alias("extracted_text"),
        "final_url",
        F.col("reject").alias("status"),
        F.col("failures").cast("int").alias("failures"),
        F.lit(True).alias("fatal"),
    )
    # per-round fetch stats ride the write as Observations — no standalone
    # aggregate job (every selected row lands in fetch_log exactly once)
    obs_f = Observation(f"fetch_r{rnd}")
    fetch_log = (
        ok_rows.unionByName(err_j).unionByName(scope_reject_rows)
    ).observe(
        obs_f,
        F.count(F.lit(1)).alias("n_sel"),
        F.count(F.when(F.col("status") == "ok", 1)).alias("n_good"),
        F.count(F.when(F.col("status") == "retryable", 1)).alias("n_retry"),
    )
    # the fetch_log commit has no downstream dependents until its
    # Observation is read — run it in the background so the parse stage
    # (which reads the same decode checkpoint) overlaps it
    fl_job = _Job(lambda: state.write_table("fetch_log", rnd, fetch_log))

    retry_rows = retry.withColumn("failures", F.col("__nf")).select(*FRONTIER_COLS)

    # ---------------- 4. PARSE → candidates --------------------------
    cand = (
        dec.filter(
            F.col("text").isNotNull() & F.col("rtype").isin("html", "css")
        )
        # links resolve against the redirect-terminal url (the reference
        # updates resourceUri to the ResponseUri, Crawler.cs:1585-1588);
        # parent_url/referrer stays the queued (original) url
        .select(
            "url", "depth", "fetch_seq", "rtype", "text",
            F.coalesce("final_url", "url").alias("base0"),
        )
        .mapInPandas(
            make_parse_candidate_stage(
                cfg, ctx.base_uris_bc, ctx.uri_filters, ctx.rule_index_bc
            ),
            CANDIDATE_SCHEMA,
        )
    )
    # discoveries (acc ⊆ cand) can be orders of magnitude larger than the
    # incoming frontier (fan-out × links per page), so the single-partition
    # fast path for 5f gates on the candidate count, not frontier_rows; the
    # count rides the checkpoint job as an Observation (no standalone scan).
    obs_c = Observation(f"cand_r{rnd}")
    cand = cand.observe(obs_c, F.count(F.lit(1)).alias("n"))
    cand = cut(cand, cfg.reliable_checkpoints)
    cand_count = cand.count() if cfg.reliable_checkpoints else obs_c.get["n"]
    small_acc = cand_count <= cfg.small_round_threshold
    _mark("parse_ckpt")

    # the fetch_log write has been overlapping the parse stage; its
    # Observation (needed for the carried anti-join's broadcast gate and the
    # counters) is read at the top of ENQUEUE, by which point the write has
    # typically drained.
    def _fl_done() -> dict:
        fl_job.wait()
        return obs_f.get

    # ---------------- 5. ENQUEUE ----------------
    v = _fl_done()
    n_selected, n_good, n_retry = v["n_sel"], v["n_good"], v["n_retry"]
    next_fetch_seq += n_selected
    counters += [
        (rnd, "select", "selected", n_selected),
        (rnd, "fetch", "fetched", n_good),
        (rnd, "fetch", "retries", n_retry),
        (rnd, "fetch", "errors", n_selected - n_good - n_retry),
    ]
    n_carried = frontier_rows - n_selected + n_retry
    _mark("fetch_log_join")

    # 5a. min-depth merge into carried entries (still-queued rediscoveries,
    #     Crawler.cs:2303-2307). Carried keys ⊆ seen, so joining all
    #     candidate minima is exact.
    # the selected set is politeness-budget-bounded (hosts × per-host cap),
    # never corpus-sized — broadcast it so the (huge) frontier is filtered
    # in place instead of shuffled. The hint is gated on the MEASURED
    # selected-row count (known from the fetch Observation): with
    # max_connections unset, hosts-with-work × per-host budget can exceed
    # driver memory, and Catalyst must pick the join then.
    sel_seqs = dec.select("seq")
    if n_selected <= 5_000_000:
        sel_seqs = F.broadcast(sel_seqs)
    carried = frontier.join(
        sel_seqs, "seq", "left_anti"
    ).select(*FRONTIER_COLS).unionByName(retry_rows)
    cand_mins = cand.groupBy("host", "url_key").agg(F.min("depth").alias("__cmin"))
    carried = (
        carried.join(cand_mins, ["host", "url_key"], "left")
        .withColumn("depth", F.least("depth", F.coalesce("__cmin", "depth")))
        .drop("__cmin")
        .select(*FRONTIER_COLS)
    )
    # the carried cut is data-independent of the accept pipeline (5b-5f)
    # below — materialize it CONCURRENTLY with the acc checkpoint; the next
    # round's frontier is then a zero-cost union of the two cuts
    carried_slot: dict = {}
    carried_job = _Job(
        lambda: carried_slot.update(df=cut(carried, cfg.reliable_checkpoints))
    )

    # 5b. frontier dedup: left-anti join vs the persistent seen set
    #     (Service.Enqueue, Crawler.cs:2301-2320). Join key (host, url_key)
    #     hashes on the full key → no mega-host shuffle skew. With the Bloom
    #     sidecar, candidates are repartitioned on host_hash and each task
    #     tests its partitions' bitset FILES (executor-maintained, see
    #     operators/bloom.py — no driver filter, no full-filter broadcast);
    #     misses are DEFINITELY new and bypass the anti-join; only
    #     possible-seen rows (rediscoveries + false positives) enter the
    #     shuffle. The two consumers of the flagged frame share the
    #     repartition exchange (ReusedExchange).
    bloom_flagged = None
    use_bloom = ctx.bloom_dir is not None and (
        seen_rows is None or seen_rows >= cfg.bloom_min_seen
    )
    if use_bloom:
        from ..operators import bloom as B

        if bloom_wait is not None:
            # the sidecar for THIS round was built as a background job at
            # the end of the previous round — it must be on disk before any
            # action triggers the check stage below
            bloom_wait()
        flagged = (
            cand.withColumn("__hh", host_hash_col(P))
            .repartition(P, "__hh")
            .mapInPandas(
                B.make_check_stage(ctx.bloom_dir, cfg.bloom_bits),
                CANDIDATE_SCHEMA + ", __hh int, maybe_seen boolean",
            )
            .persist()  # two consumers below — run the check stage once
        )
        bloom_flagged = flagged
        definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen", "__hh")
        checked = (
            flagged.filter(F.col("maybe_seen")).drop("maybe_seen", "__hh")
            .join(seen.select("host", "url_key"), ["host", "url_key"], "left_anti")
        )
        new_cand = definitely_new.unionByName(checked)
    else:
        new_cand = cand.join(
            seen.select("host", "url_key"), ["host", "url_key"], "left_anti"
        )

    # 5c. first passing discovery per key wins and defines the entry's
    #     attributes + seen.first_depth; discoveries at or after it (passing
    #     or not) min-merge into the entry's frontier depth. ONE window pass
    #     + ONE same-key groupBy (no re-shuffle: both key on (host, url_key))
    #     — struct min is lexicographic, so min(struct(pos_f, pos_o)) over
    #     passing rows IS the first passing position, and the anchor row's
    #     attributes come back via min(when(pos == anchor, struct(attrs))).
    pos = F.struct(F.col("pos_f"), F.col("pos_o"))
    wk = Window.partitionBy("host", "url_key")
    anchored = (
        new_cand.withColumn(
            "__anchor", F.min(F.when(F.col("passes"), pos)).over(wk)
        )
        .filter(F.col("__anchor").isNotNull() & (pos >= F.col("__anchor")))
    )
    attrs = F.struct(
        "url", "path", "query", "depth", "referrer", "link_type",
        "is_external", "priority", "pos_f", "pos_o",
    )
    acc = (
        anchored.groupBy("host", "url_key")
        .agg(
            F.min(F.when(pos == F.col("__anchor"), attrs)).alias("__a"),
            F.min("depth").alias("__mdepth"),
        )
        .select(
            "host", "url_key",
            F.col("__a.url").alias("url"),
            F.col("__a.path").alias("path"),
            F.col("__a.query").alias("query"),
            F.col("__mdepth").alias("depth"),
            F.col("__a.referrer").alias("referrer"),
            F.col("__a.link_type").alias("link_type"),
            F.col("__a.is_external").alias("is_external"),
            F.col("__a.priority").alias("priority"),
            F.col("__a.pos_f").alias("pos_f"),
            F.col("__a.pos_o").alias("pos_o"),
            F.col("__a.depth").alias("first_depth"),
        )
    )

    # 5c'. rank-weighted priority (config-gated): discovered entries join the
    #      ranks table (url → rank, e.g. a link_pagerank output) and fold the
    #      rank into the priority — base class still dominates (RANK_SPAN
    #      exceeds any clamped rank), rank orders within a class. This is
    #      the reference's HTML-first class ordering (EnqueueCore,
    #      Crawler.cs:2507-2512) generalized to an externally-computed
    #      signal. Uniform-key join on url (the ranks table is corpus-sized
    #      at scale — never assume broadcast; AQE picks one when it is small).
    if cfg.rank_priority and ctx.ranks is not None:
        from ..functions.rankprio import fold_rank_priority

        acc = fold_rank_priority(acc, ctx.ranks)

    # 5d. crawler-trap cap: ≥ max distinct query strings per (host, path)
    #     → ignore (Crawler.cs:2415-2423). Each accepted key adds exactly
    #     one distinct query to its path, so rank-vs-prior-count is exact.
    #     None = Infinite: skip the join (and its full seen re-aggregation).
    if cfg.max_query_strings_per_file is not None:
        wpq = Window.partitionBy("host", "path").orderBy("pos_f", "pos_o")
        acc = (
            acc.withColumn("__rnq", F.row_number().over(wpq))
            .join(pq, ["host", "path"], "left")
            .withColumn("__prior", F.coalesce(F.col("n"), F.lit(0)))
            .filter(F.col("__prior") + F.col("__rnq") <= F.lit(cfg.max_query_strings_per_file))
            .drop("__rnq", "n", "__prior")
        )

    # 5e. global frontier cap (MaxQueuedLinks, Crawler.cs:2310-2315)
    if cfg.max_queued_links is not None:
        slots = max(0, cfg.max_queued_links - n_carried)
        acc = assign_global_seq(
            acc, ["pos_f", "pos_o"], 0, out_col="__caprank", num_partitions=P,
            reliable=cfg.reliable_checkpoints,
        ).filter(F.col("__caprank") < slots).drop("__caprank")

    # 5f. deterministic discovery sequence (EnqueueCore order ADAPTed to a
    #     (priority, seq) total order; Crawler.cs:2507-2512)
    if small_acc:
        acc = _lazy_seq(acc, ["pos_f", "pos_o"], next_seq, "seq")
    else:
        acc = assign_global_seq(
            acc, ["pos_f", "pos_o"], start=next_seq, out_col="seq",
            num_partitions=P, reliable=cfg.reliable_checkpoints,
        )
    # acc feeds four consumers (seen delta, new frontier entries, the Bloom
    # sidecar update, the next-frontier cut) — checkpoint once so the 5b-5f
    # window/join pipeline runs exactly once per round instead of once per
    # consumer. n_new rides the cut as an Observation (no standalone scan).
    obs_n = Observation(f"acc_r{rnd}")
    acc = acc.observe(obs_n, F.count(F.lit(1)).alias("n"))
    acc = cut(acc, cfg.reliable_checkpoints)
    n_new = acc.count() if cfg.reliable_checkpoints else obs_n.get["n"]
    if bloom_flagged is not None:
        bloom_flagged.unpersist()
    seen.unpersist()
    _mark("acc_ckpt")

    seen_delta = acc.select(
        "host",
        host_hash_col(P).alias("host_hash"),
        "url_key", "path", "query",
        F.col("first_depth").cast("int").alias("first_depth"),
        F.lit(rnd).cast("int").alias("first_round"),
    )

    new_entries = acc.select(
        "url", "url_key", "host",
        host_hash_col(P).alias("host_hash"),
        "path", "query",
        F.col("depth").cast("int").alias("depth"),
        "referrer", "link_type", "is_external",
        F.col("priority").cast("int").alias("priority"),
        "seq",
        F.lit(0).cast("int").alias("failures"),
        F.lit(rnd + 1).cast("int").alias("round"),
        # extracted links are always GETs; POST entries enter only through
        # the seed/enqueue API (Crawler.cs:1081-1101) and, being user-forced,
        # never pass the depth gate — the reference's POST depth exemption
        # (Crawler.cs:1475-1484) is honored structurally.
        F.lit(None).cast("string").alias("post_data"),
    )
    seen_keys = acc.select("host", host_hash_col(P).alias("host_hash"), "url_key")

    # the NEXT round's frontier: union of the two cuts above — (a) the next
    # round consumes in-memory materializations instead of reading the
    # written parquet back, and (b) the anti-join/union lineage never chains
    # across rounds (every input is itself a checkpoint from this round)
    carried_job.wait()
    next_frontier = carried_slot["df"].unionByName(new_entries)
    _mark("carried_join")

    # the remaining commits (seen delta, frontier snapshot, Bloom sidecar)
    # all read only checkpointed inputs and write independent directories —
    # they launch here and OVERLAP the next round's compute; the caller
    # waits for them before committing this round's manifest (the per-round
    # serial-action floor is what caps scaling efficiency at small rounds).
    jobs = [
        _Job(lambda: state.write_table("seen", rnd + 1, seen_delta)),
        _Job(lambda: state.write_table("frontier", rnd + 1, next_frontier)),
    ]
    bloom_job = None
    if bloom_update is not None:
        # the previous round's sidecar build (this build's hard-link source)
        # may still be in flight when the check stage never fired this round
        # (below bloom_min_seen) — chain on it inside the background job
        def _bloom_run():
            if bloom_wait is not None:
                bloom_wait()
            bloom_update(seen_keys)

        bloom_job = _Job(_bloom_run)
        jobs.append(bloom_job)
    next_seq += n_new
    counters.append((rnd, "enqueue", "new_links", n_new))
    frontier_rows_next = n_carried + n_new
    counters.append((rnd, "commit", "frontier_out", frontier_rows_next))

    return RoundStats(
        next_seq=next_seq,
        next_fetch_seq=next_fetch_seq,
        frontier_rows=frontier_rows_next,
        counters=counters,
        n_new=n_new,
        seen_keys=seen_keys,
        jobs=jobs,
        next_frontier=next_frontier,
        seen_delta=seen_delta,
        bloom_job=bloom_job,
    )
