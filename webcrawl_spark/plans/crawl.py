"""Multi-round BFS crawl driver: seeds → round loop → checkpointed state.

Re-expresses the reference's continuous thread-pool loop
(``Crawler.Start``/``CrawlServices``, Backend/Crawler.cs:983-1008,
2823-2878; termination ``IsDone`` Crawler.cs:507-511) as synchronous,
atomically-committed rounds over snapshot state: stop = finish current
round; kill mid-round = resume from the last committed manifest with an
identical future trace (north_rule resumability).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..config import CrawlConfig
from ..kernels import mime as M
from ..kernels import robots as R
from ..kernels.config_free import SCHEMES
from ..kernels.filters import compile_uri_filters
from ..kernels.urlnorm import canonicalize
from ..operators import bloom as B
from .round import FRONTIER_COLS, RoundContext, host_hash_col, run_round
from .state import CrawlState, Manifest

_EMPTY_ROBOTS = pd.DataFrame(columns=["host", "path_prefix", "allow", "crawl_delay"])


class SparkCrawler:
    """Distributed URL-frontier engine over a ``pages`` table.

    ``pages``: DataFrame(url, html, …) — the simulated web
    (BASELINE.json:input_hint shape). ``seeds``: ordered URL list.
    ``robots_rules``: small pandas frame broadcast to executors.
    """

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        seeds: list,
        state_dir: str,
        config: CrawlConfig = CrawlConfig(),
        robots_rules: Optional[pd.DataFrame] = None,
        ranks: Optional[DataFrame] = None,
    ):
        self.spark = spark
        self.pages = pages
        self.seeds = list(seeds)
        self.cfg = config
        self.state = CrawlState(spark, state_dir)

        self._ext_table = M.build_ext_table(config.mime_overrides)
        if config.reliable_checkpoints:
            # cluster mode: lineage cuts go to shared storage with the rest
            # of the crawl state and survive executor loss (set BEFORE the
            # effective-pages cut below, which every round's fetch join
            # depends on — a local cut there would defeat the guarantee)
            import os as _os

            spark.sparkContext.setCheckpointDir(
                _os.path.join(state_dir, "_ckpt")
            )

        # redirect chains resolve ONCE per crawl (static property of the
        # pages table); the per-round fetch join sees the effective view.
        # Tables without a redirect_to column pass through unchanged.
        from ..operators.ckpt import cut as _cut
        from ..operators.redirect import effective_pages

        self.eff_pages = effective_pages(
            pages, config.max_redirects, config.reliable_checkpoints
        )
        if "redirect_to" in pages.columns:
            self.eff_pages = _cut(self.eff_pages, config.reliable_checkpoints)
        rules = robots_rules if robots_rules is not None else _EMPTY_ROBOTS
        rule_index = R.build_rule_index(rules) if config.robots_enabled else {}
        delays = R.crawl_delays(rules) if config.robots_enabled else {}
        self._rule_index = rule_index
        self.ctx = RoundContext(
            cfg=config,
            base_uris_bc=spark.sparkContext.broadcast(self._compute_base_uris()),
            uri_filters=compile_uri_filters(
                config.change_filters, config.positive_filters, config.negative_filters
            ),
            rule_index_bc=(
                spark.sparkContext.broadcast(rule_index) if rule_index else None
            ),
            delays=delays,
            # (url, rank) priority weights — e.g. a link_pagerank output fed
            # back into the frontier; consumed only under cfg.rank_priority
            ranks=ranks if config.rank_priority else None,
        )

    # ------------------------------------------------------------------
    def _canon_seeds(self) -> pd.DataFrame:
        cfg = self.cfg
        return canonicalize(
            pd.Series(self.seeds, dtype="object"),
            strip_www=cfg.strip_www,
            normalize_query=cfg.normalize_query,
            case_sensitive_paths=cfg.case_sensitive_paths,
        )

    def _compute_base_uris(self) -> list:
        """AddBaseUri appends every valid-scheme seed (Crawler.cs:806-836);
        pure function of (seeds, config) so resume recomputes it exactly."""
        if not self.seeds:
            return []
        c = self._canon_seeds()
        return [
            {"scheme": r.scheme, "host": r.host, "path": r.path}
            for r in c.itertuples()
            if r.url is not None and r.scheme in SCHEMES
        ]

    def _seed_allowed(self, r) -> bool:
        """ValidateNewUri scheme gate (Crawler.cs:3311-3327) + the engine's
        robots gate on seeds (north_rule addition)."""
        if r.url is None or r.scheme not in SCHEMES:
            return False
        if self._rule_index and not bool(
            R.robots_allowed(
                pd.Series([r.host]), pd.Series([r.path]), self._rule_index
            ).iloc[0]
        ):
            return False
        return True

    def _entry_row(self, r, seq: int, post_data=None) -> tuple:
        cfg = self.cfg
        binary = M.guess_resource_type_from_path(r.path, self._ext_table) == M.BINARY
        prio = 1 if binary else 0
        if cfg.prioritize_nonhtml:
            prio = 1 - prio
        return (r.url, r.url_key, r.host, r.path, r.query, 0, None, "link",
                False, prio, seq, 0, 0, post_data)

    _FRONTIER_DDL = {
        "url": "url string", "url_key": "url_key string",
        "host": "host string", "path": "path string",
        "query": "query string", "depth": "depth int",
        "referrer": "referrer string", "link_type": "link_type string",
        "is_external": "is_external boolean", "priority": "priority int",
        "seq": "seq long", "failures": "failures int",
        "round": "round int", "post_data": "post_data string",
    }

    def _frontier_df(self, rows: list):
        cols = [f for f in FRONTIER_COLS if f != "host_hash"]
        return self.spark.createDataFrame(
            pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols),
            schema=", ".join(self._FRONTIER_DDL[f] for f in cols),
        ).withColumn(
            "host_hash", host_hash_col(self.cfg.num_partitions)
        ).select(*FRONTIER_COLS)

    def _init_seeds(self) -> Manifest:
        """Round-0 frontier from the seed list plus user POST resources
        (driver-side: seeds are tiny by definition; all per-row logic still
        runs the shared kernels)."""
        cfg = self.cfg
        c = self._canon_seeds()
        seen_keys: set = set()
        rows = []
        seq = 0
        for r in c.itertuples():
            key = (r.host, r.url_key)
            if key in seen_keys or not self._seed_allowed(r):
                continue
            seen_keys.add(key)
            rows.append(self._entry_row(r, seq))
            seq += 1

        # POST resources: force-enqueued (public EnqueueUri passes
        # force=true, Crawler.cs:1082-1084) — the seen-set dedup is
        # BYPASSED, so a url both seeded and POSTed is fetched twice;
        # post_data is not part of the identity key (MakeKey, 2618-2625).
        for url, post_data in cfg.post_seeds:
            r = canonicalize(
                pd.Series([url], dtype="object"),
                strip_www=cfg.strip_www,
                normalize_query=cfg.normalize_query,
                case_sensitive_paths=cfg.case_sensitive_paths,
            ).iloc[0]
            if not self._seed_allowed(r):
                continue
            seen_keys.add((r.host, r.url_key))
            rows.append(self._entry_row(r, seq, post_data))
            seq += 1

        frontier = self._frontier_df(rows)
        # seen delta from the python-side key set (NOT the frontier — force-
        # enqueued POSTs may duplicate a key in the frontier; seen holds it once)
        first = {}
        for row in rows:
            k = (row[2], row[1])   # (host, url_key)
            if k not in first:
                first[k] = (row[3], row[4])  # path, query
        seen_pdf = pd.DataFrame(
            [(h, uk, p, q) for (h, uk), (p, q) in first.items()],
            columns=["host", "url_key", "path", "query"],
        )
        seen_delta = self.spark.createDataFrame(
            seen_pdf, schema="host string, url_key string, path string, query string"
        ).select(
            "host",
            host_hash_col(cfg.num_partitions).alias("host_hash"),
            "url_key", "path", "query",
            F.lit(0).cast("int").alias("first_depth"),
            F.lit(0).cast("int").alias("first_round"),
        )
        # the three seed commits are independent — run them concurrently
        # (the sidecar builds from the in-memory delta, not the written
        # files; same rows either way)
        from .round import _Job

        seen_delta = seen_delta.localCheckpoint(eager=True)
        jobs = [
            _Job(lambda: self.state.write_table("frontier", 0, frontier)),
            _Job(lambda: self.state.write_table("seen", 0, seen_delta)),
        ]
        if self.cfg.bloom_enabled:
            jobs.append(_Job(lambda: B.build_sidecar(
                seen_delta, None, B.sidecar_dir(self.state.root, 0),
                self.cfg.bloom_bits,
            )))
        for j in jobs:
            j.wait()
        m = Manifest(
            next_round=0, next_seq=seq, next_fetch_seq=0, frontier_rows=len(rows),
            done=(len(rows) == 0),
            seen_rows=len(first),   # unique keys (POST force-dups collapse)
        )
        self.state.commit(m)
        return m

    # ------------------------------------------------------------------
    def run(self, max_rounds: Optional[int] = None) -> Manifest:
        """Crawl until the frontier drains (IsDone) or a round cap.

        ``max_rounds`` limits *this call* (kill/resume tests); the config's
        ``max_rounds`` bounds the whole crawl.
        """
        m = self.state.latest_manifest()
        if m is None:
            m = self._init_seeds()
        self._bloom_dir = self._ensure_sidecar(m) if self.cfg.bloom_enabled else None
        rounds_done = 0
        # carry = the previous round's in-flight state: its background
        # commits (still running — they overlap the next round's compute),
        # its uncommitted manifest, and the in-memory frontier/seen views
        # the next round consumes instead of reading the writes back.
        # Commits therefore lag compute by one round; _drain settles the
        # tail before returning, so the on-disk state is current whenever
        # run() is not executing (resume, accessors, enqueue/requeue APIs).
        carry = None
        try:
            while (
                not m.done
                and m.frontier_rows > 0
                and m.next_round < self.cfg.max_rounds
                and (max_rounds is None or rounds_done < max_rounds)
            ):
                m, carry = self._run_one(m, carry)
                rounds_done += 1
            if carry is not None:
                self._drain(carry)
                carry = None
            return m
        finally:
            # Error path: settle the carried round's writer threads before
            # propagating — an orphaned _Job racing a later run()'s
            # mode('overwrite') writes to the same seen/frontier/bloom round
            # dirs could leave mixed data under a later-committed manifest.
            # The manifest is deliberately NOT committed here (commit is
            # success-only, in _drain): the uncommitted round replays
            # identically on resume, which the fault probes verify.
            if carry is not None:
                for j in carry["stats"].jobs:
                    try:
                        j.join()
                    except Exception:
                        pass

    def _drain(self, carry) -> None:
        """Wait for a round's background commits, then make it visible."""
        for j in carry["stats"].jobs:
            j.wait()
        self.state.commit(carry["manifest"])
        if self._bloom_dir is not None:
            B.gc_sidecars(self.state.root, carry["manifest"].next_round)

    def _ensure_sidecar(self, m: Manifest) -> str:
        """Path to the resume round's complete sidecar dir; if missing or
        incomplete (sidecar loss), rebuild it from the committed seen table
        — a DISTRIBUTED job over the seen partitions, never a driver-side
        materialization of the seen set."""
        d = B.sidecar_dir(self.state.root, m.next_round)
        if not B.is_complete(d):
            B.build_sidecar(
                self.state.read_seen(m.next_round), None, d, self.cfg.bloom_bits
            )
        return d

    def _run_one(self, m: Manifest, carry):
        import os as _os
        import time as _time

        _dbg = _os.environ.get("WC_ROUND_TIMING")
        _t = [_time.time()]

        def _mk(label):
            if _dbg:
                now = _time.time()
                print(f"    [r{m.next_round}] {label}: {now - _t[0]:.2f}s", flush=True)
                _t[0] = now

        k = m.next_round
        st = self.state
        self.ctx.bloom_dir = self._bloom_dir
        bloom_cb = None
        bloom_wait = None
        if self._bloom_dir is not None:
            # executor-side delta update: the round's seen delta (served from
            # the round's acc checkpoint, host_hash attached) ORs into
            # per-partition bitset files; untouched partitions carry forward
            # as hard links. The driver moves file metadata only — never keys.
            # Passed as a callback so run_round overlaps it with the next
            # round's compute (the next round waits on it only right before
            # its check stage fires).
            prev_dir = self._bloom_dir
            nd = B.sidecar_dir(st.root, k + 1)

            def bloom_cb(keys_df):
                B.build_sidecar(keys_df, prev_dir, nd, self.cfg.bloom_bits)

            if carry is not None and carry["stats"].bloom_job is not None:
                bloom_wait = carry["stats"].bloom_job.wait

        if carry is None:
            # first round of this run(): state comes from the committed tables
            frontier = st.read_frontier(k)
            seen = st.read_seen(k)
        else:
            # chained from the previous round's checkpoints — the background
            # writes of the same rows are still in flight and are NOT read
            frontier = carry["stats"].next_frontier
            seen = carry["seen"]
        pq = (
            seen.groupBy("host", "path").agg(F.count(F.lit(1)).alias("n"))
            if self.cfg.max_query_strings_per_file is not None
            else None
        )

        stats = run_round(
            self.spark,
            self.ctx,
            st,
            frontier,
            self.eff_pages,
            seen,
            pq,
            k,
            m.next_seq,
            m.next_fetch_seq,
            m.frontier_rows,
            # the true seen count from the manifest; old manifests (or a
            # post-requeue-removal state) fall back to next_seq, which can
            # only overstate (force-enqueues reuse seen keys)
            seen_rows=m.seen_rows if m.seen_rows is not None else m.next_seq,
            bloom_update=bloom_cb,
            bloom_wait=bloom_wait,
        )
        try:
            if bloom_cb is not None:
                self._bloom_dir = nd
            _mk("run_round_total")
            # the PREVIOUS round's background commits have now fully
            # overlapped this round's compute — settle them and make that
            # round visible
            if carry is not None:
                self._drain(carry)
                _mk("prev_round_commit")
            nm = Manifest(
                next_round=k + 1,
                next_seq=stats.next_seq,
                next_fetch_seq=stats.next_fetch_seq,
                frontier_rows=stats.frontier_rows,
                done=(stats.frontier_rows == 0),
                counters=[list(c) for c in stats.counters],
                seen_rows=(
                    None if m.seen_rows is None else m.seen_rows + stats.n_new
                ),
            )
            return nm, {
                "stats": stats,
                "manifest": nm,
                "seen": seen.unionByName(stats.seen_delta),
            }
        except BaseException:
            # THIS round's background writers started inside run_round but
            # are not yet in any carry the caller could settle — join them
            # here so a failed drain of the previous round can't orphan them
            # (their manifest is never committed, so the round replays).
            for j in stats.jobs:
                try:
                    j.join()
                except Exception:
                    pass
            raise

    # ---------------- result accessors ----------------
    def _m(self) -> Manifest:
        m = self.state.latest_manifest()
        if m is None:
            raise RuntimeError("crawl not started")
        return m

    def fetch_log(self) -> DataFrame:
        # fetch_log for round r is committed by manifest r+1, so only rounds
        # < next_round are visible — a crashed round's partially-written
        # fetch_log dir must not surface (mirrors how read_seen excludes the
        # in-flight delta).
        return self.state.read_fetch_log(self._m().next_round - 1)

    def fetched(self) -> DataFrame:
        cols = [f.name for f in schemas.FETCHED.fields]
        return self.fetch_log().filter(F.col("status") == "ok").select(*cols)

    def trace(self) -> DataFrame:
        return self.fetched().select(
            "round", "fetch_seq", "url", "depth", "link_type"
        ).orderBy("fetch_seq")

    def seen(self) -> DataFrame:
        return self.state.read_seen(self._m().next_round)

    def errors(self) -> DataFrame:
        return (
            self.fetch_log()
            .filter(F.col("status") != "ok")
            .select(
                "url", "round", "failures", "fatal",
                F.col("status").alias("reason"),
            )
        )

    def counters(self) -> DataFrame:
        rows = [tuple(c) for m in self.state.manifests() for c in m.counters]
        return self.spark.createDataFrame(rows, schemas.COUNTERS)


def _enqueue_uri(crawler: "SparkCrawler", url: str, post_data=None,
                 force: bool = True) -> bool:
    """EnqueueUri(uri, postData[, force]) between runs (Crawler.cs:1081-1101;
    the public two-arg overload forces). Appends one depth-0 entry to the
    current frontier snapshot and re-commits the manifest; with
    ``force=False`` an already-seen key is dropped (Service.Enqueue,
    Crawler.cs:2301-2320). Returns True if enqueued."""
    st = crawler.state
    m = crawler._m()
    k = m.next_round
    cfg = crawler.cfg
    r = canonicalize(
        pd.Series([url], dtype="object"),
        strip_www=cfg.strip_www,
        normalize_query=cfg.normalize_query,
        case_sensitive_paths=cfg.case_sensitive_paths,
    ).iloc[0]
    if not crawler._seed_allowed(r):
        return False
    seen_new = (
        st.read_seen(k)
        .filter((F.col("host") == r.host) & (F.col("url_key") == r.url_key))
        .isEmpty()
    )
    if not force and not seen_new:
        return False
    entry = crawler._frontier_df([crawler._entry_row(r, m.next_seq, post_data)])
    frontier = st.read_frontier(k).unionByName(entry).localCheckpoint(eager=True)
    st.write_table("frontier", k, frontier)
    if seen_new:
        import os as _os
        import shutil as _shutil

        delta = entry.select(
            "host", "host_hash", "url_key", "path", "query",
            F.col("depth").alias("first_depth"),
            F.lit(k).cast("int").alias("first_round"),
        )
        d = st._dir("seen", k)
        if _os.path.exists(d):
            delta = crawler.spark.read.parquet(d).unionByName(delta)
        delta = delta.localCheckpoint(eager=True)
        st.write_table("seen", k, delta)
        # O(1) sidecar maintenance: OR the one key's bits into its partition
        # file in place (an incomplete/missing sidecar falls back to the
        # distributed rebuild on the next run())
        bd = B.sidecar_dir(st.root, k)
        if B.is_complete(bd):
            row = entry.select("host", "url_key", "host_hash").head()
            B.add_key_inplace(
                bd, row.host, row.url_key, row.host_hash, cfg.bloom_bits
            )
        else:
            _shutil.rmtree(_os.path.join(st.root, "bloom"), ignore_errors=True)
    st.commit(Manifest(
        next_round=k,
        next_seq=m.next_seq + 1,
        next_fetch_seq=m.next_fetch_seq,
        frontier_rows=m.frontier_rows + 1,
        done=False,
        counters=m.counters,
        seen_rows=(
            None if m.seen_rows is None
            else m.seen_rows + (1 if seen_new else 0)
        ),
    ))
    return True


def _frontier_removal(crawler: "SparkCrawler", pattern: str, allow_requeue: bool) -> int:
    """RemoveUris (Crawler.cs:874-883, Service.Remove 2326-2341): drop
    frontier entries whose URL matches ``pattern``. With
    ``allow_requeue=False`` the keys STAY in the seen set (the reference's
    ``queued[key] = null``) and can never re-enqueue; with ``True`` they
    are erased from seen (dict entry removed) and may be rediscovered.

    Frontier surgery mutates the current snapshot in place and re-commits
    the manifest; the allow_requeue=True path compacts the seen table
    (append-only deltas → one consolidated delta).
    """
    st = crawler.state
    m = crawler._m()
    k = m.next_round
    frontier = st.read_frontier(k)
    match = F.col("url").rlike(pattern)
    # count only — the matched keys never leave the executors (at 10^10-URL
    # scale clear_uris() matches the whole frontier; collecting it would be
    # a driver OOM). The requeue path below stays distributed too.
    n_removed = frontier.filter(match).count()
    if n_removed == 0:
        return 0
    kept = frontier.filter(~match).localCheckpoint(eager=True)

    if allow_requeue:
        import os
        import shutil

        seen = st.read_seen(k)
        removed_keys = frontier.filter(match).select("host", "url_key")
        consolidated = seen.join(
            removed_keys, ["host", "url_key"], "left_anti"
        ).localCheckpoint(eager=True)
        # crash-safe wholesale rewrite via the compaction marker flip
        # (state.replace_table) — the new seen content is published
        # atomically, never a delete-then-write window
        st.replace_table("seen", k, consolidated)
        # bloom has no deletes: drop sidecars so the next run() rebuilds
        bdir = os.path.join(st.root, "bloom")
        if os.path.exists(bdir):
            shutil.rmtree(bdir)

    st.write_table("frontier", k, kept)
    st.commit(Manifest(
        next_round=k,
        next_seq=m.next_seq,
        next_fetch_seq=m.next_fetch_seq,
        frontier_rows=m.frontier_rows - n_removed,
        done=(m.frontier_rows - n_removed) == 0,
        counters=m.counters,
        # requeue removal shrinks seen by an uncounted amount → unknown;
        # the no-requeue path leaves seen untouched
        seen_rows=None if allow_requeue else m.seen_rows,
    ))
    return n_removed


def _clear_uris(crawler: "SparkCrawler") -> int:
    """ClearUris (Crawler.cs:845-851, Service.Clear 2255-2271): drop the
    whole frontier; the cleared keys remain marked seen
    (``queued[key] = null`` at Crawler.cs:2268) and never re-enqueue."""
    return _frontier_removal(crawler, ".*", allow_requeue=False)


SparkCrawler.remove_uris = lambda self, pattern, allow_requeue=True: _frontier_removal(
    self, pattern, allow_requeue
)
SparkCrawler.clear_uris = lambda self: _clear_uris(self)
SparkCrawler.enqueue_uri = lambda self, url, post_data=None, force=True: _enqueue_uri(
    self, url, post_data, force
)
