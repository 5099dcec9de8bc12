"""The frontier-superstep crawl loop (SURVEY.md §3.4) — the engine's
flagship pipeline, replacing the reference's queue-driven infinite loop
(/root/reference/main.go:139-145) with BSP rounds over ray.data.

Per round k:
  frontier_k (narrow rows: url, host, digest, seq, attempt)
    politeness budget (per-host, seq order)                 [north rule]
    -> persistent fetch-worker pool, each chunk fused:      [P1+P2+P3+P4]
         gates+fetch -> write own round=k/fetched parquet part (bodies
         leave the worker once, never shuffle) -> span extraction ->
         stage publish candidates DIRECTLY to their seen shard
    -> driver stages the (small) reset/INCR events           [P5 events]
    -> barrier on staging refs -> each shard sorts + replays [P5 commit]
       ITS events in discovery order, returns winners (narrow)
    -> winners + requeues + deferred => frontier_{k+1}      [P6 checkpoint]

Scale notes (explicit, per north rule):
- the only wide exchange is the narrow event shuffle, hash-partitioned by
  seen-shard id (i.e. by url digest); bodies/spans go driver->parquet
  exactly once and never enter a shuffle;
- the corpus index is broadcast once via ray.put (zero-copy reads in
  every fetch actor);
- frontier bookkeeping (politeness split, dense seq assignment of
  publish winners) is driver-side over NARROW arrays — fine to ~10^8
  rows/round; the documented scale path is a distributed sort +
  per-block offset pass (TODO, tracked in BASELINE.md);
- rounds checkpoint atomically (manifest written last); resume loads the
  last complete round's frontier + seen-set snapshots and skips finished
  rounds.

Rows whose frontier digest repeats within one round (the reference's
duplicate-delivery quirk: a URL can be requeued AND republished) take a
sequential driver-side lane so fetch-time counter reads interleave
exactly like the reference's single-threaded semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.urls import digest_hex_batch, netloc_host, parse_url
from ..stages.fetch import CorpusIndex, FetchStage
from ..stages.pool import NARROW_COLS, FetchWorkerPool
from ..stages.publish import (
    EV_ATTEMPT,
    derive_fetch_events,
    extract_candidates_batch,
    stage_events_to_shards,
)
from ..state.seen_set import SeenSet


@dataclass
class CrawlResult:
    crawl_order: pa.Table  # (round, seq, url) in fetch order
    metrics: list[dict]
    rounds: int
    out_dir: str
    seen: SeenSet

    def _mirror_files(self) -> list[str]:
        """All fetched parquet parts in write order (round asc, part name
        asc) — the order that defines last-write-wins."""
        from .sink import restore_crashed_rounds

        restore_crashed_rounds(self.out_dir)
        rounds = sorted(
            (int(d.split("=")[1]) for d in os.listdir(self.out_dir)
             if d.startswith("round=") and os.path.isdir(
                 os.path.join(self.out_dir, d, "fetched"))))
        files: list[str] = []
        for k in rounds:
            fdir = os.path.join(self.out_dir, f"round={k}", "fetched")
            files.extend(os.path.join(fdir, f)
                         for f in sorted(os.listdir(fdir))
                         if f.endswith(".parquet"))
        return files

    def mirror_dataset(self):
        """Final mirror state as a LAZY ``ray.data.Dataset`` — the scale
        path (``mirror_table`` is the driver-side golden/test
        convenience).  Last-write-wins per mirror_path, computed
        distributed: a narrow column-pruned pass aggregates the max
        write-order key per path, then an inner ``Dataset.join`` keeps
        only the winning rows — bodies shuffle exactly once (hash by
        mirror_path) and never touch the driver."""
        import ray.data as rd
        from ray.data.aggregate import Max

        files = self._mirror_files()
        items = [{"path": p, "fidx": i} for i, p in enumerate(files)]
        if not items:
            return rd.from_arrow(pa.table({
                "url": pa.array([], pa.string()),
                "mirror_path": pa.array([], pa.string()),
                "body": pa.array([], pa.string())}))

        def _read(batch: pa.Table, cols: list[str]) -> pa.Table:
            outs = []
            for path, fidx in zip(batch["path"].to_pylist(),
                                  batch["fidx"].to_pylist()):
                t = pq.read_table(path, columns=cols, use_threads=False)
                t = t.filter(pc.invert(pc.is_null(t["mirror_path"])))
                okey = (np.int64(fidx) << np.int64(32)) + np.arange(
                    t.num_rows, dtype=np.int64)
                outs.append(t.append_column(
                    "okey", pa.array(okey, pa.int64())))
            if not outs:
                return pa.table(
                    {c: pa.array([], pa.string()) for c in cols}
                    | {"okey": pa.array([], pa.int64())})
            return pa.concat_tables(outs)

        def read_full(b: pa.Table) -> pa.Table:
            return _read(b, ["url", "mirror_path", "body"])

        def read_narrow(b: pa.Table) -> pa.Table:
            return _read(b, ["mirror_path"])

        rows = rd.from_items(items).map_batches(
            read_full, batch_format="pyarrow", batch_size=1)
        from .blocks import nonempty_blocks

        winners = nonempty_blocks(
            rd.from_items(items)
            .map_batches(read_narrow, batch_format="pyarrow",
                         batch_size=4)
            .groupby("mirror_path")
            .aggregate(Max("okey", alias_name="okey")))
        if winners is None:
            return rd.from_arrow(pa.table({
                "url": pa.array([], pa.string()),
                "mirror_path": pa.array([], pa.string()),
                "body": pa.array([], pa.string())}))
        # few, large partitions: a partition per file turns the join's
        # hash exchange into a tiny-task matrix (measured pathological
        # on this Ray build — BASELINE.md); scale with CPUs instead
        try:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            ncpu = 4
        n_parts = max(2, min(ncpu, len(files)))
        return (rows.join(winners, "inner", num_partitions=n_parts,
                          on=("mirror_path", "okey"))
                .select_columns(["url", "mirror_path", "body"]))

    def mirror_table(self) -> pa.Table:
        """Final mirror state: last write per mirror_path across rounds
        (filesystem overwrite semantics, workflow.go:183).  Test/golden
        convenience — materializes bodies driver-side; use
        ``mirror_dataset`` at scale."""
        from .sink import restore_crashed_rounds

        restore_crashed_rounds(self.out_dir)
        rounds = sorted(
            (int(d.split("=")[1]) for d in os.listdir(self.out_dir)
             if d.startswith("round=") and os.path.isdir(
                 os.path.join(self.out_dir, d, "fetched"))))
        parts = []
        for k in rounds:
            ds = pads.dataset(os.path.join(self.out_dir, f"round={k}",
                                           "fetched"), format="parquet")
            parts.append(ds.to_table(
                columns=["url", "mirror_path", "body"],
                filter=~pc.field("mirror_path").is_null()))
        if not parts:
            return pa.table({"url": pa.array([], pa.string()),
                             "mirror_path": pa.array([], pa.string()),
                             "body": pa.array([], pa.string())})
        t = pa.concat_tables(parts)
        paths = t["mirror_path"].to_pylist()
        last: dict[str, int] = {}
        for i, p in enumerate(paths):
            last[p] = i
        idx = sorted(last.values())
        return t.take(pa.array(idx, pa.int64()))


def _frontier_table(
        rows: list[tuple[int, str, str, str, int, int]]) -> pa.Table:
    """rows: (seq, url, host, digest, attempt, priority)"""
    return pa.table({
        "discovered_seq": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "host": pa.array([r[2] for r in rows], pa.string()),
        "url_digest": pa.array([r[3] for r in rows], pa.string()),
        "attempt": pa.array([r[4] for r in rows], pa.int32()),
        "priority": pa.array([r[5] for r in rows], pa.int32()),
    })


def _part_budget_stats(path: str, cap: int) -> dict:
    """Politeness phase 1 for ONE frontier part: a column-pruned read of
    (discovered_seq, host) only, reduced to, per host, (row count, the
    host's ``cap`` smallest seqs).  ``cap`` is an upper bound on any
    host's take budget, so the capped lists are guaranteed to contain
    every row that can fall under the global per-host threshold — the
    driver can compute exact thresholds from these tiny summaries
    without ever materializing part rows.  (Same-round parts from
    different shards have INTERLEAVED seq ranges, so any part-at-a-time
    budget walk would mis-order; per-host thresholds are order-free.)"""
    t = pq.read_table(path, columns=["discovered_seq", "host"],
                      use_threads=False, memory_map=True)
    if t.num_rows == 0:
        return {}
    seqs = t["discovered_seq"].to_numpy()
    henc = t["host"].combine_chunks().dictionary_encode()
    hc = henc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hnames = henc.dictionary.to_pylist()
    order = np.lexsort((seqs, hc))
    sh = hc[order]
    first = np.ones(len(sh), dtype=bool)
    first[1:] = sh[1:] != sh[:-1]
    starts = np.nonzero(first)[0]
    ends = np.concatenate((starts[1:], [len(sh)]))
    out = {}
    for s, e in zip(starts, ends):
        out[hnames[int(sh[s])]] = (
            int(e - s), seqs[order[s:min(e, s + cap)]].tolist())
    return out


def seeds_to_frontier(seeds: list[str], cfg: CrawlConfig,
                      priorities: list[int] | None = None) -> pa.Table:
    """Seed rows; ``priorities`` mirrors the queue message priority field
    (hardwired 0 by the reference, queue/queue_connection.go:129; the
    north rule's politeness priority queue honors it: higher first)."""
    digs = digest_hex_batch(seeds, cfg.digest)
    pr = priorities or [0] * len(seeds)
    rows = []
    for i, (u, d) in enumerate(zip(seeds, digs)):
        p = parse_url(u)
        rows.append((i, u, netloc_host(p.netloc) if p else "", d, 0,
                     int(pr[i])))
    return _frontier_table(rows)


class CrawlEngine:
    """Holds the cross-round state: seen-set shards, corpus broadcast,
    output/checkpoint directory."""

    def __init__(self, corpus: pa.Table, cfg: CrawlConfig, out_dir: str,
                 use_ray: bool = True,
                 small_round_threshold: int = 0,
                 warm_pool: bool = False) -> None:
        self.cfg = cfg
        self.out_dir = out_dir
        self.use_ray = use_ray
        # rounds smaller than this run the same batch fns driver-side
        # (hybrid execution: Ray Data overhead isn't worth <threshold rows)
        self.small_round_threshold = small_round_threshold
        os.makedirs(out_dir, exist_ok=True)
        self.index = CorpusIndex(corpus)
        self.allowed_hosts = _allowed_hosts(cfg)
        if use_ray:
            import ray

            self.corpus_ref = ray.put(self.index)
            expected = max(1 << 16,
                           4 * corpus.num_rows // cfg.num_seen_shards)
            import uuid

            # collision-safe namespace: every engine instance gets FRESH
            # shard actors (a (pid, out_dir)-keyed name could silently
            # attach a second engine to contaminated shard state)
            self.seen = SeenSet.actors(cfg.num_seen_shards,
                                       cfg.ttl_expire_seconds,
                                       expected_keys=expected,
                                       namespace=f"crawl_{uuid.uuid4().hex[:12]}")
            self.pool = None  # created lazily on the first big round
            if warm_pool:
                self._ensure_pool()
                # warm the shard commit path too: the first commit
                # otherwise pays actor spawn + imports + first-RPC
                # latency inside round 0 (~0.5-1s measured)
                import ray

                ray.get([s.commit_staged.remote(0.0)
                         for s in self.seen.shards])
        else:
            self.corpus_ref = self.index
            self.seen = SeenSet.local(cfg.num_seen_shards,
                                      cfg.ttl_expire_seconds)
            self.pool = None
        self._local_fetcher = FetchStage(self.index, cfg, self.seen)
        # politeness token-bucket state (host_token_budget feature)
        self._host_tokens: dict[str, int] = {}
        self._hosts_429: set[str] = set()
        self._budget_stats_task = None  # lazy ray.remote(_part_budget_stats)
        # storage-mode priority renumber counter: rows with priority > 0
        # get fresh seqs from this DESCENDING negative range each round
        # (see _apply_priorities); persisted in the round manifest
        self._neg_seq = 0
        # storage-mode part row counts, returned by commit_phase2 with
        # the paths (saves the per-round driver footer scan)
        self._part_rows: dict[str, int] = {}

    # ------------------------------------------------------------------
    def run(self, seeds: list[str], now: float = 0.0,
            resume: bool = False,
            seed_priorities: list[int] | None = None) -> CrawlResult:
        if self.cfg.frontier_on_storage:
            return self._run_storage(seeds, now=now, resume=resume,
                                     seed_priorities=seed_priorities)
        cfg = self.cfg
        metrics: list[dict] = []
        order_parts: list[pa.Table] = []
        start_round = 0
        frontier = seeds_to_frontier(seeds, cfg, seed_priorities)
        next_seq = frontier.num_rows

        if resume:
            st = self._find_checkpoint()
            if st is not None:
                (start_round, frontier, parts, next_seq, metrics,
                 storage_mode) = st
                covered = set()
                for k in range(start_round):
                    p = os.path.join(self.out_dir, f"round={k}",
                                     "order.parquet")
                    if os.path.exists(p):
                        order_parts.append(pq.read_table(p))
                        covered.add(k)
                if storage_mode:
                    # the interrupted crawl had already auto-switched:
                    # its frontier lives on storage — resume there
                    # (even when this checkpoint's part list is empty,
                    # e.g. a requeue-only retry-tail round)
                    return self._finish_on_storage(
                        start_round, frontier, parts, next_seq,
                        metrics, now, order_parts,
                        covered_rounds=covered)

        rnd = start_round
        while frontier.num_rows > 0 and rnd < cfg.max_rounds:
            if (cfg.frontier_on_storage is None
                    and frontier.num_rows > cfg.storage_auto_threshold):
                if self.use_ray and cfg.max_crawl_retries >= 1:
                    # AUTO mode hand-off: this round's frontier outgrew
                    # the driver-bounded path — the current rows become
                    # the storage loop's driver rows (one oversized
                    # round), and every later frontier lives on storage
                    return self._finish_on_storage(
                        rnd, frontier.select(
                            ["discovered_seq", "url", "host",
                             "url_digest", "attempt", "priority"]),
                        [], next_seq, metrics, now, order_parts,
                        covered_rounds=frozenset(range(rnd)))
                # hand-off unavailable (local engine, or the storage
                # prefetch needs retries >= 1): failing loudly beats the
                # silent driver OOM the AUTO default exists to prevent
                raise RuntimeError(
                    f"round {rnd} frontier ({frontier.num_rows} rows) "
                    f"exceeds storage_auto_threshold "
                    f"({cfg.storage_auto_threshold}) but the storage "
                    "hand-off needs use_ray=True and "
                    "max_crawl_retries >= 1; raise the threshold only "
                    "if the driver can really hold the frontier")
            frontier, next_seq, m, order_t = self._run_round(
                rnd, frontier, next_seq,
                now + rnd * cfg.seconds_per_round)
            metrics.append(m)
            if order_t.num_rows:
                order_parts.append(order_t)
            rnd += 1

        order = (pa.concat_tables(order_parts) if order_parts else
                 pa.table({"round": pa.array([], pa.int32()),
                           "seq": pa.array([], pa.int64()),
                           "url": pa.array([], pa.string())}))
        self._write_metrics(metrics)
        self._maybe_compact()
        return CrawlResult(crawl_order=order, metrics=metrics, rounds=rnd,
                           out_dir=self.out_dir, seen=self.seen)

    def _maybe_compact(self) -> None:
        """Opt-in mirror-sink compaction post-pass
        (cfg.compact_fetched_rows): runs after order assembly so the
        swap never races a reader; order-preserving, so mirror and
        order read-backs are unchanged (tested)."""
        if self.cfg.compact_fetched_rows:
            from .sink import compact_crawl_rounds

            compact_crawl_rounds(self.out_dir,
                                 self.cfg.compact_fetched_rows,
                                 use_ray=self.use_ray)

    # ------------------------------------------------------------------
    def _run_round(self, rnd: int, frontier: pa.Table, next_seq: int,
                   now: float):
        cfg = self.cfg
        rdir = os.path.join(self.out_dir, f"round={rnd}")
        # a directory for this round can only exist from a CRASHED attempt
        # (completed rounds are behind the checkpoint manifest): clear it,
        # or stale fetched parts from the failed attempt would leak into
        # the mirror and the narrow read-backs
        if os.path.exists(rdir):
            import shutil

            shutil.rmtree(rdir)
        os.makedirs(os.path.join(rdir, "fetched"), exist_ok=True)
        import time as _time

        _t0 = _time.perf_counter()
        # priority queue order: higher priority first, FIFO within a
        # priority level (reference parity: all-zero priorities reduce to
        # pure FIFO)
        frontier = frontier.sort_by([("priority", "descending"),
                                     ("discovered_seq", "ascending")])
        # With mixed priorities the PROCESSING order differs from seq
        # order, and everything downstream (publish-event replay, winner
        # seq assignment) orders by seq — so renumber seqs to processing
        # order.  Skipped when priorities are uniform so reference-parity
        # seq values stay bit-identical to the oracle goldens.
        prio_np = frontier["priority"].to_numpy()
        if frontier.num_rows and (prio_np != prio_np[0]).any():
            new_seqs = np.arange(next_seq, next_seq + frontier.num_rows,
                                 dtype=np.int64)
            next_seq += frontier.num_rows
            frontier = frontier.set_column(
                frontier.schema.get_field_index("discovered_seq"),
                "discovered_seq", pa.array(new_seqs, pa.int64()))
        m = {"round": rnd, "frontier": frontier.num_rows, "fetched": 0,
             "published": 0, "blacklisted": 0, "rejected": 0,
             "requeued": 0, "non_accepted": 0, "deferred": 0,
             "aborted_retries": 0, "extract_aborts": 0,
             "robots_excluded": 0}

        # politeness budget (north rule): per-host cap in seq order.
        # Vectorized (unique codes + grouped cumcount in numpy) — the
        # previous pandas groupby-cumcount was a driver-side per-row pass.
        deferred = _frontier_table([])
        if (cfg.per_host_budget is not None
                or cfg.host_token_budget is not None):
            hosts_np = np.asarray(frontier["host"].to_pylist(),
                                  dtype=object)
            codes, inv = np.unique(hosts_np, return_inverse=True)
            cum = _group_cumcount(inv)
            if cfg.host_token_budget is not None:
                # token bucket with carry-over; a host that 429'd last
                # round gets zero tokens this round (per-host back-off)
                rate = cfg.host_token_budget
                avail = np.empty(len(codes), dtype=np.int64)
                for ci, h in enumerate(codes):
                    if h in self._hosts_429:
                        avail[ci] = 0
                    else:
                        avail[ci] = min(self._host_tokens.get(h, 0) + rate,
                                        2 * rate)
                take_mask = cum < avail[inv]
                taken = np.bincount(inv[take_mask], minlength=len(codes))
                for ci, h in enumerate(codes):
                    self._host_tokens[h] = int(avail[ci] - taken[ci])
                self._hosts_429 = set()  # re-armed from this round
            else:
                take_mask = cum < cfg.per_host_budget
            deferred = frontier.filter(pa.array(~take_mask))
            frontier = frontier.filter(pa.array(take_mask))
            m["deferred"] = deferred.num_rows

        # duplicate-digest lane (sequential semantics for repeated rows)
        dup_mask = _dup_mask(frontier["url_digest"])
        if dup_mask is not None:
            dup_rows = frontier.filter(dup_mask)
            frontier = frontier.filter(pc.invert(dup_mask))
        else:
            dup_rows = None

        # pre-fetch the round's RETRY counters once: only statuses > 1 can
        # trigger the abort gate (with max_retries >= 1), and those exist
        # only for URLs with 5XX history — a tiny per-shard dict, fetched
        # in one fan-out instead of a full-frontier get.  Round-start
        # reads are exactly the semantics the replay design guarantees.
        if self.cfg.max_crawl_retries >= 1:
            high = self._high_counters(now)
            if high:
                digs_all = frontier["url_digest"].to_pylist()
                counts = np.fromiter((high.get(d, 0) for d in digs_all),
                                     dtype=np.int64, count=len(digs_all))
            else:
                counts = np.zeros(frontier.num_rows, dtype=np.int64)
        else:  # pathological config: exact counters needed
            counts = self.seen.get(frontier["url_digest"].to_pylist(), now)
        frontier = frontier.append_column(
            "crawl_count", pa.array(counts, pa.int64()))

        # reset the shards' staging buffers (a failed previous attempt of
        # this round must not leak events into the commit)
        self._clear_staged()

        # fetch + fused extraction; candidates are staged worker->shard
        stage_refs: list = []
        if (self.use_ray and
                frontier.num_rows > self.small_round_threshold):
            self._ensure_pool()
            narrow, extract_aborts, stage_refs = self.pool.run_round(
                frontier, now, os.path.join(rdir, "fetched"))
            if narrow is None:
                narrow, extract_aborts = self._fetch_extract_local(
                    _frontier_table([]), rdir, now, "part-empty")
        else:
            narrow, extract_aborts = self._fetch_extract_local(
                frontier, rdir, now, "part-local")
        if dup_rows is not None:
            dup_fetched = self._run_dup_lane(dup_rows, now)
            pq.write_table(dup_fetched,
                           os.path.join(rdir, "fetched", "part-dup.parquet"))
            dup_narrow = dup_fetched.select(NARROW_COLS)
            narrow = pa.concat_tables([narrow, dup_narrow])
            html = dup_fetched.filter(pc.and_(
                pc.equal(dup_fetched["outcome"], "fetched"),
                pc.equal(dup_fetched["content_type"], "text/html")))
            extract_aborts += self._stage_candidates(
                extract_candidates_batch(
                    html.select(["url", "discovered_seq", "spans"]),
                    cfg, self.allowed_hosts),
                extra_events=derive_fetch_events(dup_narrow))
        outcomes = narrow["outcome"]
        _OUTCOME_METRIC = {
            "fetched": "fetched", "blacklisted": "blacklisted",
            "rejected": "rejected", "requeue_429": "requeued",
            "requeue_5xx": "requeued",
            "acked_non_accepted": "non_accepted",
            "aborted_retries": "aborted_retries",
            "robots_excluded": "robots_excluded"}
        for vc in pc.value_counts(outcomes).to_pylist():
            if vc["values"] == "mirror_rejected":
                # fetched AND rejected, per the reference's accounting
                # (crawl counted in CrawlURL, reject in WriteItemToDisk)
                m["fetched"] += vc["counts"]
                m["rejected"] += vc["counts"]
            else:
                m[_OUTCOME_METRIC[vc["values"]]] += vc["counts"]
        if self.cfg.host_token_budget is not None:
            # per-host 429 signal: these hosts get zero tokens next round
            self._hosts_429 = set(
                narrow.filter(pc.equal(outcomes, "requeue_429"))["host"]
                .to_pylist())
        # per-host fetch counts (north rule: fetch/dedup metrics)
        fetched_hosts = narrow.filter(pc.is_in(
            outcomes,
            value_set=pa.array(["fetched", "mirror_rejected"])))["host"]
        m["_per_host"] = {vc["values"]: vc["counts"]
                         for vc in pc.value_counts(fetched_hosts)
                         .to_pylist()}

        order_t = self._order_table(rnd, narrow)

        m["t_fetch_ms"] = int((_time.perf_counter() - _t0) * 1000)
        _t0 = _time.perf_counter()
        # RESET/INCR fetch events are staged by whoever fetched the rows
        # (pool workers, the local path, or the dup lane) — the driver no
        # longer touches the seen-set event exchange at all
        m["extract_aborts"] = extract_aborts
        m["rejected"] += extract_aborts

        m["t_events_ms"] = int((_time.perf_counter() - _t0) * 1000)
        _t0 = _time.perf_counter()
        # barrier: all worker->shard staging must land before the commit
        if stage_refs:
            import ray

            ray.get(stage_refs)
        # commit: every shard sorts + replays ITS staged events locally
        winners = self._commit_staged(now)
        m["published"] = winners.num_rows

        # assemble next frontier: deferred + requeues + winners (vectorized)
        requeues = narrow.filter(pc.is_in(
            outcomes, value_set=pa.array(["requeue_429", "requeue_5xx"])))
        parts = []
        if deferred.num_rows:
            parts.append(deferred.select(
                ["discovered_seq", "url", "host", "url_digest", "attempt",
                 "priority"]))
        if requeues.num_rows:
            parts.append(pa.table({
                "discovered_seq": requeues["discovered_seq"],
                "url": requeues["url"],
                "host": requeues["host"],
                "url_digest": requeues["url_digest"],
                "attempt": pc.add(requeues["attempt"],
                                  pa.scalar(1, pa.int32())),
                "priority": requeues["priority"],
            }))
        if winners.num_rows:
            worder = pc.sort_indices(winners,
                                     sort_keys=[("parent_seq", "ascending"),
                                                ("link_idx", "ascending")])
            w = winners.take(worder)
            seq_arr = np.arange(next_seq, next_seq + w.num_rows,
                                dtype=np.int64)
            next_seq += w.num_rows
            parts.append(pa.table({
                "discovered_seq": pa.array(seq_arr, pa.int64()),
                "url": w["url"],
                "host": w["host"],
                "url_digest": w["digest"],
                "attempt": pa.array(np.zeros(w.num_rows, np.int32),
                                    pa.int32()),
                # published links enter at default priority (the reference
                # publishes everything at 0, queue_connection.go:129)
                "priority": pa.array(np.zeros(w.num_rows, np.int32),
                                     pa.int32()),
            }))
        next_frontier = (pa.concat_tables(parts) if parts
                         else _frontier_table([]))

        m["t_commit_ms"] = int((_time.perf_counter() - _t0) * 1000)
        _t0 = _time.perf_counter()
        # checkpoint: order always; frontier + seen snapshot + manifest
        # (written LAST = the atomic commit marker) every K rounds and on
        # the final round
        pq.write_table(order_t, os.path.join(rdir, "order.parquet"))
        final = next_frontier.num_rows == 0 or rnd + 1 >= self.cfg.max_rounds
        if final or rnd % self.cfg.checkpoint_every == 0:
            pq.write_table(next_frontier,
                           os.path.join(rdir, "frontier_next.parquet"))
            self.seen.snapshot(os.path.join(rdir, "seen_snapshot"))
            with open(os.path.join(rdir, "manifest.json"), "w") as f:
                json.dump({"round": rnd, "next_seq": next_seq,
                           "metrics": m}, f)
        m["t_ckpt_ms"] = int((_time.perf_counter() - _t0) * 1000)
        return next_frontier, next_seq, m, order_t

    # ------------------------------------------------------------------
    # frontier-on-storage rounds (ROADMAP #1 / the 10^10 scale path)
    # ------------------------------------------------------------------
    def _run_storage(self, seeds: list[str], now: float, resume: bool,
                     seed_priorities: list[int] | None) -> CrawlResult:
        """Round loop where the frontier lives on storage: the driver
        holds only requeue/dup rows and FILE PATHS; winners flow
        shard->parquet with seqs from the ordering-key exchange and are
        fetched as file refs.  Ordering/seen parity with the default
        path is exact (same replay, same global (parent_seq, link_idx)
        seq assignment) — pinned by tests."""
        cfg = self.cfg
        if not self.use_ray:
            raise ValueError("frontier_on_storage requires use_ray=True")
        if cfg.max_crawl_retries < 1:
            raise ValueError("storage rounds use the high-counter "
                             "prefetch (max_crawl_retries >= 1)")
        metrics: list[dict] = []
        driver_rows = seeds_to_frontier(seeds, cfg, seed_priorities)
        parts: list[str] = []
        next_seq = driver_rows.num_rows
        start_round = 0
        if resume:
            st = self._find_checkpoint()
            if st is not None:
                start_round, driver_rows, parts, next_seq, metrics, _ = st
        return self._finish_on_storage(start_round, driver_rows, parts,
                                       next_seq, metrics, now, [])

    def _finish_on_storage(self, rnd: int, driver_rows: pa.Table,
                           parts: list[str], next_seq: int,
                           metrics: list[dict], now: float,
                           order_parts: list[pa.Table],
                           covered_rounds=frozenset()) -> CrawlResult:
        """Storage-mode round loop + result assembly.  Entered from
        round 0 (frontier_on_storage=True), from the AUTO hand-off when
        an in-memory round's frontier outgrows storage_auto_threshold,
        or from a resume whose checkpoint already carried frontier
        parts.  ``order_parts`` holds the order tables of rounds whose
        order was already assembled (in-memory rounds write
        order.parquet); ``covered_rounds`` names them so the storage
        read skips exactly those."""
        cfg = self.cfg
        if not self.use_ray:
            raise ValueError("frontier_on_storage requires use_ray=True")
        while (driver_rows.num_rows > 0 or parts) and rnd < cfg.max_rounds:
            driver_rows, parts, next_seq, m = self._run_round_storage(
                rnd, driver_rows, parts, next_seq,
                now + rnd * cfg.seconds_per_round)
            metrics.append(m)
            rnd += 1
        # order assembly is OUT of the crawl loop: a narrow column read
        # of the per-round fetched parquet (test/golden convenience — at
        # scale consumers read it as a Dataset instead)
        order = self._order_from_storage(
            [r for r in range(rnd) if r not in covered_rounds])
        if order_parts:
            order = pa.concat_tables(order_parts + [order])
        self._write_metrics(metrics)
        self._maybe_compact()
        return CrawlResult(crawl_order=order, metrics=metrics, rounds=rnd,
                           out_dir=self.out_dir, seen=self.seen)

    def _apply_priorities(self, rows: pa.Table, next_seq: int):
        """Storage-mode priority queue, as a SEQ RENUMBER of the few
        prioritized rows instead of a new ordering key.

        Nonzero priorities only ever exist on DRIVER rows (published
        links enter at priority 0, queue_connection.go:129; seeds and
        their requeues are the sole carriers), so the driver rewrites
        just those rows' discovered_seq: priority > 0 rows get fresh
        seqs from a reserved DESCENDING negative range (they sort
        before every part row for every consumer — budget thresholds,
        replay, the rank exchange, order assembly — with zero changes
        to those paths), priority < 0 rows get seqs past next_seq
        (after every current row).  Within a renumbered block the order
        is (priority desc, seq asc), the oracle's processing order.
        Uniform-zero priorities return the rows untouched, keeping
        reference-parity seq values bit-identical to the goldens.

        -> (rows, next_seq) — next_seq is bumped by the priority < 0
        block."""
        pr = rows["priority"].to_numpy()
        if rows.num_rows == 0 or not (pr != 0).any():
            return rows, next_seq
        seqs = rows["discovered_seq"].to_numpy().astype(np.int64).copy()
        for mask, negative in (((pr > 0), True), ((pr < 0), False)):
            k = int(mask.sum())
            if k == 0:
                continue
            idx = np.nonzero(mask)[0]
            order = np.lexsort((seqs[idx], -pr[idx].astype(np.int64)))
            if negative:
                new = np.arange(self._neg_seq - k, self._neg_seq,
                                dtype=np.int64)
                self._neg_seq -= k
            else:
                new = np.arange(next_seq, next_seq + k, dtype=np.int64)
                next_seq += k
            seqs[idx[order]] = new
        rows = rows.set_column(
            rows.schema.get_field_index("discovered_seq"),
            "discovered_seq", pa.array(seqs, pa.int64()))
        return rows, next_seq

    def _storage_budget_gate(self, driver_rows: pa.Table,
                             parts: list[str]):
        """Politeness budgets without materializing the frontier: the
        distributed twin of the in-memory gate (same first-``avail[h]``-
        occurrences-in-seq-order rule, ROADMAP #2).

        Phase 1 fans out ``_part_budget_stats`` tasks — each part
        returns, per host, its row count and its ``cap`` smallest seqs
        (cap bounds any host's budget, so these capped lists contain
        every candidate for the global take set).  Seqs are globally
        unique, so "first avail[h] occurrences in seq order" reduces to
        "seq <= T_h", T_h = the avail[h]-th smallest seq of host h
        across parts AND driver rows — computed driver-side from the
        tiny summaries, immune to the seq interleaving of same-round
        parts from different shards.  Fetch workers apply the
        thresholds as a filter when they read each part (phase 2),
        writing the deferred tail as next-round parts.  Token-bucket
        carry and 429 back-off reuse the exact in-memory accounting.

        -> (taken driver rows, deferred driver rows,
            budget_ctx | None for the worker filter, n_deferred)."""
        import ray

        cfg = self.cfg
        tok = cfg.host_token_budget
        # cap >= any host's possible avail: per_host_budget, or 2x the
        # token rate (the bucket's carry-over ceiling)
        cap = int(cfg.per_host_budget if tok is None else 2 * tok)
        dhosts = driver_rows["host"].to_pylist()
        dseqs_np = (driver_rows["discovered_seq"].to_numpy()
                    .astype(np.int64))
        if parts:
            if self._budget_stats_task is None:
                self._budget_stats_task = \
                    ray.remote(num_cpus=0.25)(_part_budget_stats)
            stats = ray.get([self._budget_stats_task.remote(p, cap)
                             for p in parts])
        else:
            stats = []
        # per-host totals + candidate (capped) seq lists across parts
        # and driver rows — seqs are globally unique, so "first avail[h]
        # occurrences in seq order" == "seq <= the avail[h]-th smallest"
        totals: dict[str, int] = {}
        cands: dict[str, list] = {}
        for st in stats:
            for h, (c, sq) in st.items():
                totals[h] = totals.get(h, 0) + c
                cands.setdefault(h, []).extend(sq)
        for h, s in zip(dhosts, dseqs_np):
            totals[h] = totals.get(h, 0) + 1
            cands.setdefault(h, []).append(int(s))

        def avail(h: str) -> int:
            if tok is not None:
                return 0 if h in self._hosts_429 else \
                    min(self._host_tokens.get(h, 0) + tok, 2 * tok)
            return int(cfg.per_host_budget)

        thresholds: dict[str, int] = {}  # only for hosts over budget
        taken: dict[str, int] = {}
        deferred_n = 0
        for h, total in totals.items():
            a = avail(h)
            if total <= a:
                taken[h] = total
                continue
            taken[h] = a
            deferred_n += total - a
            # "take none" sentinel must sit BELOW every possible seq:
            # priority rows carry negative seqs (_apply_priorities runs
            # before this gate), so -1 would wrongly admit them for a
            # zero-budget (429-backed-off) host
            thresholds[h] = (int(np.partition(
                np.asarray(cands[h], dtype=np.int64), a - 1)[a - 1])
                if a > 0 else int(np.iinfo(np.int64).min))
        if tok is not None:
            # carry-over accounting + re-arm, exactly as the in-memory
            # gate: only hosts present in this round's frontier update
            for h in totals:
                self._host_tokens[h] = int(avail(h) - taken[h])
            self._hosts_429 = set()
        # per-part spec: host -> threshold, only where the part actually
        # has rows past the threshold (capped lists are exhaustive below
        # the threshold, so count > #capped-below means deferral)
        spec_map: dict[str, dict] = {}
        for pi, st in enumerate(stats):
            spec: dict[str, int] = {}
            for h, (c, sq) in st.items():
                t_h = thresholds.get(h)
                if t_h is None:
                    continue
                n_take = int(np.searchsorted(
                    np.asarray(sq, dtype=np.int64), t_h, side="right"))
                if n_take < c:
                    spec[h] = int(t_h)
            if spec:
                spec_map[parts[pi]] = spec
        budget_ctx = spec_map if spec_map else None
        if thresholds:
            thr = np.array([thresholds.get(h, np.iinfo(np.int64).max)
                            for h in dhosts], dtype=np.int64)
            take_driver = dseqs_np <= thr
        else:
            take_driver = np.ones(len(dhosts), dtype=bool)
        tmask = pa.array(take_driver)
        return (driver_rows.filter(tmask),
                driver_rows.filter(pc.invert(tmask)),
                budget_ctx, deferred_n)

    def _run_round_storage(self, rnd: int, driver_rows: pa.Table,
                           parts: list[str], next_seq: int, now: float):
        import time as _time

        import ray

        cfg = self.cfg
        rdir = os.path.join(self.out_dir, f"round={rnd}")
        if os.path.exists(rdir):
            import shutil

            shutil.rmtree(rdir)
        fetched_dir = os.path.join(rdir, "fetched")
        os.makedirs(fetched_dir, exist_ok=True)
        _t0 = _time.perf_counter()
        # part sizes come back with the ph2 paths; the footer read is
        # only the fallback for paths from a resume manifest or the
        # worker-written deferred parts
        part_rows = sum(self._part_rows[p] if p in self._part_rows
                        else pq.read_metadata(p).num_rows
                        for p in parts)
        m = {"round": rnd, "frontier": driver_rows.num_rows + part_rows,
             "fetched": 0, "published": 0, "blacklisted": 0, "rejected": 0,
             "requeued": 0, "non_accepted": 0, "deferred": 0,
             "aborted_retries": 0, "extract_aborts": 0,
             "robots_excluded": 0}
        driver_rows, next_seq = self._apply_priorities(driver_rows,
                                                       next_seq)
        driver_rows = driver_rows.sort_by([("discovered_seq",
                                            "ascending")])
        # politeness gate (before the dup split, matching the in-memory
        # order): driver rows gate here; part rows gate worker-side via
        # the per-(subsegment, host) take spec
        deferred_driver = _frontier_table([])
        budget_ctx = None
        defer_dir = None
        if (cfg.per_host_budget is not None
                or cfg.host_token_budget is not None):
            defer_dir = os.path.join(rdir, "deferred")
            os.makedirs(defer_dir, exist_ok=True)
            (driver_rows, deferred_driver, budget_ctx,
             m["deferred"]) = self._storage_budget_gate(driver_rows, parts)
        # dup-digest lane: only driver rows can repeat a digest (winner
        # parts are replay-unique and commit-time clash extraction pulls
        # winners matching requeued digests back into the driver rows)
        dup_mask = _dup_mask(driver_rows["url_digest"])
        if dup_mask is not None:
            dup_rows = driver_rows.filter(dup_mask)
            driver_rows = driver_rows.filter(pc.invert(dup_mask))
        else:
            dup_rows = None
        high = self._high_counters(now)
        if high:
            cc = np.fromiter((high.get(d, 0)
                              for d in driver_rows["url_digest"]
                              .to_pylist()),
                             dtype=np.int64, count=driver_rows.num_rows)
        else:
            cc = np.zeros(driver_rows.num_rows, dtype=np.int64)
        driver_rows = driver_rows.append_column(
            "crawl_count", pa.array(cc, pa.int64()))
        self._ensure_pool()
        self._clear_staged()
        (counts, host_counts, requeues_n, extract_aborts, stage_refs,
         worker_busy_ms, defer_paths) = \
            self.pool.run_round_storage(driver_rows, parts, now,
                                        fetched_dir, high,
                                        budget_ctx, defer_dir)
        m["t_worker_busy_ms"] = worker_busy_ms
        req_parts = [requeues_n] if requeues_n is not None else []
        if dup_rows is not None:
            dup_fetched = self._run_dup_lane(dup_rows, now)
            pq.write_table(dup_fetched,
                           os.path.join(fetched_dir, "part-dup.parquet"))
            dup_narrow = dup_fetched.select(NARROW_COLS)
            html = dup_fetched.filter(pc.and_(
                pc.equal(dup_fetched["outcome"], "fetched"),
                pc.equal(dup_fetched["content_type"], "text/html")))
            extract_aborts += self._stage_candidates(
                extract_candidates_batch(
                    html.select(["url", "discovered_seq", "spans"]),
                    cfg, self.allowed_hosts),
                extra_events=derive_fetch_events(dup_narrow))
            for vc in pc.value_counts(dup_narrow["outcome"]).to_pylist():
                counts[vc["values"]] = counts.get(vc["values"], 0) + \
                    vc["counts"]
            fh = dup_narrow.filter(pc.is_in(
                dup_narrow["outcome"],
                value_set=pa.array(["fetched", "mirror_rejected"])))
            for vc in pc.value_counts(fh["host"]).to_pylist():
                host_counts[vc["values"]] = \
                    host_counts.get(vc["values"], 0) + vc["counts"]
            req_d = dup_narrow.filter(pc.is_in(
                dup_narrow["outcome"],
                value_set=pa.array(["requeue_429", "requeue_5xx"])))
            if req_d.num_rows:
                req_parts.append(req_d)
        _OUTCOME_METRIC = {
            "fetched": "fetched", "blacklisted": "blacklisted",
            "rejected": "rejected", "requeue_429": "requeued",
            "requeue_5xx": "requeued",
            "acked_non_accepted": "non_accepted",
            "aborted_retries": "aborted_retries",
            "robots_excluded": "robots_excluded"}
        for k, v in counts.items():
            if k == "mirror_rejected":
                m["fetched"] += v
                m["rejected"] += v
            else:
                m[_OUTCOME_METRIC[k]] += v
        m["_per_host"] = host_counts
        m["extract_aborts"] = extract_aborts
        m["rejected"] += extract_aborts
        m["t_fetch_ms"] = int((_time.perf_counter() - _t0) * 1000)
        _t0 = _time.perf_counter()

        # next round's driver rows (requeues) define the clash set
        requeues = (pa.concat_tables(req_parts) if req_parts
                    else None)
        if cfg.host_token_budget is not None:
            # per-host 429 back-off signal (in-memory parity: the 429'd
            # hosts are exactly the requeue_429 rows' hosts)
            self._hosts_429 = (
                set(requeues.filter(
                    pc.equal(requeues["outcome"], "requeue_429"))
                    ["host"].to_pylist())
                if requeues is not None and requeues.num_rows else set())
        if requeues is not None and requeues.num_rows:
            req_frontier = pa.table({
                "discovered_seq": requeues["discovered_seq"],
                "url": requeues["url"],
                "host": requeues["host"],
                "url_digest": requeues["url_digest"],
                "attempt": pc.add(requeues["attempt"],
                                  pa.scalar(1, pa.int32())),
                "priority": requeues["priority"],
            })
        else:
            req_frontier = _frontier_table([])
        clash = set(req_frontier["url_digest"].to_pylist())
        # deferred driver rows are next-round driver rows too: winners
        # sharing their digest (TTL-expiry republish edge) must come back
        # driver-side so the dup lane sees every copy
        clash.update(deferred_driver["url_digest"].to_pylist())

        # barrier: staging must land, then the two-phase exchange commit
        _tb = _time.perf_counter()
        staged_rows = sum(ray.get(stage_refs)) if stage_refs else 0
        m["t_barrier_ms"] = int((_time.perf_counter() - _tb) * 1000)
        _tb = _time.perf_counter()
        shards = self.seen.shards
        S = len(shards)
        # partition count ADAPTS to this round's staged volume: the
        # exchange costs O(S*P) object-store ops of pure fixed overhead
        # (ray.put per ph1 cell, one return object per rank cell), which
        # at P == S == 16 was ~1 s/round even for EMPTY rounds — more
        # commit time than the crawl itself in retry-tail rounds.  A
        # 256k-key single-owner merge is ~20 ms of numpy, so small
        # rounds take P == 1; P grows back to S when a round stages
        # enough keys that the merge itself needs to parallelize.
        P = int(np.clip(-(-staged_rows // 262144), 1, S))
        boundaries = np.linspace(0, max(next_seq, 1),
                                 P + 1)[1:-1].astype(np.int64)
        ph1 = ray.get([s.commit_phase1.remote(now, boundaries, True)
                       for s in shards])
        m["t_ph1_ms"] = int((_time.perf_counter() - _tb) * 1000)
        _tb = _time.perf_counter()
        hist = np.stack([c for c, _ in ph1])          # (S, P) counts
        key_refs = [refs for _, refs in ph1]          # [S][P] refs
        part_totals = hist.sum(axis=0)
        part_starts = np.concatenate(
            ([0], np.cumsum(part_totals)[:-1]))
        # winner-part file size, adapted to THIS round's winner count:
        # a fixed fetch_batch_size makes each part a ~0.5s work item and
        # next round's fetch phase runs at ~50% utilization on wide
        # pools (measured: 23.7s busy / 3.2s wall / 16 workers, round 6
        # of the 1M-page bench).  Target ~6 parts per fetch worker so
        # the ray.wait work-stealing dispatch can balance stragglers.
        total_winners_est = int(part_totals.sum())
        part_rows_target = int(np.clip(
            -(-total_winners_est // max(1, cfg.crawler_threads * 6)),
            512, cfg.fetch_batch_size))
        # rank_refs[p] is a list of S refs (one per shard); Ray returns a
        # BARE ref (not a tuple) when num_returns == 1, so wrap for S == 1
        rank_refs = []
        for p in range(P):
            # rotate owner by round so P == 1 (small rounds) doesn't pin
            # every merge on shard 0
            r = (shards[(p + rnd) % S].rank_partition
                 .options(num_returns=S)
                 .remote([key_refs[s][p] for s in range(S)]))
            rank_refs.append([r] if S == 1 else r)
        frontier_dir = os.path.join(rdir, "frontier")
        # clash set ships once through the object store, not once per
        # shard RPC (top-level args are auto-resolved actor-side)
        clash_arg = ray.put(clash) if len(clash) > 256 else clash
        # shards whose ph1 saw zero winners have nothing to rank, split,
        # or write — skip their phase2 RPC (the retry tail is many
        # near-empty rounds and the fixed S RPCs added up)
        live = [s for s in range(S) if hist[s].sum() > 0]
        ph2 = ray.get([
            shards[s].commit_phase2.remote(
                next_seq, part_starts.tolist(),
                [rank_refs[p][s] for p in range(P)],
                clash_arg, frontier_dir, part_rows_target,
                f"part-s{s:03d}")
            for s in live])
        m["t_ph2_ms"] = int((_time.perf_counter() - _tb) * 1000)
        new_parts: list[str] = []
        clash_tables: list[pa.Table] = []
        total_winners = 0
        for paths, path_rows, clash_t, n_w in ph2:
            new_parts.extend(paths)
            self._part_rows.update(zip(paths, path_rows))
            if clash_t.num_rows:
                clash_tables.append(clash_t)
            total_winners += n_w
        m["published"] = total_winners
        new_parts.extend(defer_paths)
        # prune: only live (next-round) parts need their size cached
        self._part_rows = {p: self._part_rows[p] for p in new_parts
                           if p in self._part_rows}
        dd_parts = ([deferred_driver.select(
            ["discovered_seq", "url", "host", "url_digest", "attempt",
             "priority"])] if deferred_driver.num_rows else [])
        next_driver = pa.concat_tables(
            [req_frontier] + clash_tables + dd_parts) if (
                req_frontier.num_rows or clash_tables or dd_parts) \
            else _frontier_table([])
        next_seq += total_winners
        m["t_commit_ms"] = int((_time.perf_counter() - _t0) * 1000)
        _t0 = _time.perf_counter()
        final = (next_driver.num_rows == 0 and not new_parts) or \
            rnd + 1 >= cfg.max_rounds
        if final or rnd % cfg.checkpoint_every == 0:
            pq.write_table(next_driver,
                           os.path.join(rdir, "frontier_next.parquet"))
            self.seen.snapshot(os.path.join(rdir, "seen_snapshot"))
            with open(os.path.join(rdir, "manifest.json"), "w") as f:
                json.dump({"round": rnd, "next_seq": next_seq,
                           "neg_seq": self._neg_seq,
                           "metrics": m,
                           "frontier_parts": new_parts}, f)
        m["t_ckpt_ms"] = int((_time.perf_counter() - _t0) * 1000)
        return next_driver, new_parts, next_seq, m

    def _order_from_storage(self, rounds) -> pa.Table:
        # a compaction crash can leave a completed round's parts under
        # fetched.old only — restore BEFORE the missing-dir skip below,
        # or resume would silently drop that round from crawl_order
        from .sink import restore_crashed_rounds

        restore_crashed_rounds(self.out_dir)
        parts = []
        for k in rounds:
            fdir = os.path.join(self.out_dir, f"round={k}", "fetched")
            if not os.path.isdir(fdir):
                continue
            ds = pads.dataset(fdir, format="parquet")
            t = ds.to_table(
                columns=["url", "discovered_seq", "outcome"],
                filter=pc.field("outcome").isin(["fetched",
                                                 "mirror_rejected"]))
            t = t.sort_by([("discovered_seq", "ascending")])
            parts.append(pa.table({
                "round": pa.array([k] * t.num_rows, pa.int32()),
                "seq": t["discovered_seq"],
                "url": t["url"],
            }))
        if not parts:
            return pa.table({"round": pa.array([], pa.int32()),
                             "seq": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    def _ensure_pool(self) -> None:
        if self.pool is None:
            # persistent across rounds: spawn cost paid once per crawl
            self.pool = FetchWorkerPool(self.corpus_ref, self.cfg,
                                        self.seen.shards,
                                        self.allowed_hosts,
                                        size=self.cfg.crawler_threads)

    # ------------------------------------------------------------------
    def _fetch_extract_local(self, frontier: pa.Table, rdir: str,
                             now: float, part: str):
        """Driver-side fused fetch+write+extract (same code path the pool
        workers run) for rounds too small to amortize dispatch."""
        fetched = self._local_fetcher(frontier, now=now)
        pq.write_table(fetched,
                       os.path.join(rdir, "fetched", f"{part}.parquet"))
        html = fetched.filter(pc.and_(
            pc.equal(fetched["outcome"], "fetched"),
            pc.equal(fetched["content_type"], "text/html")))
        narrow = fetched.select(NARROW_COLS)
        cands = extract_candidates_batch(
            html.select(["url", "discovered_seq", "spans"]),
            self.cfg, self.allowed_hosts)
        aborts = self._stage_candidates(
            cands, extra_events=derive_fetch_events(narrow))
        return narrow, aborts

    def _stage_candidates(self, cands: pa.Table,
                          extra_events: pa.Table | None = None) -> int:
        """Stage attempt rows (+ any RESET/INCR fetch events) to their
        shards; returns the abort count."""
        aborts = int(pc.sum(pc.cast(pc.equal(cands["kind"], -1),
                                    pa.int32())).as_py() or 0)
        events = cands.filter(pc.equal(cands["kind"], EV_ATTEMPT))
        if extra_events is not None and extra_events.num_rows:
            events = pa.concat_tables([events, extra_events])
        stage_events_to_shards(events, self.seen.shards, self.seen.remote)
        return aborts

    def _high_counters(self, now: float) -> dict:
        if self.seen.remote:
            import ray

            parts = ray.get([s.high_counters.remote(now)
                             for s in self.seen.shards])
        else:
            parts = [s.high_counters(now) for s in self.seen.shards]
        out: dict = {}
        for p in parts:
            out.update(p)
        return out

    def _clear_staged(self) -> None:
        if self.seen.remote:
            import ray

            ray.get([s.clear_staged.remote() for s in self.seen.shards])
        else:
            for s in self.seen.shards:
                s.clear_staged()

    def _commit_staged(self, now: float) -> pa.Table:
        """Trigger every shard's local sort+replay of its staged events;
        gather only the (narrow, small) winner rows."""
        if self.seen.remote:
            import ray

            tables = ray.get([s.commit_staged.remote(now)
                              for s in self.seen.shards])
        else:
            tables = [s.commit_staged(now) for s in self.seen.shards]
        return pa.concat_tables(tables)

    # ------------------------------------------------------------------
    def _run_dup_lane(self, rows: pa.Table, now: float):
        """Sequential scalar lane for same-digest frontier duplicates:
        reproduces fetch-time counter visibility (a Get observing an
        earlier same-round INCR of the same digest, workflow.go:86,107).
        Only the retry-abort decision needs re-deriving sequentially; all
        other per-row outcomes from the vectorized fetch are positionally
        independent.  INCR events are NOT emitted here — the narrow
        read-back derives them from the outcome column."""
        cfg = self.cfg
        fetched = self._local_fetcher(rows, now=now)
        order = pc.sort_indices(fetched,
                                sort_keys=[("discovered_seq", "ascending")])
        fetched = fetched.take(order)
        digs = fetched["url_digest"].to_pylist()
        outcomes = fetched["outcome"].to_pylist()
        uniq = sorted(set(digs))
        base = {d: int(c) for d, c in zip(uniq, self.seen.get(uniq, now))}
        delta: dict[str, int] = {}
        new_outcomes = list(outcomes)
        for i, d in enumerate(digs):
            if outcomes[i] in ("blacklisted", "rejected"):
                continue
            if base[d] + delta.get(d, 0) > cfg.max_crawl_retries:
                new_outcomes[i] = "aborted_retries"
                continue
            if outcomes[i] == "requeue_5xx":
                delta[d] = delta.get(d, 0) + 1
        fetched = fetched.set_column(
            fetched.schema.get_field_index("outcome"), "outcome",
            pa.array(new_outcomes, pa.string()))
        return fetched

    # ------------------------------------------------------------------
    def _order_table(self, rnd: int, narrow: pa.Table) -> pa.Table:
        f = narrow.filter(pc.is_in(
            narrow["outcome"],
            value_set=pa.array(["fetched", "mirror_rejected"])))
        # processing order within a round: priority desc, then FIFO
        f = f.take(pc.sort_indices(f, sort_keys=[
            ("priority", "descending"), ("discovered_seq", "ascending")]))
        return pa.table({
            "round": pa.array([rnd] * f.num_rows, pa.int32()),
            "seq": f["discovered_seq"],
            "url": f["url"],
        })

    def _write_metrics(self, metrics: list[dict]) -> None:
        if not metrics:
            return
        rows = []
        for m in metrics:
            for k, v in m.items():
                if k == "round":
                    continue
                if k == "_per_host":
                    for host, n in v.items():
                        rows.append({"round": m["round"],
                                     "metric": "fetched_by_host",
                                     "key": host, "value": int(n)})
                    continue
                rows.append({"round": m["round"], "metric": k, "key": "",
                             "value": int(v)})
        pq.write_table(pa.Table.from_pylist(rows),
                       os.path.join(self.out_dir, "metrics.parquet"))

    def _find_checkpoint(self):
        rounds = []
        for d in os.listdir(self.out_dir):
            if d.startswith("round=") and os.path.exists(
                    os.path.join(self.out_dir, d, "manifest.json")):
                rounds.append(int(d.split("=")[1]))
        if not rounds:
            return None
        k = max(rounds)
        rdir = os.path.join(self.out_dir, f"round={k}")
        with open(os.path.join(rdir, "manifest.json")) as f:
            man = json.load(f)
        frontier = pq.read_table(os.path.join(rdir, "frontier_next.parquet"))
        self.seen.load(os.path.join(rdir, "seen_snapshot"))
        self._neg_seq = man.get("neg_seq", 0)
        metrics = []
        for j in range(k + 1):
            mp = os.path.join(self.out_dir, f"round={j}", "manifest.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    metrics.append(json.load(f)["metrics"])
        # storage manifests always carry "frontier_parts" (possibly
        # empty: a retry-tail round can stage zero winners) — its
        # PRESENCE is the mode marker, not its truthiness, so a resume
        # never falls back to the in-memory loop and silently drops the
        # storage rounds from crawl_order
        return (k + 1, frontier, man.get("frontier_parts", []),
                man["next_seq"], metrics, "frontier_parts" in man)

    def shutdown(self) -> None:
        if self.pool is not None:
            self.pool.shutdown()
        self.seen.shutdown()


def _allowed_hosts(cfg: CrawlConfig) -> list[str]:
    out = []
    for r in cfg.root_urls:
        p = parse_url(r)
        if p is not None:
            out.append(netloc_host(p.netloc))
    return out


def _group_cumcount(codes: np.ndarray) -> np.ndarray:
    """Per-group 0-based position in ORIGINAL row order (the numpy
    equivalent of pandas groupby().cumcount()), O(n log n), no driver
    row loop."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    is_new = np.ones(n, dtype=bool)
    is_new[1:] = sorted_codes[1:] != sorted_codes[:-1]
    run_starts = np.nonzero(is_new)[0]
    run_ids = np.cumsum(is_new) - 1
    pos_sorted = np.arange(n) - run_starts[run_ids]
    out = np.empty(n, dtype=np.int64)
    out[order] = pos_sorted
    return out


def _dup_mask(digests: pa.ChunkedArray):
    """Boolean mask of rows whose digest repeats in the frontier, or
    None when there are none.  Vectorized on the 64-bit digest prefix
    (a prefix collision only routes extra rows into the sequential
    dup lane, which is semantics-preserving) — the previous per-row
    Python set scan was an O(frontier) driver loop per round."""
    from ..state.seen_set import keys_u64

    n = len(digests)
    if n == 0:
        return None
    keys = keys_u64(digests.to_pylist())
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    same = np.zeros(n, dtype=bool)
    same[1:] = ks[1:] == ks[:-1]
    dup_sorted = same.copy()
    dup_sorted[:-1] |= same[1:]
    if not dup_sorted.any():
        return None
    mask = np.empty(n, dtype=bool)
    mask[order] = dup_sorted
    return pa.array(mask)


def _empty_events() -> pa.Table:
    return pa.table({
        "digest": pa.array([], pa.string()),
        "url": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "parent_seq": pa.array([], pa.int64()),
        "link_idx": pa.array([], pa.int32()),
        "kind": pa.array([], pa.int8()),
        "key_u64": pa.array([], pa.uint64()),
    })


def _dataset_to_table(ds) -> pa.Table:
    """Collect a (narrow) Dataset to one Arrow table on the driver."""
    batches = []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        batches.append(b)
    if not batches:
        return _empty_events()
    return pa.concat_tables(batches, promote_options="permissive")


def run_crawl(corpus: pa.Table, seeds: list[str], cfg: CrawlConfig,
              out_dir: str, use_ray: bool = True,
              small_round_threshold: int = 0,
              resume: bool = False, now: float = 0.0,
              seed_priorities: list[int] | None = None) -> CrawlResult:
    eng = CrawlEngine(corpus, cfg, out_dir, use_ray=use_ray,
                      small_round_threshold=small_round_threshold)
    return eng.run(seeds, now=now, resume=resume,
                   seed_priorities=seed_priorities)
