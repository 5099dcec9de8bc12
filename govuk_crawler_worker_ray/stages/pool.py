"""Persistent fetch-worker pool for the round-based crawl loop.

Why not ``map_batches(FetchStage, ...)`` per round: Ray Data creates a
NEW actor pool for every ``map_batches`` call, and the crawl loop is
iterative — pool spawn + imports (~seconds) would be paid every round.
Stateful actors that persist ACROSS dataset executions are exactly the
case where the Dataset API can't express the semantics (SURVEY.md §7.0),
so the fetch stage is a pool of long-lived actors created once per
crawl; each worker holds the FetchStage (broadcast corpus index + config
+ seen-set handles) and fuses P2 fetch + P3 mirror-write + P4 extraction
in a single pass over its batch:

  frontier chunk -> gates+fetch -> write own parquet part (bodies leave
  the worker exactly once, straight to the round's mirror partition) ->
  extract narrow publish candidates -> return (narrow outcomes,
  candidates) to the driver.

Bodies/spans therefore never cross to the driver and never enter a
shuffle; only narrow rows travel.  Chunks are dispatched in bounded
waves (2 per worker) for backpressure.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import CrawlConfig
from .fetch import FetchStage
from .publish import (
    derive_fetch_events,
    extract_candidates_batch,
    stage_events_to_shards,
)

NARROW_COLS = ["url", "host", "url_digest", "discovered_seq", "attempt",
               "priority", "outcome"]


def _apply_budget_filter(t: pa.Table, spec: dict):
    """Politeness phase 2 for ONE frontier part: split into (take,
    defer) by the driver-computed per-host threshold seqs — a row is
    taken iff ``seq <= spec[host]`` (hosts absent from the spec are
    taken whole).  Seqs are globally unique, so the threshold rule is
    exactly the in-memory gate's first-``avail[h]``-occurrences-in-seq-
    order rule, and is immune to the seq interleaving of same-round
    parts written by different shards."""
    import numpy as np

    seqs = t["discovered_seq"].to_numpy()
    henc = t["host"].combine_chunks().dictionary_encode()
    hc = henc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hnames = henc.dictionary.to_pylist()
    hi = np.iinfo(np.int64).max
    thr = np.array([spec.get(h, hi) for h in hnames], dtype=np.int64)
    mask = pa.array(seqs <= thr[hc])
    return t.filter(mask), t.filter(pc.invert(mask))


class FetchWorker:
    """One pool member (plain class; wrapped by ray.remote in the pool)."""

    def __init__(self, corpus_ref, cfg: CrawlConfig, seen_shards,
                 allowed_hosts: list[str]) -> None:
        from ..state.malloc_tune import tune_malloc

        tune_malloc()
        self.stage = FetchStage(corpus_ref, cfg, seen_shards)
        self.cfg = cfg
        self.allowed_hosts = allowed_hosts

    def _one_chunk(self, batch: pa.Table, now: float,
                   out_path: str | None) -> tuple[pa.Table, pa.Table]:
        fetched = self.stage(batch, now=now)
        if out_path is not None:
            pq.write_table(fetched, out_path)
        narrow = fetched.select(NARROW_COLS)
        html = fetched.filter(pc.and_(
            pc.equal(fetched["outcome"], "fetched"),
            pc.equal(fetched["content_type"], "text/html")))
        cands = extract_candidates_batch(
            html.select(["url", "discovered_seq", "spans"]),
            self.cfg, self.allowed_hosts)
        return narrow, cands

    def process_many(self, chunks: list[pa.Table], now: float,
                     out_paths: list[str]) -> tuple[pa.Table, int, list]:
        """Process this worker's WHOLE round allocation in one RPC:
        per-chunk fetch+write+extract, then ONE staging message per shard
        for all the worker's events — publish attempts AND the rows' own
        RESET/INCR fetch events (per-chunk RPCs dominated the fetch phase
        at 100+ chunks/round; worker-side event derivation keeps the
        driver out of the seen-set exchange entirely).  The staging refs
        travel back so the driver can barrier before the round commit."""
        narrows: list[pa.Table] = []
        ev_parts: list[pa.Table] = []
        aborts = 0
        for chunk, path in zip(chunks, out_paths):
            n, c = self._one_chunk(chunk, now, path)
            narrows.append(n)
            aborts += int(pc.sum(pc.cast(pc.equal(c["kind"], -1),
                                         pa.int32())).as_py() or 0)
            ev_parts.append(c.filter(pc.equal(c["kind"], 0)))
            ev_parts.append(derive_fetch_events(n))
        events = pa.concat_tables(ev_parts) if ev_parts else None
        if events is None or events.num_rows == 0:
            return (pa.concat_tables(narrows) if narrows else None,
                    aborts, [])
        stage_refs = stage_events_to_shards(events,
                                            self.stage.seen.shards,
                                            remote=self.stage.seen.remote,
                                            block=False)
        return pa.concat_tables(narrows), aborts, stage_refs

    def process_round_storage(self, tables: list[pa.Table],
                              table_paths: list[str], files: list[str],
                              fetched_dir: str, now: float,
                              high, budget=None,
                              defer_dir: str | None = None) -> tuple:
        """Frontier-on-storage round work (ROADMAP #1): chunks arrive as
        in-memory tables (driver rows) or as FRONTIER PARQUET PART PATHS
        (shard-written winners; the rows never touched the driver).  The
        narrow per-row outcome table also stays here — only outcome
        COUNTS, per-host fetched counts, and the (small) requeue rows
        travel back."""
        import time as _time

        import numpy as np

        prof = None
        if os.environ.get("GCW_PROFILE_WORKER") == "1":
            import cProfile

            prof = cProfile.Profile()
            prof.enable()
        _t0 = _time.perf_counter()
        if isinstance(high, list):
            # [ObjectRef]: the O(5xx/429-history) dict ships ONCE per
            # round via ray.put — inlining it re-serialized it into
            # every work-stealing RPC (O(high x groups) driver-side
            # pickling); the list wrapper defeats Ray's auto-deref so
            # each worker can also UNPICKLE it once per round
            import ray

            cached = getattr(self, "_high_cache", None)
            if cached is None or cached[0] != high[0]:
                cached = (high[0], ray.get(high[0]))
                self._high_cache = cached
            high = cached[1]
        counts: dict[str, int] = {}
        host_counts: dict[str, int] = {}
        req_parts: list[pa.Table] = []
        ev_parts: list[pa.Table] = []
        aborts = 0

        def handle(chunk: pa.Table, path: str) -> None:
            nonlocal aborts
            fetched = self.stage(chunk, now=now)
            pq.write_table(fetched, path)
            narrow = fetched.select(NARROW_COLS)
            html = fetched.filter(pc.and_(
                pc.equal(fetched["outcome"], "fetched"),
                pc.equal(fetched["content_type"], "text/html")))
            c = extract_candidates_batch(
                html.select(["url", "discovered_seq", "spans"]),
                self.cfg, self.allowed_hosts)
            aborts += int(pc.sum(pc.cast(pc.equal(c["kind"], -1),
                                         pa.int32())).as_py() or 0)
            ev_parts.append(c.filter(pc.equal(c["kind"], 0)))
            ev_parts.append(derive_fetch_events(narrow))
            for vc in pc.value_counts(narrow["outcome"]).to_pylist():
                counts[vc["values"]] = counts.get(vc["values"], 0) + \
                    vc["counts"]
            fh = narrow.filter(pc.is_in(
                narrow["outcome"],
                value_set=pa.array(["fetched", "mirror_rejected"])))
            for vc in pc.value_counts(fh["host"]).to_pylist():
                host_counts[vc["values"]] = \
                    host_counts.get(vc["values"], 0) + vc["counts"]
            req = narrow.filter(pc.is_in(
                narrow["outcome"],
                value_set=pa.array(["requeue_429", "requeue_5xx"])))
            if req.num_rows:
                req_parts.append(req)

        defer_paths: list[str] = []
        for chunk, path in zip(tables, table_paths):
            handle(chunk, path)
        for fp in files:
            # use_threads=False: every pool actor reading with the
            # default full-size Arrow thread pool oversubscribes the
            # node (16 actors x 32 threads); the files are single
            # row-group narrow parts — one thread is optimal
            t = pq.read_table(fp, use_threads=False, memory_map=True)
            if budget is not None:
                spec = budget.get(fp)
                if spec is not None:
                    t, deferred = _apply_budget_filter(t, spec)
                    if deferred.num_rows:
                        dpath = os.path.join(
                            defer_dir, "defer-" + os.path.basename(fp))
                        pq.write_table(deferred, dpath)
                        defer_paths.append(dpath)
            digs = t["url_digest"].to_pylist()
            if high:
                cc = np.fromiter((high.get(d, 0) for d in digs),
                                 dtype=np.int64, count=len(digs))
            else:
                cc = np.zeros(t.num_rows, dtype=np.int64)
            t = t.append_column("crawl_count", pa.array(cc, pa.int64()))
            handle(t, os.path.join(
                fetched_dir, "part-" + os.path.basename(fp)))

        events = pa.concat_tables(ev_parts) if ev_parts else None
        stage_refs = []
        if events is not None and events.num_rows:
            stage_refs = stage_events_to_shards(
                events, self.stage.seen.shards,
                remote=self.stage.seen.remote, block=False)
        requeues = (pa.concat_tables(req_parts) if req_parts else None)
        busy_ms = int((_time.perf_counter() - _t0) * 1000)
        if prof is not None:
            prof.disable()
            os.makedirs("/tmp/gcw_prof", exist_ok=True)
            prof.dump_stats(
                f"/tmp/gcw_prof/worker_{os.getpid()}_{busy_ms}.prof")
        return (counts, host_counts, requeues, aborts, stage_refs,
                busy_ms, defer_paths)

    def ping(self) -> bool:
        return True


class FetchWorkerPool:
    """Driver-side handle: splits a frontier table into chunks, dispatches
    them round-robin in bounded waves, gathers narrow results."""

    def __init__(self, corpus_ref, cfg: CrawlConfig, seen_shards,
                 allowed_hosts: list[str], size: int) -> None:
        import ray

        # max_restarts=0: recovery is per-round re-execution from the
        # checkpoint manifest, not actor restart (ctor args are borrowed
        # object-store refs that a restart could lose).
        # num_cpus=0.5 so pool + seen shards co-schedule on small sessions
        # (workers block on shard RPCs part of the time anyway).
        # SPREAD: on a multi-node cluster fetch workers balance across
        # nodes (each node fetches against its local object-store copy
        # of the corpus ref); on one node it is a no-op.
        cls = ray.remote(num_cpus=0.5, max_restarts=0,
                         scheduling_strategy="SPREAD")(FetchWorker)
        self.workers = [cls.remote(corpus_ref, cfg, seen_shards,
                                   allowed_hosts) for _ in range(size)]
        self.size = size
        self.cfg = cfg
        # warm the pool (imports, corpus ray.get) before the first round
        ray.get([w.ping.remote() for w in self.workers])

    def run_round(self, frontier: pa.Table, now: float,
                  out_dir: str) -> tuple[pa.Table, int, list]:
        """-> (narrow outcomes, extract-abort count, staging refs).

        Publish candidates are staged worker->shard and never reach the
        driver; the caller must ray.get the staging refs before the round
        commit.  All chunks are submitted upfront — actors process their
        queues in order, so the driver does no per-completion churn."""
        import ray

        # split so every worker gets ~2 chunks (pipelining), capped by the
        # configured batch size; floor keeps tiny rounds in few chunks
        n = frontier.num_rows
        bs = min(self.cfg.fetch_batch_size,
                 max(512, -(-n // (4 * self.size))))
        chunks = [frontier.slice(o, bs) for o in range(0, n, bs)]
        # ONE RPC per worker per round: worker i gets chunks i, i+W, ...
        refs = []
        for wi, w in enumerate(self.workers):
            my = list(range(wi, len(chunks), self.size))
            if not my:
                continue
            my_chunks = [chunks[ci] for ci in my]
            my_paths = [os.path.join(out_dir, f"part-{ci:06d}.parquet")
                        for ci in my]
            refs.append(w.process_many.remote(my_chunks, now, my_paths))
        results = [r for r in ray.get(refs) if r[0] is not None]
        if not results:
            return None, 0, []
        narrows = [r[0] for r in results]
        aborts = sum(r[1] for r in results)
        stage_refs = [ref for r in results for ref in r[2]]
        return (pa.concat_tables(narrows), aborts, stage_refs)

    def run_round_storage(self, driver_rows: pa.Table, files: list[str],
                          now: float, fetched_dir: str,
                          high: dict, budget_ctx=None,
                          defer_dir: str | None = None) -> tuple:
        import ray as _ray

        high_ref = [_ray.put(high)] if high else {}
        """Storage-mode dispatch: driver rows go out as table chunks,
        shard-written frontier parts as file refs; results are merged
        outcome/host counts + requeue rows + staging refs + deferred-
        part paths (politeness; ``budget_ctx`` = (driver seqs, per-part
        take specs) from the driver's budget walk)."""
        import ray

        n = driver_rows.num_rows
        bs = self.cfg.fetch_batch_size
        chunks = [driver_rows.slice(o, bs) for o in range(0, n, bs)]
        # work items: (table, out_path) or file path
        items: list = [
            (chunks[ci],
             os.path.join(fetched_dir, f"part-d{ci:06d}.parquet"))
            for ci in range(len(chunks))] + list(files)
        # DYNAMIC dispatch in small groups via ray.wait (work stealing):
        # one big RPC per worker makes the whole round wait on the
        # slowest worker — on a steal-prone host one straggler was
        # regularly 5-10x the median round time
        group = max(1, len(items) // (self.size * 3))
        groups = [items[i:i + group] for i in range(0, len(items), group)]
        counts: dict[str, int] = {}
        host_counts: dict[str, int] = {}
        req_parts: list[pa.Table] = []
        aborts = 0
        stage_refs: list = []
        defer_paths: list[str] = []

        def submit(w, g):
            tabs = [it[0] for it in g if isinstance(it, tuple)]
            paths = [it[1] for it in g if isinstance(it, tuple)]
            fls = [it for it in g if not isinstance(it, tuple)]
            bud = None
            if budget_ctx is not None and fls:
                sub = {f: budget_ctx[f] for f in fls if f in budget_ctx}
                if sub:
                    bud = sub
            return w.process_round_storage.remote(tabs, paths, fls,
                                                  fetched_dir, now,
                                                  high_ref, bud, defer_dir)

        from collections import deque

        gq = deque(groups)
        idle = deque(self.workers)
        inflight: dict = {}
        busy_ms = 0
        while gq or inflight:
            while gq and idle:
                w = idle.popleft()
                inflight[submit(w, gq.popleft())] = w
            if not inflight:
                break
            done, _ = ray.wait(list(inflight), num_returns=1)
            for r in done:
                idle.append(inflight.pop(r))
                c, hc, req, ab, sr, bm, dp = ray.get(r)
                for k, v in c.items():
                    counts[k] = counts.get(k, 0) + v
                for k, v in hc.items():
                    host_counts[k] = host_counts.get(k, 0) + v
                if req is not None:
                    req_parts.append(req)
                aborts += ab
                stage_refs.extend(sr)
                busy_ms += bm
                defer_paths.extend(dp)
        requeues = pa.concat_tables(req_parts) if req_parts else None
        return (counts, host_counts, requeues, aborts, stage_refs,
                busy_ms, defer_paths)

    def shutdown(self) -> None:
        import ray

        for w in self.workers:
            ray.kill(w)
        self.workers = []
