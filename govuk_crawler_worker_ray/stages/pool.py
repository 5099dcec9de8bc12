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


class FetchWorker:
    """One pool member (plain class; wrapped by ray.remote in the pool)."""

    def __init__(self, corpus_ref, cfg: CrawlConfig, seen_shards,
                 allowed_hosts: list[str]) -> None:
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
        cls = ray.remote(num_cpus=0.5, max_restarts=0)(FetchWorker)
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

    def shutdown(self) -> None:
        import ray

        for w in self.workers:
            ray.kill(w)
        self.workers = []
