"""The fetch stage (P2 CrawlURL, /root/reference/workflow.go:57-151) as a
Ray Data actor-pool ``map_batches`` class.

In this sandbox there is no network: the "origin" is the synthetic corpus
table, broadcast ONCE via ``ray.put`` and shared zero-copy by every
fetch actor (a real deployment swaps ``CorpusIndex.lookup`` for an HTTP
client with the same status-dispatch semantics —
http_crawler/crawler.go:50-127).

Also applies, per row, the gates that surround the fetch in the
reference pipeline: blacklist (P1, workflow.go:40-44), parse gate
(workflow.go:79-83), retry-abort (workflow.go:93-98, reading the seen
counter), host allow-list (crawler.go:55-57), content-type acceptance
(workflow.go:129-140) and the mirror path (P3, workflow.go:162-183).

Seen-set MUTATIONS do not happen here — they are replayed atomically at
round commit (see stages/publish.py) so that re-executed fetch tasks
stay side-effect free (Ray task retries must be safe).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import CrawlConfig
from ..functions.content_types import ACCEPTED_CONTENT_TYPES, HTML, \
    parse_content_type
from ..functions.redirects import is_redirect, synthesize_redirect_body
from ..functions.urls import (
    has_params,
    host_only,
    is_blacklisted,
    netloc_host,
    parse_url,
    relative_file_path,
)

_H64 = np.uint64


def _url_keys(urls: list[str]) -> np.ndarray:
    """Stable 64-bit keys for exact-URL lookup (md5 prefix; NOT the
    seen-set digest — just an index key)."""
    return np.array(
        [int.from_bytes(hashlib.md5(u.encode("utf-8", "surrogatepass"))
                        .digest()[:8], "big") for u in urls],
        dtype=_H64)


class CorpusIndex:
    """Immutable sorted-key index over the corpus table.

    Built once on the driver, ``ray.put`` once; numpy/Arrow members are
    zero-copy views into the shared object-store buffer in every actor.
    """

    def __init__(self, corpus: pa.Table) -> None:
        self.table = corpus.combine_chunks()
        urls = self.table["url"].to_pylist()  # transient (driver build)
        keys = _url_keys(urls)
        order = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[order]
        self.sorted_rows = order.astype(np.int64)
        # Arrow column, NOT a Python list: a list of 10^6 str objects
        # deserializes per actor (~150MB heap each + GC scan pressure);
        # the Arrow buffer stays zero-copy in the object store
        self.url_col = self.table["url"].combine_chunks()
        self.status = self.table["status_code"].to_numpy().astype(np.int16)
        self.transient = self.table["transient"].to_numpy(
            zero_copy_only=False)
        # single-chunk column handles for zero-copy row gathers
        self.spans_col = self.table["spans"].combine_chunks()
        self.body_col = self.table["body"].combine_chunks()
        self.ct_col = self.table["content_type"].combine_chunks()

    def lookup(self, urls: list[str]) -> np.ndarray:
        """-> row index per url, -1 when absent (connection error)."""
        if not urls:
            return np.empty(0, dtype=np.int64)
        keys = _url_keys(urls)
        pos = np.searchsorted(self.sorted_keys, keys)
        pos_c = np.clip(pos, 0, len(self.sorted_keys) - 1)
        hit = self.sorted_keys[pos_c] == keys
        rows = np.where(hit, self.sorted_rows[pos_c], -1)
        # guard against 64-bit key collisions with an exact check
        idx = np.nonzero(rows >= 0)[0]
        if len(idx):
            got = self.url_col.take(
                pa.array(rows[idx], pa.int64())).to_pylist()
            for j, i in enumerate(idx):
                if got[j] != urls[i]:
                    rows[i] = -1
        return rows


class FetchStage:
    """Callable actor class for ``map_batches(FetchStage, concurrency=N)``.

    Input batch: frontier columns (url, host, url_digest, discovered_seq,
    attempt).  Output: FETCHED_SCHEMA-shaped batch with per-row outcome.
    """

    def __init__(self, corpus_ref, cfg: CrawlConfig, seen_shards) -> None:
        import ray

        self.idx: CorpusIndex = (
            ray.get(corpus_ref) if not isinstance(corpus_ref, CorpusIndex)
            else corpus_ref)
        self.cfg = cfg
        self.allowed_hosts = []
        for r in cfg.root_urls:
            p = parse_url(r)
            if p is not None:
                self.allowed_hosts.append(host_only(netloc_host(p.netloc)))
        from ..state.seen_set import SeenSet
        self.seen = (seen_shards if isinstance(seen_shards, SeenSet)
                     else SeenSet(seen_shards, remote=True))
        # robots.txt rules per allowed host (north rule; off by default for
        # reference parity).  Fetched from the corpus once per actor.
        self.robots = {}
        if cfg.respect_robots:
            from ..state.robots import parse_robots, robots_url

            hosts = [host_only(netloc_host(parse_url(r).netloc))
                     for r in cfg.root_urls if parse_url(r)]
            rows = self.idx.lookup([robots_url(h) for h in hosts])
            for h, r in zip(hosts, rows):
                if r >= 0:
                    body = self.idx.table["body"][r].as_py() or ""
                    self.robots[h] = parse_robots(body)
        self.now = 0.0  # logical clock; set per round via fn_kwargs if needed

    def __call__(self, batch: pa.Table, now: float = 0.0) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_fetched()
        urls = batch["url"].to_pylist()
        digests = batch["url_digest"].to_pylist()
        seqs = batch["discovered_seq"].to_numpy()
        attempts = batch["attempt"].to_numpy()

        outcome = np.full(n, "", dtype=object)
        content_type = [None] * n
        mirror_path = [None] * n

        # P1 blacklist + parse gate + host gate (scalar but cheap; compiled
        # string ops dominate)
        hosts = [None] * n
        schemes = [None] * n
        for i, u in enumerate(urls):
            if is_blacklisted(u, self.cfg.blacklist_paths):
                outcome[i] = "blacklisted"
                continue
            p = parse_url(u)
            if p is None:
                outcome[i] = "rejected"
                continue
            hosts[i] = netloc_host(p.netloc)
            schemes[i] = p.scheme
            if not any(host_only(hosts[i]) == a for a in self.allowed_hosts):
                outcome[i] = "rejected"
            elif self.robots:
                rules = self.robots.get(host_only(hosts[i]))
                if rules is not None and not rules.allowed(p.path):
                    outcome[i] = "robots_excluded"

        # retry-abort gate: counts come as a precomputed column when the
        # driver pre-fetched them for the whole round (ONE shard fan-out
        # per round instead of one per chunk); else batched RPC here.
        if "crawl_count" in batch.column_names:
            counts_all = batch["crawl_count"].to_numpy()
            for i in range(n):
                if outcome[i] == "" and \
                        counts_all[i] > self.cfg.max_crawl_retries:
                    outcome[i] = "aborted_retries"
        else:
            pending = [i for i in range(n) if outcome[i] == ""]
            if pending:
                counts = self.seen.get([digests[i] for i in pending], now)
                for j, i in enumerate(pending):
                    if counts[j] > self.cfg.max_crawl_retries:
                        outcome[i] = "aborted_retries"

        # corpus lookup + status dispatch (vectorized over pending rows)
        pending = [i for i in range(n) if outcome[i] == ""]
        ok_batch: list[int] = []   # batch row index, plain 200 content
        ok_corpus: list[int] = []  # matching corpus row
        rd_batch: list[int] = []   # redirects
        rd_locs: list[str] = []
        if pending:
            rows = self.idx.lookup([urls[i] for i in pending])
            status = np.where(rows >= 0, self.idx.status[np.clip(rows, 0, None)],
                              np.int16(-1))
            transient = np.where(rows >= 0,
                                 self.idx.transient[np.clip(rows, 0, None)],
                                 False)
            att = attempts[pending] + 1  # 1-based fetch ordinal
            eff = np.where(transient & (att >= 2), np.int16(200), status)
            rd_corpus: list[int] = []
            for j, i in enumerate(pending):
                s = int(eff[j])
                if rows[j] < 0:
                    outcome[i] = "rejected"  # no such origin: conn error
                elif s == 429:
                    giveup = self.cfg.give_up_429_after
                    outcome[i] = ("rejected" if giveup is not None
                                  and int(att[j]) > giveup
                                  else "requeue_429")
                elif 500 <= s <= 599:
                    outcome[i] = "requeue_5xx"
                elif s == 404:
                    outcome[i] = "rejected"
                elif is_redirect(s):
                    outcome[i] = "fetched"
                    rd_batch.append(i)
                    rd_corpus.append(int(rows[j]))
                else:
                    outcome[i] = "fetched"
                    ok_batch.append(i)
                    ok_corpus.append(int(rows[j]))
            if ok_corpus:  # mimes only; bodies/spans gathered post-gate
                ct_l = self.idx.ct_col.take(
                    pa.array(ok_corpus, pa.int64())).to_pylist()
                for t, i in enumerate(ok_batch):
                    content_type[i] = ct_l[t]
            if rd_corpus:
                locs = self.idx.table["redirect_location"].take(
                    pa.array(rd_corpus, pa.int64())).to_pylist()
                for t, i in enumerate(rd_batch):
                    rd_locs.append(locs[t] or "")
                    content_type[i] = "text/html"

        # content gate + mirror path (P3) — per-row DECISIONS only; the
        # wide columns (body, spans) are gathered afterwards with Arrow
        # takes grouped by class (the previous to_pylist/rebuild of spans
        # was ~60% of the stage)
        src_row = np.full(n, -1, dtype=np.int64)
        for t, i in enumerate(ok_batch):
            src_row[i] = ok_corpus[t]
        html_take: list[int] = []   # corpus body + spans
        other_take: list[int] = []  # corpus body, no spans forwarded
        redirect_keep: set[int] = set()
        for i in range(n):
            if outcome[i] != "fetched":
                continue
            mime = parse_content_type(content_type[i])
            if mime not in ACCEPTED_CONTENT_TYPES:
                outcome[i] = "acked_non_accepted"
                content_type[i] = mime
                continue
            content_type[i] = mime
            if not has_params(urls[i]):
                mp = relative_file_path(urls[i], mime)
                if mp is None:
                    # the reference counts this page as FETCHED (crawl_order
                    # is appended inside CrawlURL) and only WriteItemToDisk
                    # rejects it afterwards (workflow.go:162-170): distinct
                    # outcome so ordering + metrics match the oracle while
                    # extraction is still skipped
                    outcome[i] = "mirror_rejected"
                    if src_row[i] >= 0:
                        other_take.append(i)  # body kept, spans dropped
                    continue
                mirror_path[i] = mp
            if src_row[i] < 0:      # synthesized redirect content
                redirect_keep.add(i)
            elif mime == HTML:
                html_take.append(i)
            else:
                other_take.append(i)  # only HTML forwarded to extraction

        from ..schemas import SPAN_STRUCT

        span_type = pa.list_(SPAN_STRUCT)
        spans_parts: list[pa.Array] = []
        body_parts: list[pa.Array] = []
        pos_parts: list[np.ndarray] = []
        placed = np.zeros(n, dtype=bool)
        if html_take:
            idxs = pa.array(src_row[html_take], pa.int64())
            spans_parts.append(self.idx.spans_col.take(idxs))
            body_parts.append(pc.fill_null(
                self.idx.body_col.take(idxs), ""))
            pos_parts.append(np.asarray(html_take, dtype=np.int64))
            placed[html_take] = True
        if other_take:
            idxs = pa.array(src_row[other_take], pa.int64())
            spans_parts.append(pa.nulls(len(other_take), span_type))
            body_parts.append(pc.fill_null(
                self.idx.body_col.take(idxs), ""))
            pos_parts.append(np.asarray(other_take, dtype=np.int64))
            placed[other_take] = True
        rd_keep = [i for i in rd_batch if i in redirect_keep]
        if rd_keep:
            loc_of = dict(zip(rd_batch, rd_locs))
            spans_parts.append(pa.array(
                [[{"kind": "link", "text": loc_of[i],
                   "media_ref": loc_of[i], "offset": 0}] for i in rd_keep],
                span_type))
            body_parts.append(pa.array(
                [synthesize_redirect_body(loc_of[i]) for i in rd_keep],
                pa.string()))
            pos_parts.append(np.asarray(rd_keep, dtype=np.int64))
            placed[rd_keep] = True
        rest = np.nonzero(~placed)[0]
        if len(rest):
            spans_parts.append(pa.nulls(len(rest), span_type))
            body_parts.append(pa.array([None] * len(rest), pa.string()))
            pos_parts.append(rest)
        concat_pos = np.concatenate(pos_parts)
        inv = np.empty(n, dtype=np.int64)
        inv[concat_pos] = np.arange(n)
        perm = pa.array(inv, pa.int64())
        spans_arr = pa.concat_arrays(
            [p if isinstance(p, pa.Array) else p.combine_chunks()
             for p in spans_parts]).take(perm)
        body_arr = pa.concat_arrays(
            [p if isinstance(p, pa.Array) else p.combine_chunks()
             for p in body_parts]).take(perm)

        prio = (batch["priority"] if "priority" in batch.column_names
                else pa.array(np.zeros(n, np.int32), pa.int32()))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": batch["host"],
            "url_digest": pa.array(digests, pa.string()),
            "discovered_seq": pa.array(seqs, pa.int64()),
            "attempt": pa.array(attempts, pa.int32()),
            "priority": prio,
            "status_code": pa.array(
                [None] * n, pa.int16()),
            "content_type": pa.array(content_type, pa.string()),
            "spans": spans_arr,
            "body": body_arr,
            "mirror_path": pa.array(mirror_path, pa.string()),
            "outcome": pa.array(list(outcome), pa.string()),
        })


def _empty_fetched() -> pa.Table:
    from ..schemas import SPAN_STRUCT

    return pa.table({
        "url": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "url_digest": pa.array([], pa.string()),
        "discovered_seq": pa.array([], pa.int64()),
        "attempt": pa.array([], pa.int32()),
        "priority": pa.array([], pa.int32()),
        "status_code": pa.array([], pa.int16()),
        "content_type": pa.array([], pa.string()),
        "spans": pa.array([], pa.list_(pa.struct([
            pa.field("kind", pa.string()), pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32())]))),
        "body": pa.array([], pa.string()),
        "mirror_path": pa.array([], pa.string()),
        "outcome": pa.array([], pa.string()),
    })
