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
        urls = self.table["url"].to_pylist()
        keys = _url_keys(urls)
        order = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[order]
        self.sorted_rows = order.astype(np.int64)
        self.urls = urls
        self.status = self.table["status_code"].to_numpy().astype(np.int16)
        self.transient = self.table["transient"].to_numpy(
            zero_copy_only=False)

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
        for i in np.nonzero(rows >= 0)[0]:
            if self.urls[rows[i]] != urls[i]:
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
        body = [None] * n
        spans: list = [None] * n
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
        if pending:
            rows = self.idx.lookup([urls[i] for i in pending])
            status = np.where(rows >= 0, self.idx.status[np.clip(rows, 0, None)],
                              np.int16(-1))
            transient = np.where(rows >= 0,
                                 self.idx.transient[np.clip(rows, 0, None)],
                                 False)
            att = attempts[pending] + 1  # 1-based fetch ordinal
            eff = np.where(transient & (att >= 2), np.int16(200), status)
            ok_batch: list[int] = []   # batch row index, plain 200 content
            ok_corpus: list[int] = []  # matching corpus row
            rd_batch: list[int] = []   # redirects
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
            # content gathering via BULK takes (chunked per-row .as_py()
            # costs ~100us/row and dominated the fetch phase)
            if ok_corpus:
                sub = self.idx.table.take(pa.array(ok_corpus, pa.int64()))
                ct_l = sub["content_type"].to_pylist()
                body_l = sub["body"].to_pylist()
                spans_l = sub["spans"].to_pylist()
                for t, i in enumerate(ok_batch):
                    content_type[i] = ct_l[t]
                    body[i] = body_l[t] or ""
                    spans[i] = spans_l[t]
            if rd_corpus:
                locs = self.idx.table["redirect_location"].take(
                    pa.array(rd_corpus, pa.int64())).to_pylist()
                for t, i in enumerate(rd_batch):
                    loc = locs[t] or ""
                    content_type[i] = "text/html"
                    body[i] = synthesize_redirect_body(loc)
                    spans[i] = [{"kind": "link", "text": loc,
                                 "media_ref": loc, "offset": 0}]

        # content gate + mirror path (P3)
        for i in range(n):
            if outcome[i] != "fetched":
                continue
            mime = parse_content_type(content_type[i])
            if mime not in ACCEPTED_CONTENT_TYPES:
                outcome[i] = "acked_non_accepted"
                content_type[i] = mime
                body[i] = None
                spans[i] = None
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
                    spans[i] = None
                    continue
                mirror_path[i] = mp
            if mime != HTML:
                spans[i] = None  # only HTML forwarded to extraction

        from ..schemas import SPAN_STRUCT
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
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
            "body": pa.array(body, pa.string()),
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
