"""Extraction + publish-gate stages (P4 ExtractURLs + P5 PublishURLs,
/root/reference/workflow.go:218-296) for the round-based engine.

The publish gate is the crawl's one wide step.  Events (publish
attempts, non-accepted resets, 5XX INCRs) are NARROW rows — bodies and
spans never enter the shuffle (SURVEY.md §7.4).  They are hash-routed to
the seen-set shard owning each digest (``groupby(shard)``), and each
shard REPLAYS its digests' events in discovery order — reproducing the
reference's sequential interleaving of Get/Set/Incr
(workflow.go:107,136,273-291) exactly, while different digests commit in
parallel.  Replay at round commit (not during fetch) keeps fetch tasks
side-effect free and makes the round idempotent under re-execution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig
from ..functions.extract import extract_links_spans_batch
from ..functions.urls import digest_hex_batch, netloc_host, parse_url, \
    publish_gate_params

# event kinds, replayed per digest in seq order
EV_ATTEMPT = 0  # publish attempt (workflow.go:273-291)
EV_RESET = 1    # Set(ReadyToEnqueue) after non-accepted fetch (:129-140)
EV_INCR = 2     # 5XX retry counter INCR (:107)


def extract_candidates_batch(batch: pa.Table, cfg: CrawlConfig,
                             allowed_hosts: list[str]) -> pa.Table:
    """HTML/span rows -> narrow publish-attempt candidates.

    Input: fetched rows (url, discovered_seq, spans) already filtered to
    outcome=fetched & content_type=text/html.  Output columns:
    (digest, url, host, parent_seq, link_idx, kind) where kind EV_ATTEMPT;
    page aborts (unparseable href) emit kind=-1 markers for metrics.
    """
    links = extract_links_spans_batch(batch, allowed_hosts,
                                      cfg.blacklist_paths)
    src = links["src_url"].to_pylist()
    urls = links["link_url"].to_pylist()
    seqs = links["link_seq"].to_numpy()
    # map src url -> parent seq
    parent_seq = {u: s for u, s in zip(batch["url"].to_pylist(),
                                       batch["discovered_seq"].to_numpy())}
    out_digest: list[str] = []
    out_url: list[str] = []
    out_host: list[str] = []
    out_pseq: list[int] = []
    out_idx: list[int] = []
    out_kind: list[int] = []
    for s, u, li in zip(src, urls, seqs):
        ps = int(parent_seq[s])
        if u is None:  # whole-page abort marker
            out_digest.append("")
            out_url.append(s)
            out_host.append("")
            out_pseq.append(ps)
            out_idx.append(-1)
            out_kind.append(-1)
            continue
        if not publish_gate_params(u):
            continue  # pagination-param gate (workflow.go:259-270)
        p = parse_url(u)
        out_digest.append("")  # filled vectorized below
        out_url.append(u)
        out_host.append(netloc_host(p.netloc) if p else "")
        out_pseq.append(ps)
        out_idx.append(int(li))
        out_kind.append(EV_ATTEMPT)
    # digests in one vectorized pass
    dig = digest_hex_batch([u for u, k in zip(out_url, out_kind)
                            if k == EV_ATTEMPT], cfg.digest)
    it = iter(dig)
    out_digest = [next(it) if k == EV_ATTEMPT else ""
                  for k in out_kind]
    return pa.table({
        "digest": pa.array(out_digest, pa.string()),
        "url": pa.array(out_url, pa.string()),
        "host": pa.array(out_host, pa.string()),
        "parent_seq": pa.array(out_pseq, pa.int64()),
        "link_idx": pa.array(out_idx, pa.int32()),
        "kind": pa.array(out_kind, pa.int8()),
    })


def commit_events_to_shard(shard, events: pa.Table, now: float,
                           remote: bool):
    """Send one shard's event rows to its SeenShard for ordered replay.

    ``events``: (digest, url, host, parent_seq, link_idx, kind) — all
    digests must belong to ``shard``.  Returns the winner sub-table of
    publish attempts that survived the gate.
    """
    if events.num_rows == 0:
        return events
    # order: (seq, link_idx) — EV_RESET/EV_INCR happen at the fetch seq of
    # the digest itself, attempts at the linking parent's seq; ties across
    # kinds are impossible per digest (non-HTML pages emit no links).
    order = pa.compute.sort_indices(
        events, sort_keys=[("parent_seq", "ascending"),
                           ("link_idx", "ascending")])
    ev = events.take(order)
    digests = ev["digest"].to_pylist()
    kinds = ev["kind"].to_numpy()
    if remote:
        import ray

        winners_mask = ray.get(shard.replay_events_batch.remote(
            digests, kinds.tolist(), now))
    else:
        winners_mask = shard.replay_events_batch(digests, kinds.tolist(), now)
    mask = np.asarray(winners_mask, dtype=bool)
    return ev.filter(pa.array(mask))


# (replay itself lives on state.seen_set.SeenShard.replay_events_batch —
# the shard is the serialization point; kinds here must match its codes.)
