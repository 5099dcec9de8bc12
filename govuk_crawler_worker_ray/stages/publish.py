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
    import pyarrow.compute as pc

    from ..state.seen_set import keys_u64

    links = extract_links_spans_batch(batch, allowed_hosts,
                                      cfg.blacklist_paths)
    # parent seq per link: positional lookup of src_url in the batch
    page_pos = pc.index_in(links["src_url"], value_set=batch["url"]
                           .combine_chunks())
    pseq_all = (batch["discovered_seq"].combine_chunks()
                .take(page_pos).to_numpy(zero_copy_only=False)
                .astype(np.int64))
    seqs = links["link_seq"].to_numpy()
    is_abort = seqs < 0

    # pagination-param gate (workflow.go:259-270), vectorized: links
    # without a raw query always survive; only '?'-links run the scalar
    # Go-ParseQuery-parity check
    lurl = pc.fill_null(links["link_url"].combine_chunks(), "")
    has_q = pc.match_substring(lurl, "?").to_numpy(zero_copy_only=False)
    keep = ~is_abort
    if has_q.any():
        urls_py = lurl.to_pylist()
        for i in np.nonzero(has_q & keep)[0]:
            if not publish_gate_params(urls_py[i]):
                keep[i] = False

    kept = links.filter(pa.array(keep))
    kept_urls = kept["link_url"].to_pylist()
    dig = digest_hex_batch(kept_urls, cfg.digest)
    n_k = len(kept_urls)
    attempts = pa.table({
        "digest": pa.array(dig, pa.string()),
        "url": kept["link_url"],
        "host": pc.fill_null(kept["link_host"].combine_chunks(), ""),
        "parent_seq": pa.array(pseq_all[keep], pa.int64()),
        "link_idx": kept["link_seq"],
        "kind": pa.array(np.full(n_k, EV_ATTEMPT, np.int8), pa.int8()),
        "key_u64": pa.array(keys_u64(dig), pa.uint64()),
    })
    n_a = int(is_abort.sum())
    if n_a == 0:
        return attempts
    ab = links.filter(pa.array(is_abort))
    aborts = pa.table({
        "digest": pa.array([""] * n_a, pa.string()),
        "url": ab["src_url"],
        "host": pa.array([""] * n_a, pa.string()),
        "parent_seq": pa.array(pseq_all[is_abort], pa.int64()),
        "link_idx": pa.array(np.full(n_a, -1, np.int32), pa.int32()),
        "kind": pa.array(np.full(n_a, -1, np.int8), pa.int8()),
        "key_u64": pa.array(np.zeros(n_a, np.uint64), pa.uint64()),
    })
    return pa.concat_tables([attempts, aborts])


def derive_fetch_events(narrow: pa.Table) -> pa.Table:
    """Fetch-outcome seen-set events from a narrow outcome table:
    acked_non_accepted -> RESET (workflow.go:129-140), requeue_5xx ->
    INCR (workflow.go:107).  link_idx=-1 makes a row's own event sort
    before any publish attempts sharing its parent_seq at replay."""
    import pyarrow.compute as pc

    from ..state.seen_set import keys_u64

    ev = narrow.filter(pc.is_in(
        narrow["outcome"],
        value_set=pa.array(["acked_non_accepted", "requeue_5xx"])))
    digests = ev["url_digest"].to_pylist()
    kinds = [EV_RESET if o == "acked_non_accepted" else EV_INCR
             for o in ev["outcome"].to_pylist()]
    return pa.table({
        "digest": pa.array(digests, pa.string()),
        "url": ev["url"],
        "host": ev["host"],
        "parent_seq": ev["discovered_seq"],
        "link_idx": pa.array([-1] * ev.num_rows, pa.int32()),
        "kind": pa.array(kinds, pa.int8()),
        "key_u64": pa.array(keys_u64(digests), pa.uint64()),
    })


def stage_events_to_shards(events: pa.Table, shards, remote: bool,
                           block: bool = True):
    """Route event rows (digest, url, host, parent_seq, link_idx, kind,
    key_u64) to their owning shards' staging buffers.  Used by fetch
    workers (their candidates never touch the driver) and by the driver
    for the small reset/INCR event set.

    With ``block=False`` returns the in-flight ObjectRefs instead of
    waiting — callers must await them before the round commit (workers
    hand them to the driver so staging overlaps their next chunk)."""
    if events.num_rows == 0:
        return []
    num_shards = len(shards)
    sids = (events["key_u64"].to_numpy()
            % np.uint64(num_shards)).astype(np.int64)
    order = np.argsort(sids, kind="stable")
    ev = events.take(pa.array(order))
    bounds = np.searchsorted(sids[order], np.arange(num_shards + 1))
    refs = []
    for s in range(num_shards):
        sub = ev.slice(bounds[s], bounds[s + 1] - bounds[s])
        if sub.num_rows == 0:
            continue
        args = (sub["digest"].combine_chunks(),
                sub["url"].combine_chunks(),
                sub["host"].combine_chunks(),
                sub["parent_seq"].to_numpy(),
                sub["link_idx"].to_numpy(),
                sub["kind"].to_numpy(),
                sub["key_u64"].to_numpy())
        if remote:
            refs.append(shards[s].stage_events.remote(*args))
        else:
            shards[s].stage_events(*args)
    if refs and block:
        import ray

        ray.get(refs)
        return []
    return refs


# (replay itself lives on state.seen_set.SeenShard.replay_events_batch —
# the shard is the serialization point; kinds here must match its codes.)
