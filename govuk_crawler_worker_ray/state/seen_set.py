"""Sharded TTL'd URL-seen set — the engine's replacement for the
reference's Redis TTL hash set (/root/reference/ttl_hash_set/ttl_hash_set.go).

Semantics reproduced (Redis parity):
- ``get``: missing or expired key reads as 0 (ttl_hash_set.go:112-115);
- ``set(key, val)``: SETEX — value + TTL reset (ttl_hash_set.go:82-95);
- ``incr``: INCR + EXPIRE pipelined (ttl_hash_set.go:57-80) — returns the
  new count, TTL refreshed;
- ``exists`` (ttl_hash_set.go:123-135); ``ttl``: -2 when missing, else
  remaining seconds (Redis TTL semantics, tested
  ttl_hash_set_test.go:156-175);
- status encoding: 0 ReadyToEnqueue / 1 Enqueued / >1 retry counter
  (workflow.go:18-19).

Scale design (north rule): keys are URL digests routed to
``hash(digest) % num_shards`` shard actors.  Each shard fronts its exact
store with a bloom pre-filter (definite-miss short-circuit; append-only,
rebuilt on snapshot load) and a cuckoo filter (approximate membership
WITH deletion, so TTL expiry can remove keys).  The exact dict holds
(status, expire_at); at 10^10 URLs the bloom+cuckoo answer the hot
"already enqueued?" gate in O(1) numpy ops while the dict holds only
keys with interesting status (retry counters) plus the recent window.

Time is LOGICAL: every call takes ``now`` (seconds); tests and the
oracle inject it (SURVEY.md §7.4 "TTL semantics without wall-clock").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .bloom import BloomFilter
from .cuckoo import CuckooFilter

TTL_MISSING = -2  # Redis: TTL of a missing key


def _empty_winner_frontier() -> pa.Table:
    return pa.table({
        "discovered_seq": pa.array([], pa.int64()),
        "url": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "url_digest": pa.array([], pa.string()),
        "attempt": pa.array([], pa.int32()),
        "priority": pa.array([], pa.int32()),
    })


def keys_u64(digests: list[str]) -> np.ndarray:
    """hex digest -> uint64 (first 8 bytes, big-endian) — the same value
    ``functions.urls.shard_of_digest`` uses, so routing agrees."""
    if not digests:
        return np.empty(0, dtype=np.uint64)
    return np.array([int(d[:16], 16) for d in digests], dtype=np.uint64)


class SeenShard:
    """One shard: bloom pre-filter + cuckoo filter + exact store.

    Plain object (no Ray) so the pure-Python oracle and unit tests can use
    it directly; ``make_shard_actor`` wraps it as a Ray actor.
    """

    def __init__(self, shard_id: int, ttl_seconds: float,
                 expected_keys: int = 1 << 16) -> None:
        from .malloc_tune import tune_malloc

        tune_malloc()
        self.shard_id = shard_id
        self.ttl = float(ttl_seconds)
        self.expected_keys = expected_keys
        self.store: dict[str, tuple[int, float]] = {}
        self.bloom = BloomFilter(expected_keys)
        self.cuckoo = CuckooFilter(expected_keys)
        # insert failures make the cuckoo lossy: it stops being a
        # definite-miss filter and reads fall back to bloom + dict
        self.cuckoo_overflow = 0
        self.ops = 0  # simple metric counter

    def reset(self) -> None:
        """Drop all state and rebuild empty filters (snapshot load uses
        this so a snapshot REPLACES state instead of merging into it)."""
        self.store = {}
        self.bloom = BloomFilter(self.expected_keys)
        self.cuckoo = CuckooFilter(self.expected_keys)
        self.cuckoo_overflow = 0
        self._staged = []

    # -- internals --------------------------------------------------------
    def _grow_filters(self, need: int) -> None:
        """Rebuild bloom+cuckoo at >=2x the live key count (amortized
        doubling) from the exact store.  Keeps ``cuckoo_overflow == 0``
        so the definite-miss fast paths stay authoritative; without this
        a saturated cuckoo degenerates to the 500-kick eviction loop per
        insert (measured 147s for 42k keys at 99% load)."""
        cap = max(self.expected_keys, 1 << 16)
        target = len(self.store) + need
        while cap < 2 * target:
            cap *= 2
        self.expected_keys = cap
        self.bloom = BloomFilter(cap)
        self.cuckoo = CuckooFilter(cap)
        self.cuckoo_overflow = 0
        if self.store:
            k = keys_u64(list(self.store))
            self.bloom.add_many(k)
            self.cuckoo_overflow += self.cuckoo.insert_many(k)

    def _ensure_capacity(self, n_new: int) -> None:
        # grow at 2/3 occupancy, not the cuckoo's theoretical 95%: the
        # vectorized insert waves degrade to scalar eviction loops well
        # before that (measured ~6x slower bulk puts at 80% load)
        if (self.cuckoo.count + n_new) > (self.cuckoo.nbuckets * 4) * (2 / 3):
            self._grow_filters(n_new)

    def _live(self, digest: str, now: float) -> tuple[int, float] | None:
        ent = self.store.get(digest)
        if ent is None:
            return None
        if ent[1] <= now:
            del self.store[digest]
            self.cuckoo.delete_many(keys_u64([digest]))
            return None
        return ent

    def _put(self, digest: str, status: int, now: float) -> None:
        if digest not in self.store:
            self._ensure_capacity(1)
            k = keys_u64([digest])
            self.bloom.add_many(k)
            self.cuckoo_overflow += self.cuckoo.insert_many(k)
        self.store[digest] = (status, now + self.ttl)

    def _put_many(self, digests: list[str], statuses, now: float,
                  keys: np.ndarray | None = None) -> None:
        """Bulk insert: ONE vectorized bloom/cuckoo add for all new keys
        (per-key numpy calls cost ~100us each — the replay hot path).
        ``keys`` = precomputed ``keys_u64(digests)`` to skip the
        per-digest hex parse when the caller already has them."""
        store = self.store
        if keys is None:
            new = [d for d in digests if d not in store]
            nk = keys_u64(new) if new else None
        else:
            new_pos = [i for i, d in enumerate(digests)
                       if d not in store]
            nk = (np.asarray(keys, dtype=np.uint64)[new_pos]
                  if new_pos else None)
        if nk is not None and len(nk):
            # BEFORE the store update: _grow_filters rebuilds from the
            # store, so growing after it would re-insert these keys twice
            self._ensure_capacity(len(nk))
        exp = now + self.ttl
        # uniform-status fast path: every hot caller passes
        # ``[status] * n`` (replay winners are all 1), so the insert
        # collapses to ONE C-speed dict.update sharing a single value
        # tuple — the per-key Python loop was 74 ms of a 314 ms ph1 at
        # round-8 per-shard scale (150k staged / 67k winners)
        if statuses and statuses.count(statuses[0]) == len(statuses):
            from itertools import repeat

            store.update(zip(digests,
                             repeat((int(statuses[0]), exp),
                                    len(digests))))
        else:
            for d, s in zip(digests, statuses):
                store[d] = (int(s), exp)
        if nk is not None and len(nk):
            self.bloom.add_many(nk)
            self.cuckoo_overflow += self.cuckoo.insert_many(nk)

    # -- batch API (all take/return input order) --------------------------
    def get_batch(self, digests: list[str], now: float) -> np.ndarray:
        self.ops += len(digests)
        out = np.zeros(len(digests), dtype=np.int64)
        if not digests:
            return out
        store = self.store
        # deletion-aware pre-filter: a cuckoo miss is a definite miss
        # (inserts mirror the store, deletes mirror expiry) so the dict
        # is probed only for possible hits — unless an insert ever
        # overflowed, which makes the cuckoo lossy and non-authoritative
        if self.cuckoo_overflow == 0:
            maybe = self.cuckoo.contains_many(keys_u64(digests))
            candidates = np.nonzero(maybe)[0]
        else:
            candidates = range(len(digests))
        expired = []
        for i in candidates:
            ent = store.get(digests[i])
            if ent is not None:
                if ent[1] <= now:
                    expired.append(digests[i])
                else:
                    out[i] = ent[0]
        for d in expired:
            if d in store:
                del store[d]
        if expired:
            self.cuckoo.delete_many(keys_u64(expired))
        return out

    def get_batch_arrow(self, digests, now: float) -> np.ndarray:
        """Arrow-argument variant (cheap task-arg serialization)."""
        return self.get_batch(digests.to_pylist(), now)

    def set_batch(self, digests: list[str], status: int, now: float) -> None:
        self.ops += len(digests)
        self._put_many(digests, [status] * len(digests), now)

    def incr_batch(self, digests: list[str], now: float) -> np.ndarray:
        self.ops += len(digests)
        out = np.zeros(len(digests), dtype=np.int64)
        vals: dict[str, int] = {}
        for i, d in enumerate(digests):
            if d in vals:
                val = vals[d] + 1
            else:
                ent = self._live(d, now)
                val = (ent[0] if ent else 0) + 1
            vals[d] = val
            out[i] = val
        items = list(vals.items())
        self._put_many([d for d, _ in items], [v for _, v in items], now)
        return out

    def exists_batch(self, digests: list[str], now: float) -> np.ndarray:
        self.ops += len(digests)
        out = np.zeros(len(digests), dtype=bool)
        if not digests:
            return out
        keys = keys_u64(digests)
        # bloom (append-only, never-deleted keys) AND cuckoo (tracks
        # deletions) both saying "maybe" gates the exact-dict probe
        maybe = self.bloom.contains_many(keys)
        if self.cuckoo_overflow == 0:
            maybe &= self.cuckoo.contains_many(keys)
        for i in np.nonzero(maybe)[0]:
            out[i] = self._live(digests[i], now) is not None
        return out

    def ttl_batch(self, digests: list[str], now: float) -> np.ndarray:
        self.ops += len(digests)
        out = np.full(len(digests), TTL_MISSING, dtype=np.float64)
        for i, d in enumerate(digests):
            ent = self._live(d, now)
            if ent is not None:
                out[i] = ent[1] - now
        return out

    def enqueue_gate_batch(self, digests: list[str], now: float) -> np.ndarray:
        """The PublishURLs gate (workflow.go:273-291), atomic per shard:
        for each digest IN ORDER — status >= Enqueued => False (drop);
        else Set(Enqueued) => True (publish).  Idempotent under re-execution
        (second call on the same digest returns False)."""
        self.ops += len(digests)
        out = np.zeros(len(digests), dtype=bool)
        won: list[str] = []
        won_set: set[str] = set()
        for i, d in enumerate(digests):
            if d in won_set:
                continue  # earlier position in this batch already won
            ent = self._live(d, now)
            status = ent[0] if ent else 0
            if status < 1:  # ReadyToEnqueue / missing
                won.append(d)
                won_set.add(d)
                out[i] = True
        self._put_many(won, [1] * len(won), now)
        return out

    # -- staged round commit (worker -> shard direct event flow) ---------
    # Fetch workers push their publish-attempt candidates straight to the
    # owning shard (narrow columns); the driver only triggers the commit.
    # This keeps the P5 exchange off the driver entirely: each shard
    # sorts ITS events by discovery order and replays locally.

    def stage_events(self, digests, urls, hosts, parent_seqs, link_idxs,
                     kinds, keys=None) -> int:
        """Buffer the chunk AS-IS (Arrow string columns + numpy
        numerics).  No per-chunk decode or sort happens here: the
        commit path is vectorized (dictionary-encode + per-digest
        argmin, see ``commit_staged``) and needs neither Python lists
        nor presorted runs — staging RPCs stay near-free while the
        fetch phase runs.  ``keys`` = the events' ``key_u64`` column
        (computed once by the extractor) so the commit's filter probes
        skip the per-digest hex parse."""
        if not hasattr(self, "_staged"):
            self._staged = []
        dg = (pa.array(digests, pa.string()) if isinstance(digests, list)
              else digests)
        us = pa.array(urls, pa.string()) if isinstance(urls, list) else urls
        hs = pa.array(hosts, pa.string()) if isinstance(hosts, list) else hosts
        if isinstance(dg, pa.ChunkedArray):
            dg = dg.combine_chunks()
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        if isinstance(hs, pa.ChunkedArray):
            hs = hs.combine_chunks()
        ps = np.asarray(parent_seqs, dtype=np.int64)
        li = np.asarray(link_idxs, dtype=np.int32)
        kd = np.asarray(kinds, dtype=np.int8)
        ky = (keys_u64(dg.to_pylist()) if keys is None
              else np.asarray(keys, dtype=np.uint64))
        self._staged.append((dg, us, hs, ps, li, kd, ky))
        # rows staged in THIS chunk: the driver sums these at the round
        # barrier to size the rank-exchange partition count (a small
        # round needs one merge partition, not one per shard)
        return int(len(ps))

    def clear_staged(self) -> None:
        self._staged = []

    def commit_staged(self, now: float):
        """Replay the staged events; return the winner rows as an Arrow
        table (url, host, digest, parent_seq, link_idx), order
        unspecified (callers sort by (parent_seq, link_idx)).

        Vectorized replay (the attempt-only fast path): digests whose
        events are ALL publish attempts — the overwhelming majority —
        need no ordered replay at all: the winner is the digest's
        min-(parent_seq, link_idx) event iff its current status is
        < Enqueued, which is decided per UNIQUE digest with the cuckoo
        filter pre-answering "definitely unseen" (no dict probe, no
        Python per-event loop).  Only digests that also carry RESET /
        INCR events (5XX/non-accepted history — rare) take the exact
        sequential replay.  Final store state and winner set are
        event-for-event identical to the full ordered replay (pinned by
        the model-based seen-set suite + e2e parity goldens)."""
        staged = getattr(self, "_staged", [])
        self._staged = []
        empty = pa.table({
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
            "parent_seq": pa.array([], pa.int64()),
            "link_idx": pa.array([], pa.int32()),
        })
        if not staged:
            return empty
        dg = pa.concat_arrays([c[0] for c in staged])
        ur = pa.concat_arrays([c[1] for c in staged])
        ho = pa.concat_arrays([c[2] for c in staged])
        pseq = np.concatenate([c[3] for c in staged])
        lidx = np.concatenate([c[4] for c in staged])
        kind = np.concatenate([c[5] for c in staged])
        keys = np.concatenate([c[6] for c in staged])
        n = len(pseq)
        if n == 0:
            return empty
        self.ops += n
        if int(pseq.max()) >= (1 << 42):
            # packed-key overflow: exact lexsort replay fallback
            order = np.lexsort((lidx, pseq))
            won = self.replay_events_batch(
                dg.take(pa.array(order, pa.int64())).to_pylist(),
                kind[order].tolist(), now)
            win = order[np.nonzero(won)[0]]
            take = pa.array(win, pa.int64())
            return pa.table({
                "url": ur.take(take), "host": ho.take(take),
                "digest": dg.take(take),
                "parent_seq": pa.array(pseq[win], pa.int64()),
                "link_idx": pa.array(lidx[win], pa.int32()),
            })
        comp = pseq * np.int64(1 << 21) + (lidx.astype(np.int64) + 1)
        enc = dg.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        num_u = len(enc.dictionary)
        ukeys = np.empty(num_u, dtype=np.uint64)
        ukeys[codes] = keys
        # first (min-comp) event index per unique digest
        order = np.lexsort((comp, codes))
        oc = codes[order]
        firstpos = np.ones(len(oc), dtype=bool)
        firstpos[1:] = oc[1:] != oc[:-1]
        first_evt = np.empty(num_u, dtype=np.int64)
        first_evt[oc[firstpos]] = order[firstpos]
        # digests with any RESET/INCR take the exact sequential replay
        att = np.ones(num_u, dtype=bool)
        nz = np.nonzero(kind != 0)[0]
        if len(nz):
            att[np.unique(codes[nz])] = False
        win = np.zeros(num_u, dtype=bool)
        att_idx = np.nonzero(att)[0]
        if len(att_idx):
            if self.cuckoo_overflow == 0:
                maybe = self.cuckoo.contains_many(ukeys[att_idx])
            else:
                maybe = np.ones(len(att_idx), dtype=bool)
            win[att_idx[~maybe]] = True  # definitely not in the store
            probe = att_idx[maybe]
            if len(probe):
                pd_str = enc.dictionary.take(
                    pa.array(probe, pa.int64())).to_pylist()
                store_get = self.store.get
                wp = np.zeros(len(probe), dtype=bool)
                for i, d in enumerate(pd_str):
                    ent = store_get(d)
                    wp[i] = (ent is None or ent[1] <= now
                             or ent[0] < 1)
                win[probe[wp]] = True
        win_codes = np.nonzero(win)[0]
        if len(win_codes):
            wd = enc.dictionary.take(
                pa.array(win_codes, pa.int64())).to_pylist()
            self._put_many(wd, [1] * len(wd), now, keys=ukeys[win_codes])
        winner_evt = first_evt[win_codes]
        if len(nz):
            ev_mask = ~att[codes]
            idx = np.nonzero(ev_mask)[0]
            sub = idx[np.argsort(comp[idx], kind="stable")]
            md = dg.take(pa.array(sub, pa.int64())).to_pylist()
            won = self.replay_events_batch(md, kind[sub].tolist(), now)
            mixed_evt = sub[np.fromiter(
                (bool(w) for w in won), dtype=bool, count=len(won))]
            winner_evt = np.concatenate([winner_evt, mixed_evt])
        take = pa.array(winner_evt, pa.int64())
        return pa.table({
            "url": ur.take(take), "host": ho.take(take),
            "digest": dg.take(take),
            "parent_seq": pa.array(pseq[winner_evt], pa.int64()),
            "link_idx": pa.array(lidx[winner_evt], pa.int32()),
        })

    # -- frontier-on-storage commit (ROADMAP #1) -------------------------
    # Winner rows never touch the driver: each shard replays its events,
    # keeps its winners locally, exchanges only (parent_seq, link_idx)
    # ORDERING KEYS with peer shards to assign globally dense seqs, then
    # writes its winners straight to round=k/frontier parquet parts.
    #
    #   phase1: replay -> hold winners sorted by (pseq, lidx); partition
    #           them by driver-chosen pseq range boundaries; return per-
    #           partition counts + per-partition key arrays (numpy -> the
    #           object store; the driver only ever holds the REFS).
    #   rank_partition: the partition's owner shard merges the S key
    #           arrays and returns, per shard, each row's dense rank
    #           within the partition (exact global (pseq, lidx) order).
    #   phase2: seq = base + partition_start + rank; rows whose digest
    #           clashes with next round's driver rows (requeues) return
    #           to the driver for the dup lane; the rest are written as
    #           <= max_rows parquet parts and only the paths travel back.

    def commit_phase1(self, now: float, boundaries, as_refs: bool = False):
        """-> (per-partition counts, list of per-partition key arrays).
        Keys are packed (pseq << 21 | link_idx+1) int64.  With
        ``as_refs`` the key arrays go to the OBJECT STORE and only their
        refs return — the driver never materializes ordering keys."""
        t = self.commit_staged(now)  # replay; winners as Arrow (unsorted)
        pseq = t["parent_seq"].to_numpy(zero_copy_only=False)
        lidx = t["link_idx"].to_numpy(zero_copy_only=False)
        # packed key is pseq*2^21 + lidx+1 in int64: past pseq >= 2^42 it
        # silently overflows and mis-orders the storage path (unlike
        # commit_staged, which has a lexsort fallback) — fail loudly
        if len(pseq) and int(pseq.max()) >= (1 << 42):
            raise OverflowError(
                "commit_phase1 packed ordering key overflows int64: "
                f"parent_seq max {int(pseq.max())} >= 2^42")
        comp = pseq.astype(np.int64) * np.int64(1 << 21) + (
            lidx.astype(np.int64) + 1)
        order = np.argsort(comp, kind="stable")
        self._pending_winners = t.take(pa.array(order, pa.int64()))
        comp = comp[order]
        bnd = np.asarray(boundaries, dtype=np.int64) * np.int64(1 << 21)
        cuts = np.searchsorted(comp, bnd)
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(comp)]))
        self._partition_bounds = list(zip(starts, ends))
        counts = (ends - starts).astype(np.int64)
        keys = [comp[s:e] for s, e in self._partition_bounds]
        if as_refs:
            import ray

            # tiny partitions travel inline in the reply — a ray.put per
            # (shard, partition) cell is ~1 ms of object-store overhead
            # and the S x P matrix of them dominated small-round commits
            keys = [ray.put(k) if len(k) >= 8192 else k for k in keys]
        return counts, keys

    def rank_partition(self, key_arrays):
        """Merge S shards' sorted key arrays for ONE partition; return a
        list of per-shard dense-rank arrays (exact global order; ties
        broken by shard index, which cannot occur for distinct links).
        Runs on the partition's OWNER shard — key data moves shard to
        shard through the object store, never via the driver."""
        try:
            import ray

            ref_pos = [i for i, a in enumerate(key_arrays)
                       if isinstance(a, ray.ObjectRef)]
            if ref_pos:
                # ONE batched get — a per-array get loop costs a driver
                # round-trip per shard and serializes the merge
                got = ray.get([key_arrays[i] for i in ref_pos])
                key_arrays = list(key_arrays)
                for i, v in zip(ref_pos, got):
                    key_arrays[i] = v
        except ImportError:
            pass
        arrs = [np.asarray(a, dtype=np.int64) for a in key_arrays]
        lens = [len(a) for a in arrs]
        if sum(lens) == 0:
            return [np.zeros(0, dtype=np.int64) for _ in arrs]
        allk = np.concatenate(arrs)
        src = np.concatenate([np.full(n, s, dtype=np.int32)
                              for s, n in enumerate(lens)])
        pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
        order = np.lexsort((src, allk))
        ranks = np.empty(len(allk), dtype=np.int64)
        ranks[order] = np.arange(len(allk), dtype=np.int64)
        return [ranks[src == s][np.argsort(pos[src == s], kind="stable")]
                if n else np.zeros(0, dtype=np.int64)
                for s, n in enumerate(lens)]

    def commit_phase2(self, base_seq: int, part_starts, rank_refs,
                      clash_digests, out_dir: str, max_rows: int,
                      file_prefix: str):
        """Assign seqs, split clash rows, write parquet parts.
        -> (file paths, per-file row counts, clash winner table with
        seqs, n_winners).  Row counts ride back with the paths so the
        driver never re-reads parquet footers to size the next round
        (the per-part metadata scan was a serial driver cost that grew
        with part count)."""
        import os

        import ray

        t = getattr(self, "_pending_winners", None)
        bounds = getattr(self, "_partition_bounds", [])
        self._pending_winners = None
        self._partition_bounds = []
        if t is None or t.num_rows == 0:
            return [], [], _empty_winner_frontier(), 0
        ref_pos = [p for p, r in enumerate(rank_refs)
                   if isinstance(r, ray.ObjectRef)]
        if ref_pos:
            got = ray.get([rank_refs[p] for p in ref_pos])
            rank_refs = list(rank_refs)
            for p, v in zip(ref_pos, got):
                rank_refs[p] = v
        seqs = np.empty(t.num_rows, dtype=np.int64)
        for p, (s, e) in enumerate(bounds):
            if e <= s:
                continue
            seqs[s:e] = base_seq + int(part_starts[p]) + \
                np.asarray(rank_refs[p])
        frontier = pa.table({
            "discovered_seq": pa.array(seqs, pa.int64()),
            "url": t["url"],
            "host": t["host"],
            "url_digest": t["digest"],
            "attempt": pa.array(np.zeros(t.num_rows, np.int32),
                                pa.int32()),
            "priority": pa.array(np.zeros(t.num_rows, np.int32),
                                 pa.int32()),
        })
        if clash_digests:
            import pyarrow.compute as pc

            clash_mask = pc.is_in(frontier["url_digest"],
                                  value_set=pa.array(sorted(clash_digests),
                                                     pa.string()))
            clash = frontier.filter(clash_mask)
            frontier = frontier.filter(pc.invert(clash_mask))
        else:
            clash = _empty_winner_frontier()
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        rows = []
        for j, off in enumerate(range(0, frontier.num_rows, max_rows)):
            path = os.path.join(out_dir, f"{file_prefix}-{j:04d}.parquet")
            sl = frontier.slice(off, max_rows)
            pq.write_table(sl, path)
            paths.append(path)
            rows.append(sl.num_rows)
        return paths, rows, clash, t.num_rows

    def replay_events_arrow(self, digests, kinds, now: float):
        """Arrow-argument variant of replay: the driver ships pa.Arrays
        (cheap serialization) and the to_pylist() cost runs here — on the
        shard, in parallel across shards — instead of on the driver."""
        import numpy as _np

        out = self.replay_events_batch(digests.to_pylist(),
                                       kinds.to_numpy().tolist(), now)
        return _np.asarray(out, dtype=bool)

    def replay_events_batch(self, digests: list[str], kinds: list[int],
                            now: float) -> list[bool]:
        """Round-commit replay (the publish gate P5 + the fetch stage's
        deferred mutations): events arrive ordered by discovery seq and are
        replayed per digest, reproducing the reference's sequential
        interleaving of Incr/Set/publish-gate (workflow.go:107,136,273-291).

        kinds: 0=publish attempt, 1=reset-to-ReadyToEnqueue, 2=INCR
        (stages/publish.py EV_* constants).  Returns True per position for
        publish attempts that won (status was < Enqueued at replay point).
        """
        out = [False] * len(digests)
        state: dict[str, int] = {}
        touched: set[str] = set()
        store = self.store  # inline hot path: no per-event method calls
        state_get = state.get
        store_get = store.get
        for i, (d, k) in enumerate(zip(digests, kinds)):
            s = state_get(d)
            if s is None:
                ent = store_get(d)
                # expired entries read as missing (lazy deletion happens
                # on the get/exists paths, not in the replay hot loop)
                s = ent[0] if ent is not None and ent[1] > now else 0
            if k == 0:      # ATTEMPT (the overwhelmingly common event)
                if s < 1:
                    s = 1
                    out[i] = True
                    touched.add(d)
            elif k == 2:    # INCR
                s += 1
                touched.add(d)
            else:           # RESET
                s = 0
                touched.add(d)
            state[d] = s
        tl = list(touched)
        self._put_many(tl, [state[d] for d in tl], now)
        self.ops += len(digests)
        return out

    # -- maintenance ------------------------------------------------------
    def purge_expired(self, now: float) -> int:
        dead = [d for d, (_, exp) in self.store.items() if exp <= now]
        for d in dead:
            del self.store[d]
        if dead:
            self.cuckoo.delete_many(keys_u64(dead))
        return len(dead)

    def high_counters(self, now: float) -> dict:
        """All live digests with status > 1 (5XX retry counters) — the
        only statuses the fetch-time abort gate can trigger on
        (workflow.go:93-98 with maxRetries >= 1).  Small by construction:
        one entry per URL with a pending 5XX history."""
        return {d: s for d, (s, exp) in self.store.items()
                if s > 1 and exp > now}

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "keys": len(self.store),
            "ops": self.ops,
            "bloom_bytes": self.bloom.nbytes,
            "cuckoo_bytes": self.cuckoo.nbytes,
            "cuckoo_load": self.cuckoo.load_factor,
        }

    def health(self) -> str:
        """Healthcheck analog (reference healthcheck.go:11-79)."""
        return "ok"

    # -- checkpoint -------------------------------------------------------
    def snapshot_table(self) -> pa.Table:
        digests = list(self.store.keys())
        statuses = [self.store[d][0] for d in digests]
        expires = [self.store[d][1] for d in digests]
        return pa.table({
            "digest": pa.array(digests, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "expire_at": pa.array(expires, pa.float64()),
        })

    def snapshot_to(self, path: str) -> int:
        t = self.snapshot_table()
        pq.write_table(t, path)
        return t.num_rows

    def load_table(self, t: pa.Table) -> int:
        """REPLACE shard state with the snapshot (a load into a shard that
        already holds state — e.g. resume attaching to live actors —
        must not merge: digests absent from the snapshot would otherwise
        survive and suppress re-publishes after resume)."""
        self.reset()
        digests = t["digest"].to_pylist()
        statuses = t["status"].to_pylist()
        expires = t["expire_at"].to_pylist()
        for d, s, e in zip(digests, statuses, expires):
            self.store[d] = (s, e)
        if digests:
            # rebuild filters from the (now-populated) store at whatever
            # capacity the snapshot needs — one insert pass, no duplicates
            self._grow_filters(0)
        return len(digests)

    def load_from(self, path: str) -> int:
        return self.load_table(pq.read_table(path))


def make_shard_actors(num_shards: int, ttl_seconds: float,
                      expected_keys: int = 1 << 16, namespace: str = "seen"):
    """Create the shard actor pool.  Lazy ray import: library code never
    calls ray.init (driver owns the session)."""
    import ray

    # num_cpus=0: shards are reactive (short bursts serving RPCs) and must
    # always be schedulable — fractional reservations deadlock tiny
    # sessions (8 shards x 0.25 fills a 2-CPU session before the fetch
    # pool gets a token).
    # SPREAD: on a multi-node cluster the shards land on distinct nodes
    # (each node hosts ~S/nodes shards, so replay/commit parallelism and
    # seen-set memory scale with the cluster instead of stacking on the
    # head node — the "placement" half of the N->4N scaling design).  On
    # one node it is a no-op; a placement group is deliberately NOT used
    # because reserving whole-CPU bundles for bursty actors would idle
    # those cores during the fetch phase (measured single-node loss).
    actor_cls = ray.remote(num_cpus=0, max_restarts=2,
                           scheduling_strategy="SPREAD")(SeenShard)
    return [
        actor_cls.options(name=f"{namespace}_shard_{i}", get_if_exists=True)
        .remote(i, ttl_seconds, expected_keys)
        for i in range(num_shards)
    ]


class SeenSet:
    """Client over the shards — splits batches by digest routing, fires
    per-shard calls, reassembles results in input order.

    ``remote=False`` runs against plain in-process SeenShard objects (the
    oracle / unit-test path); ``remote=True`` against Ray actors
    (ray.get on the scattered calls).
    """

    def __init__(self, shards, remote: bool) -> None:
        self.shards = shards
        self.remote = remote
        self.num_shards = len(shards)

    @classmethod
    def local(cls, num_shards: int, ttl_seconds: float,
              expected_keys: int = 1 << 16) -> "SeenSet":
        return cls([SeenShard(i, ttl_seconds, expected_keys)
                    for i in range(num_shards)], remote=False)

    @classmethod
    def actors(cls, num_shards: int, ttl_seconds: float,
               expected_keys: int = 1 << 16,
               namespace: str = "seen") -> "SeenSet":
        return cls(make_shard_actors(num_shards, ttl_seconds, expected_keys,
                                     namespace), remote=True)

    # -- routing ----------------------------------------------------------
    def _route(self, digests: list[str]):
        shard_ids = (keys_u64(digests) % np.uint64(self.num_shards)).astype(
            np.int64)
        order = np.argsort(shard_ids, kind="stable")
        bounds = np.searchsorted(shard_ids[order],
                                 np.arange(self.num_shards + 1))
        groups = []
        for s in range(self.num_shards):
            idx = order[bounds[s]:bounds[s + 1]]
            if len(idx):
                groups.append((s, idx, [digests[i] for i in idx]))
        return groups

    def _call(self, method: str, digests: list[str], *args,
              empty_dtype=np.int64):
        """Scatter-gather with result reassembly in input order.  Empty
        input round-trips as an empty TYPED array (never None)."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=empty_dtype)
        groups = self._route(digests)
        results = [None] * len(groups)
        if self.remote:
            import ray

            refs = [getattr(self.shards[s], method).remote(dg, *args)
                    for s, _, dg in groups]
            results = ray.get(refs)
        else:
            results = [getattr(self.shards[s], method)(dg, *args)
                       for s, _, dg in groups]
        first = next((r for r in results if r is not None), None)
        if first is None:
            return None
        out = np.zeros(n, dtype=np.asarray(first).dtype)
        for (s, idx, _), res in zip(groups, results):
            out[idx] = res
        return out

    # -- public batch API --------------------------------------------------
    def get(self, digests: list[str], now: float) -> np.ndarray:
        return self._call("get_batch", digests, now)

    def set(self, digests: list[str], status: int, now: float) -> None:
        groups = self._route(digests)
        if self.remote:
            import ray

            ray.get([self.shards[s].set_batch.remote(dg, status, now)
                     for s, _, dg in groups])
        else:
            for s, _, dg in groups:
                self.shards[s].set_batch(dg, status, now)

    def incr(self, digests: list[str], now: float) -> np.ndarray:
        return self._call("incr_batch", digests, now)

    def exists(self, digests: list[str], now: float) -> np.ndarray:
        return self._call("exists_batch", digests, now, empty_dtype=bool)

    def ttl(self, digests: list[str], now: float) -> np.ndarray:
        return self._call("ttl_batch", digests, now,
                          empty_dtype=np.float64)

    def enqueue_gate(self, digests: list[str], now: float) -> np.ndarray:
        return self._call("enqueue_gate_batch", digests, now,
                          empty_dtype=bool)

    # -- maintenance / checkpoint -----------------------------------------
    def stats(self) -> list[dict]:
        if self.remote:
            import ray

            return ray.get([s.stats.remote() for s in self.shards])
        return [s.stats() for s in self.shards]

    def health(self) -> list[str]:
        if self.remote:
            import ray

            return ray.get([s.health.remote() for s in self.shards])
        return [s.health() for s in self.shards]

    def snapshot(self, directory: str) -> None:
        import os

        os.makedirs(directory, exist_ok=True)
        paths = [os.path.join(directory, f"shard_{i:04d}.parquet")
                 for i in range(self.num_shards)]
        if self.remote:
            import ray

            ray.get([s.snapshot_to.remote(p)
                     for s, p in zip(self.shards, paths)])
        else:
            for s, p in zip(self.shards, paths):
                s.snapshot_to(p)

    def load(self, directory: str) -> None:
        import os

        paths = [os.path.join(directory, f"shard_{i:04d}.parquet")
                 for i in range(self.num_shards)]
        if self.remote:
            import ray

            ray.get([s.load_from.remote(p)
                     for s, p in zip(self.shards, paths) if os.path.exists(p)])
        else:
            for s, p in zip(self.shards, paths):
                if os.path.exists(p):
                    s.load_from(p)

    def to_table(self) -> pa.Table:
        """All live entries across shards (small-result debugging/golden)."""
        if self.remote:
            import ray

            tables = ray.get([s.snapshot_table.remote() for s in self.shards])
        else:
            tables = [s.snapshot_table() for s in self.shards]
        return pa.concat_tables(tables)

    def shutdown(self) -> None:
        if self.remote:
            import ray

            for s in self.shards:
                ray.kill(s)
        self.shards = []
