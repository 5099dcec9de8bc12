"""Cuckoo filter (Fan et al., CoNEXT 2014 — public algorithm).

North-rule component: approximate membership with DELETION support (the
bloom filter can't delete, but TTL expiry must remove keys).  4-slot
buckets, 16-bit fingerprints (~0.01% fpp at 95% load), partial-key
cuckoo hashing: the alternate bucket is ``i ^ hash(fp)`` so relocation
needs only the fingerprint.

Lookups are vectorized over numpy key arrays; inserts are amortized-fast
(vector fast path for empty slots, Python eviction loop only on
collisions).
"""

from __future__ import annotations

import numpy as np

_FP_SEED = np.uint64(0x9E3779B97F4A7C15)
MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int) -> None:
        capacity = max(capacity, 64)
        nbuckets = 1 << (int(capacity / 4 / 0.95) - 1).bit_length()
        self.nbuckets = nbuckets
        self._mask = np.uint64(nbuckets - 1)
        # 0 = empty slot
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)
        self.count = 0

    # -- hashing ----------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys * _FP_SEED) >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self._mask).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((idx.astype(np.uint64) ^ h) & self._mask).astype(np.int64)

    # -- ops --------------------------------------------------------------
    def _alt_index_scalar(self, idx: int, fp: int) -> int:
        return (idx ^ ((fp * 0x5BD1E995) & 0xFFFFFFFFFFFFFFFF)) & (
            self.nbuckets - 1)

    def insert_many(self, keys: np.ndarray) -> int:
        """Insert; returns number that failed (filter full).  Duplicates
        are inserted again (multiset semantics, like the paper).

        Fully vectorized fast path: repeated WAVES where, per wave, the
        first not-yet-placed key of each distinct bucket takes that
        bucket's first empty slot (conflict-free fancy-index writes);
        alternates between the two candidate buckets.  Only keys whose
        both buckets are full fall to the scalar eviction loop (rare
        below ~90% load).  The previous per-key scalar loop cost
        ~3us/key and dominated large round commits (seen-set replay)."""
        if len(keys) == 0:
            return 0
        keys = keys.astype(np.uint64)
        fps = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fps)
        n = len(keys)
        done = np.zeros(n, dtype=bool)
        for _ in range(8):  # 2 buckets x 4 slots upper-bounds the waves
            progress = False
            for idx_arr in (i1, i2):
                rem = np.nonzero(~done)[0]
                if len(rem) == 0:
                    break
                b = idx_arr[rem]
                order = np.argsort(b, kind="stable")
                bs = b[order]
                first = np.ones(len(bs), dtype=bool)
                first[1:] = bs[1:] != bs[:-1]
                cand = rem[order[first]]
                cb = idx_arr[cand]
                slots = self.table[cb]          # (m, 4) gather
                empty = slots == 0
                has = empty.any(axis=1)
                if not has.any():
                    continue
                slot = empty.argmax(axis=1)
                sel = cand[has]
                self.table[cb[has], slot[has]] = fps[sel]
                self.count += len(sel)
                done[sel] = True
                progress = True
            if done.all() or not progress:
                break
        failed = 0
        rest = np.nonzero(~done)[0]
        if len(rest):
            flat = self.table.reshape(-1)
            # saturation bail: once one insert exhausts MAX_KICKS with the
            # table ~full, further kick loops are futile (measured: 147s
            # for 42k inserts at 99% load without this) — count the rest
            # failed immediately; the caller treats overflow>0 as "filter
            # lossy" either way
            give_up = int(0.98 * self.nbuckets * 4)
            for j in rest:
                if failed and self.count >= give_up:
                    failed += 1
                    continue
                if not self._insert_one_fast(flat, int(fps[j]),
                                             int(i1[j])):
                    failed += 1
        return failed

    def _insert_one_fast(self, flat, fp: int, i1: int) -> bool:
        base = i1 * 4
        for s in range(4):
            if flat[base + s] == 0:
                flat[base + s] = fp
                self.count += 1
                return True
        i2 = self._alt_index_scalar(i1, fp)
        base = i2 * 4
        for s in range(4):
            if flat[base + s] == 0:
                flat[base + s] = fp
                self.count += 1
                return True
        # evict loop
        rng_state = (fp * 0x9E3779B1 + i1) & 0xFFFFFFFF
        idx = i1
        for _ in range(MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0xFFFFFFFF
            slot = rng_state & 3
            pos = idx * 4 + slot
            fp, flat[pos] = int(flat[pos]), fp
            idx = self._alt_index_scalar(idx, fp)
            base = idx * 4
            for s in range(4):
                if flat[base + s] == 0:
                    flat[base + s] = fp
                    self.count += 1
                    return True
        return False

    def _insert_one(self, fp: int, i1: int) -> bool:
        return self._insert_one_fast(self.table.reshape(-1), fp, i1)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        keys = keys.astype(np.uint64)
        fps = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fps)
        hit1 = (self.table[i1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_many(self, keys: np.ndarray) -> int:
        """Delete one copy of each key's fingerprint; returns #deleted."""
        deleted = 0
        if len(keys) == 0:
            return 0
        keys = keys.astype(np.uint64)
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for idx in (i1, i2):
                slots = np.nonzero(self.table[idx] == fp)[0]
                if len(slots):
                    self.table[idx, slots[0]] = 0
                    self.count -= 1
                    deleted += 1
                    break
        return deleted

    @property
    def load_factor(self) -> float:
        return self.count / (self.nbuckets * 4)

    @property
    def nbytes(self) -> int:
        return self.table.nbytes
