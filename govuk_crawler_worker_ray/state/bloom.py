"""Vectorized numpy Bloom filter.

North-rule component: the bloom PRE-FILTER in front of each seen-set shard
(SURVEY.md §2.4).  Keys are 64-bit integers derived from URL digests (the
digests are already uniform, so double hashing h1 + i*h2 suffices —
Kirsch & Mitzenmacher 2006, public result).

At 10^10 URLs across S shards with ~10 bits/key this is ~1.2 GB per
shard of 10^9 keys — the arithmetic that motivates sharding (SURVEY.md
§7.4).  Sized here by expected keys + target fpp.
"""

from __future__ import annotations

import math

import numpy as np

# 1 << j lookup: np.uint64 ops with BROADCAST operands (scalar-first
# shifts, differing-shape arithmetic) hit a ~500x-slow non-SIMD numpy
# loop on this numpy build (measured: 5.7s vs 7ms for 200k x 8 keys,
# BASELINE.md round 3) — gather from a precomputed table instead
_BIT = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))


class BloomFilter:
    def __init__(self, expected_keys: int, fpp: float = 0.01) -> None:
        expected_keys = max(expected_keys, 1)
        m = int(-expected_keys * math.log(fpp) / (math.log(2) ** 2))
        self.num_bits = max(64, 1 << (m - 1).bit_length())  # pow2 for masking
        self.num_hashes = max(1, round(m / expected_keys * math.log(2)))
        self.bits = np.zeros(self.num_bits // 64, dtype=np.uint64)
        self._mask = np.uint64(self.num_bits - 1)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing.  k-term loop of
        contiguous 1D ops: the one-liner broadcast form
        ``h1[:,None] + ks[None,:]*h2[:,None]`` costs ~500x more on this
        numpy build (uint64 broadcast pathology, see _BIT note)."""
        k = self.num_hashes
        out = np.empty((k, len(h1)), dtype=np.uint64)
        for j in range(k):
            np.multiply(h2, np.uint64(j), out=out[j])
            out[j] += h1
            out[j] &= self._mask
        return out

    @staticmethod
    def split_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = keys
        # cheap second hash: xorshift-multiply (splitmix64 finalizer)
        h2 = keys ^ (keys >> np.uint64(33))
        h2 = h2 * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)
        return h1, h2

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(*self.split_hashes(keys.astype(np.uint64)))
        # .view(int64) before any FANCY INDEXING: indexing with a uint64
        # array takes a non-vectorized conversion path on this numpy
        # build (measured 1.5 s vs 4 ms for a 1.7M-element gather —
        # cProfile showed it dominating whole shard commits); masked
        # values are < num_bits so the reinterpret is lossless
        word = (pos >> np.uint64(6)).ravel().view(np.int64)
        bit = _BIT[(pos & np.uint64(63)).ravel().view(np.int64)]
        # sort + segment-OR (reduceat): np.bitwise_or.at is an unbuffered
        # ufunc scatter at ~2us/element — it alone dominated large
        # seen-set replays (~2s per 128k keys); this path is ~30x faster
        order = np.argsort(word)  # stability irrelevant for OR-reduce
        w = word[order]
        b = bit[order]
        first = np.ones(len(w), dtype=bool)
        first[1:] = w[1:] != w[:-1]
        starts = np.nonzero(first)[0]
        vals = np.bitwise_or.reduceat(b, starts)
        self.bits[w[starts]] |= vals

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean array: False = DEFINITELY not present."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(*self.split_hashes(keys.astype(np.uint64)))
        word = (pos >> np.uint64(6)).view(np.int64)  # see add_many note
        bit = _BIT[(pos & np.uint64(63)).view(np.int64)]
        return ((self.bits[word] & bit) != 0).all(axis=0)

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes

    @classmethod
    def from_bits(cls, bits: np.ndarray, num_hashes: int) -> "BloomFilter":
        """Wrap an existing pow2-sized bit array (e.g. an OR-merge of
        per-batch partial filters — blooms with identical geometry merge
        by bitwise OR, which is what makes them a distributable
        combiner)."""
        bf = cls.__new__(cls)
        bf.num_bits = len(bits) * 64
        assert bf.num_bits & (bf.num_bits - 1) == 0, "bits must be pow2"
        bf.num_hashes = num_hashes
        bf.bits = bits
        bf._mask = np.uint64(bf.num_bits - 1)
        return bf

    @classmethod
    def empty(cls, num_bits: int, num_hashes: int) -> "BloomFilter":
        return cls.from_bits(np.zeros(num_bits // 64, dtype=np.uint64),
                             num_hashes)
