"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard (north-rule training-data ops).

Scale shapes:
- exact: content-hash column in a vectorized ``map_batches``, then ONE
  hash shuffle on the digest (groupby) keeping the min doc_id — the
  canonical exact-dedup plan;
- MinHash-LSH: shingle -> 64 minhashes per doc (numpy, vectorized per
  batch) -> explode to (band_id, band_hash, doc_id) NARROW rows ->
  groupby(band) -> candidate pairs within buckets -> Jaccard verify ->
  connected components.  Only narrow band rows shuffle; text never moves
  after the minhash pass;
- SimHash: 64-bit signature per doc, hamming<=k via banded exact match.

Determinism: hash seeds are fixed constants; no wall clock, no RNG at
query time.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_PERM = 64
NUM_BANDS = 16   # 16 bands x 4 rows
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(12345)  # module-load constant => deterministic
_A = _RNG.integers(1, _MERSENNE, size=NUM_PERM, dtype=np.uint64)
_B = _RNG.integers(0, _MERSENNE, size=NUM_PERM, dtype=np.uint64)


def cpu_split(ds):
    """Split blocks so a CPU-heavy map stage can use the whole machine —
    a small input file otherwise arrives as one block and the stage runs
    serial (measured: 121s -> ~8s for the minhash pass at 32 CPUs)."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return ds.repartition(max(2, n))


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """md5 hex of the exact text (matches DuckDB ``md5(text)``)."""
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch["text"].to_pylist()]
    return batch.append_column("content_hash",
                               pa.array(hashes, pa.string()))


def exact_dedup(ds):
    """-> one row per distinct text: (content_hash, doc_id=min, n_dups).
    Plan: vectorized hash -> narrow projection -> single groupby."""
    from ray.data.aggregate import Count, Min

    hashed = (ds.map_batches(content_hash_batch, batch_format="pyarrow")
              .select_columns(["doc_id", "content_hash"]))
    return (hashed.groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups")))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

_P = np.uint64(1099511628211)
_POW = None  # p^(k-1-j) table, built per k


def _token_hashes(toks: list[str], cache: dict) -> np.ndarray:
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                "big")
            cache[t] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int = 5,
                    cache: dict | None = None) -> np.ndarray:
    """k-word shingle hashes: per-token blake2b (memoized across the
    batch) combined by a vectorized degree-k polynomial in uint64
    (natural wraparound) — no per-shingle hashing."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks, cache if cache is not None else {})
    if len(toks) < k:
        k = len(toks)
    powers = _P ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    n = len(th) - k + 1
    # strided windows x powers, summed — all numpy
    windows = np.lib.stride_tricks.sliding_window_view(th, k)
    return (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)[:n]


def minhash_signature(text: str, k: int = 5,
                      cache: dict | None = None) -> np.ndarray:
    h = _shingle_hashes(text, k, cache)
    if len(h) == 0:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    # (a*x + b) mod M over all shingles, min per permutation
    vals = (h[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands_batch(batch: pa.Table, k: int = 5) -> pa.Table:
    """docs -> exploded (band_id, band_hash, doc_id) narrow rows."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    cache: dict = {}  # token-hash memo shared across the batch
    out_doc: list = []
    out_band: list[int] = []
    out_hash: list[int] = []
    for d, t in zip(doc_ids, texts):
        sig = minhash_signature(t, k, cache)
        bands = sig.reshape(NUM_BANDS, ROWS_PER_BAND)
        for b in range(NUM_BANDS):
            bh = int.from_bytes(
                hashlib.blake2b(bands[b].tobytes(),
                                digest_size=8).digest(), "big")
            out_doc.append(d)
            out_band.append(b)
            out_hash.append(bh)
    return pa.table({
        "doc_id": pa.array(out_doc),
        "band_id": pa.array(out_band, pa.int32()),
        "band_hash": pa.array([f"{h:016x}" for h in out_hash], pa.string()),
    })


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k)), set(_shingle_hashes(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dedup(ds, threshold: float = 0.8, k: int = 5):
    """-> candidate near-dup pairs (doc_a < doc_b, jaccard >= threshold).

    Stages: minhash+bands (vectorized map_batches) -> groupby(band) for
    bucket candidates (narrow shuffle) -> pair verify (Jaccard over
    shingles, recomputed only for candidate pairs — at most
    O(bucket^2) per bucket) -> distinct pairs.
    Returns a pyarrow Table (pairs are a small result set).
    """
    import pandas as pd

    bands = cpu_split(ds).map_batches(lambda b: minhash_bands_batch(b, k),
                                      batch_format="pyarrow")

    # almost every band bucket is a singleton: aggregate counts first
    # (cheap combiner groupby), keep only COLLIDED buckets, and generate
    # pairs from that small set — map_groups over every singleton bucket
    # costs per-group Python overhead x num_docs x num_bands.
    from ray.data.aggregate import Count

    counts = (bands.groupby(["band_id", "band_hash"])
              .aggregate(Count(alias_name="n")))
    hot = counts.filter(expr="n > 1").to_pandas()
    if len(hot) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    hot_keys = set(zip(hot["band_id"], hot["band_hash"]))

    def only_hot(b: pa.Table) -> pa.Table:
        bid = b["band_id"].to_pylist()
        bh = b["band_hash"].to_pylist()
        mask = pa.array([(i, h) in hot_keys for i, h in zip(bid, bh)])
        return b.filter(mask)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = (bands.map_batches(only_hot, batch_format="pyarrow")
             .groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    pdf = pdf.drop_duplicates().reset_index(drop=True)
    # verify candidates against the real shingle sets
    texts = _collect_texts(ds, set(pdf["doc_a"]) | set(pdf["doc_b"]))
    keep_a, keep_b, keep_j = [], [], []
    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        j = jaccard(texts[a], texts[b], k)
        if j >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            keep_j.append(round(j, 6))
    return pa.table({"doc_a": pa.array(keep_a),
                     "doc_b": pa.array(keep_b),
                     "jaccard": pa.array(keep_j, pa.float64())})


def _collect_texts(ds, ids: set) -> dict:
    """Fetch texts for a (small) candidate id set via a broadcast
    semi-join filter — only candidate rows reach the driver."""
    idlist = pa.array(sorted(ids))

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=idlist))

    out = {}
    for batch in (ds.map_batches(flt, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            out[d] = t
    return out


def connected_components(pairs: pa.Table) -> pa.Table:
    """Union-find over verified pairs (candidate set is small by
    construction; at larger scale switch to iterative min-label
    propagation rounds — documented scale path)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((d, find(d)) for d in parent)
    return pa.table({"doc_id": pa.array([r[0] for r in rows]),
                     "component": pa.array([r[1] for r in rows])})


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (Charikar 2002)."""
    out = []
    for t in batch["text"].to_pylist():
        toks = t.split()
        if not toks:
            out.append(0)
            continue
        hs = np.array([int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
            "big") for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sig = int((v > 0).astype(np.uint64)
                  .dot(np.left_shift(np.uint64(1),
                                     np.arange(64, dtype=np.uint64))))
        out.append(sig)
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array([f"{v:016x}" for v in out], pa.string()),
    })


def simhash_signatures(ds):
    return cpu_split(ds).map_batches(simhash_batch, batch_format="pyarrow")
