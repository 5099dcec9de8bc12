"""Similarity search over the ``embeddings`` table (vec_id,
embedding: list<float>, label).

- ``knn_bruteforce``: exact cosine top-k.  The query matrix is broadcast
  (ray.put once); each batch does one float64 matmul against it and
  emits only its LOCAL top-k partials — the driver merges k*num_batches
  candidate rows, never the full score matrix.  This is the baseline and
  the verifier for the approximate path.
- ``lsh_knn``: random-hyperplane LSH (fixed seed): each vector gets a
  B-bit bucket signature; queries probe their own bucket plus
  single-bit-flip neighbors, scoring only those rows — the scale path
  (at 10^10 rows the bucket index is a partitioned table keyed by
  signature; here bucketing is a column + groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_HYPERPLANE_SEED = 20240817
_NUM_BITS = 12


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = batch["embedding"].combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(ds, query_vec: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k: per-batch partial top-k, driver merge."""
    import ray

    q = query_vec.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        ids, m = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        scores = _normalize(m) @ qv
        top = min(k, len(ids))
        idx = np.argpartition(-scores, top - 1)[:top]
        return pa.table({"vec_id": pa.array(ids[idx], pa.int64()),
                         "cosine": pa.array(scores[idx], pa.float64())})

    parts = []
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        parts.append(b)
    allp = pa.concat_tables(parts)
    ids = allp["vec_id"].to_numpy()
    sc = allp["cosine"].to_numpy()
    # deterministic ranking: score desc, vec_id asc tiebreak
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "cosine": pa.array(np.round(sc[order], 6), pa.float64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    })


def _signatures(m: np.ndarray, dim: int) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((dim, _NUM_BITS))
    bits = (m @ planes) > 0
    # pack in int64 (uint64 broadcast ops are ~500x slower on this
    # numpy build — state/bloom.py _BIT note); values < 2^12 so the
    # cast back to uint64 is lossless
    w = np.left_shift(np.int64(1), np.arange(_NUM_BITS, dtype=np.int64))
    return (bits.astype(np.int64) * w[None, :]).sum(axis=1).astype(
        np.uint64)


def lsh_knn(ds, query_vec: np.ndarray, k: int = 10) -> pa.Table:
    """Approximate top-k: score only rows in the query's LSH bucket or a
    1-bit-flip neighbor bucket (multi-probe)."""
    q = query_vec.astype(np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    dim = len(q)
    qsig = int(_signatures(qn[None, :], dim)[0])
    probe = {qsig} | {qsig ^ (1 << b) for b in range(_NUM_BITS)}
    probe_arr = pa.array(sorted(np.uint64(p) for p in probe),
                         pa.uint64())

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids, m = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sigs = _signatures(_normalize(m), m.shape[1])
        mask = pc.is_in(pa.array(sigs, pa.uint64()), value_set=probe_arr)
        sel = mask.to_numpy(zero_copy_only=False)
        if not sel.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        scores = _normalize(m[sel]) @ qn
        return pa.table({"vec_id": pa.array(ids[sel], pa.int64()),
                         "cosine": pa.array(scores, pa.float64())})

    parts = [b for b in (ds.map_batches(partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))]
    allp = pa.concat_tables(parts) if parts else pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())})
    ids = allp["vec_id"].to_numpy()
    sc = allp["cosine"].to_numpy()
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "cosine": pa.array(np.round(sc[order], 6), pa.float64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    })


class LshIndex:
    """Persisted hyperplane-LSH bucket index over an embedding dataset —
    the scale path ``lsh_knn`` documents: build ONCE (a vectorized
    signature pass; bucket-sorted arrays), then probe per query without
    rescanning the dataset.  The built index is broadcast via ray.put
    and shared zero-copy by query tasks; at 10^10 rows the same layout
    becomes a signature-sorted parquet/Lance table and probes read only
    the matching row ranges.

    Ranking semantics (score desc, vec_id asc, same multi-probe set)
    are identical to ``lsh_knn`` — pinned by
    tests/test_pipelines.py::test_lsh_index_matches_scan.
    """

    def __init__(self, sigs: np.ndarray, ids: np.ndarray,
                 matrix: np.ndarray) -> None:
        order = np.lexsort((ids, sigs))
        self.sigs = sigs[order]
        self.ids = ids[order]
        self.matrix = matrix[order]

    @classmethod
    def build(cls, ds) -> "LshIndex":
        def part(batch: pa.Table) -> pa.Table:
            ids, m = _to_matrix(batch)
            if len(ids) == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "sig": pa.array([], pa.uint64()),
                                 "nvec": pa.array(
                                     [], pa.list_(pa.float64()))})
            mn = _normalize(m)
            sigs = _signatures(mn, m.shape[1])
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.uint64()),
                "nvec": pa.array(list(mn), pa.list_(pa.float64())),
            })

        ids_l, sigs_l, vecs_l = [], [], []
        for b in (ds.map_batches(part, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            ids_l.append(b["vec_id"].to_numpy())
            sigs_l.append(b["sig"].to_numpy())
            vecs_l.append(np.stack(
                b["nvec"].to_numpy(zero_copy_only=False))
                if b.num_rows else np.zeros((0, 1)))
        ids = np.concatenate(ids_l) if ids_l else np.zeros(0, np.int64)
        sigs = (np.concatenate(sigs_l) if sigs_l
                else np.zeros(0, np.uint64))
        mat = (np.vstack([v for v in vecs_l if v.size])
               if any(v.size for v in vecs_l) else np.zeros((0, 1)))
        return cls(sigs, ids, mat)

    def query(self, query_vec: np.ndarray, k: int = 10) -> pa.Table:
        q = query_vec.astype(np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        qsig = int(_signatures(qn[None, :], len(q))[0])
        probe = sorted({qsig} | {qsig ^ (1 << b)
                                 for b in range(_NUM_BITS)})
        cand = []
        for p in probe:
            lo = np.searchsorted(self.sigs, np.uint64(p), side="left")
            hi = np.searchsorted(self.sigs, np.uint64(p), side="right")
            if hi > lo:
                cand.append(np.arange(lo, hi))
        if not cand:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64())})
        idx = np.concatenate(cand)
        scores = self.matrix[idx] @ qn
        ids = self.ids[idx]
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(np.round(scores[order], 6), pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

_IVF_ITERS = 8


def train_ivf_centroids(sample: np.ndarray, n_clusters: int,
                        iters: int = _IVF_ITERS) -> np.ndarray:
    """Deterministic spherical k-means: init = evenly spaced rows of the
    (caller-ordered) sample, fixed iteration count, cosine assignment
    with first-max tiebreak, empty clusters keep their previous
    centroid.  No RNG, no wall clock — same sample => same codebook."""
    sample = _normalize(sample.astype(np.float64))
    k = min(n_clusters, len(sample))
    cent = sample[np.linspace(0, len(sample) - 1, k).astype(np.int64)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cent[c] = v / nrm
    return cent


def ivf_knn(ds, query_vec: np.ndarray, k: int = 10,
            n_clusters: int = 16, nprobe: int = 4,
            sample_size: int = 2048) -> pa.Table:
    """Approximate cosine top-k via an IVF coarse quantizer:

      1. TRAIN: the codebook trains on the ``sample_size`` smallest-
         vec_id vectors (gathered with a per-batch partial bottom-k
         merge — deterministic and order-independent, never a full
         collect), driver-side spherical k-means (the codebook is tiny);
      2. PROBE: the query picks its ``nprobe`` nearest centroids;
      3. SCAN: one broadcast of the codebook + probe set; each batch
         assigns its rows to centroids (one matmul), keeps only rows in
         probed cells, scores exact cosine, emits LOCAL top-k partials;
         the driver merges k * num_batches candidate rows.

    At 10^10 rows the assignment pass runs once at ingest and the table
    is written partitioned by centroid id (like ``LshIndex``'s
    signature-sorted layout); probes then read only ``nprobe``
    partitions.  With ``nprobe == n_clusters`` this is exactly
    ``knn_bruteforce`` (pinned by tests)."""
    import ray

    # pass 1: deterministic sample = bottom-`sample_size` vec_ids
    sample = _bottom_sample(ds, sample_size)
    if sample is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    cent = train_ivf_centroids(sample, n_clusters)

    q = query_vec.astype(np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cent @ qn), kind="stable")[:nprobe]
    cref = ray.put((cent, np.sort(probe)))

    def partial(batch: pa.Table) -> pa.Table:
        cent_, probe_ = ray.get(cref)
        ids, m = _to_matrix(batch)
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        mn = _normalize(m)
        assign = (mn @ cent_.T).argmax(axis=1)
        sel = np.isin(assign, probe_)
        if not sel.any():
            return empty
        scores = mn[sel] @ qn
        top = min(k, int(sel.sum()))
        idx = np.argpartition(-scores, top - 1)[:top]
        return pa.table({"vec_id": pa.array(ids[sel][idx], pa.int64()),
                         "cosine": pa.array(scores[idx], pa.float64())})

    parts = [b for b in (ds.map_batches(partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))]
    allp = pa.concat_tables(parts) if parts else pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())})
    ids = allp["vec_id"].to_numpy()
    sc = allp["cosine"].to_numpy()
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "cosine": pa.array(np.round(sc[order], 6), pa.float64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    })


class IvfIndex:
    """Persisted IVF layout over an embedding dataset — the scale path
    ``ivf_knn`` documents, made concrete (mirrors ``LshIndex``): train
    the codebook once, assign every vector once (a vectorized
    map_batches pass), store rows SORTED by centroid id so each probe
    reads a contiguous range.  At 10^10 rows the same layout is a
    centroid-partitioned parquet/Lance table and probes read only
    ``nprobe`` partitions.

    Ranking semantics (same codebook spec, probe order, score-desc /
    vec_id-asc tiebreaks) are identical to ``ivf_knn`` — pinned by
    tests/test_pipelines.py::test_ivf_index_matches_scan."""

    def __init__(self, assign: np.ndarray, ids: np.ndarray,
                 matrix: np.ndarray, centroids: np.ndarray) -> None:
        order = np.lexsort((ids, assign))
        self.assign = assign[order]
        self.ids = ids[order]
        self.matrix = matrix[order]
        self.centroids = centroids

    @classmethod
    def build(cls, ds, n_clusters: int = 16,
              sample_size: int = 2048) -> "IvfIndex":
        import ray

        sample = _bottom_sample(ds, sample_size)
        if sample is None:
            z = np.zeros(0, np.int64)
            return cls(z, z, np.zeros((0, 1)), np.zeros((1, 1)))
        cent = train_ivf_centroids(sample, n_clusters)
        cref = ray.put(cent)

        def assign_rows(batch: pa.Table) -> pa.Table:
            cent_ = ray.get(cref)
            ids, m = _to_matrix(batch)
            if len(ids) == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "cid": pa.array([], pa.int64()),
                                 "nvec": pa.array(
                                     [], pa.list_(pa.float64()))})
            mn = _normalize(m)
            cid = (mn @ cent_.T).argmax(axis=1).astype(np.int64)
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "cid": pa.array(cid, pa.int64()),
                "nvec": pa.array(list(mn), pa.list_(pa.float64())),
            })

        ids_l, cid_l, vecs_l = [], [], []
        for b in (ds.map_batches(assign_rows, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            if b.num_rows:
                ids_l.append(b["vec_id"].to_numpy())
                cid_l.append(b["cid"].to_numpy())
                vecs_l.append(np.stack(
                    b["nvec"].to_numpy(zero_copy_only=False)))
        ids = (np.concatenate(ids_l) if ids_l
               else np.zeros(0, np.int64))
        cids = (np.concatenate(cid_l) if cid_l
                else np.zeros(0, np.int64))
        mat = (np.vstack(vecs_l) if vecs_l else np.zeros((0, 1)))
        return cls(cids, ids, mat, cent)

    def query(self, query_vec: np.ndarray, k: int = 10,
              nprobe: int = 4) -> pa.Table:
        q = query_vec.astype(np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        probe = np.sort(np.argsort(-(self.centroids @ qn),
                                   kind="stable")[:nprobe])
        cand = []
        for c in probe:
            lo = np.searchsorted(self.assign, c, side="left")
            hi = np.searchsorted(self.assign, c, side="right")
            if hi > lo:
                cand.append(np.arange(lo, hi))
        if not cand:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64())})
        idx = np.concatenate(cand)
        scores = self.matrix[idx] @ qn
        ids = self.ids[idx]
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(np.round(scores[order], 6), pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })


# near-dup LSH banding: 32 bands x 16 hyperplane bits.  Bits per band
# must scale with dataset size (~log2 N + margin) or buckets saturate
# and within-bucket pairing degenerates toward all-pairs: at 8 bits
# (256 buckets) a 2k-vector table already put ~8 vectors in EVERY
# bucket.  At 16 bits a random pair (cosine ~0, sep p=0.5/plane)
# collides per band with p = 0.5^16 ~= 1.5e-5, so hot buckets are rare
# and tiny; a qualifying pair at cosine >= 0.95 (sep p <= 0.101/plane)
# matches a band with p >= 0.899^16 = 0.182 and is missed by all 32
# bands with p <= (0.818)^32 ~= 1.6e-3 — and real near-dups sit at
# 0.99+ cosine where the miss probability is ~1e-21.  At 10^10 rows
# raise _ND_BITS to ~40 (or hash the band bits into a 64-bit bucket id)
# and shuffle on (band, bucket) instead of broadcasting hot keys.
_ND_SEED = 20250817
_ND_BANDS = 32
_ND_BITS = 16


def _nd_signatures(m: np.ndarray, dim: int) -> np.ndarray:
    """(n, bands) int64 bucket ids from fixed random hyperplanes."""
    rng = np.random.default_rng(_ND_SEED)
    planes = rng.standard_normal((dim, _ND_BANDS * _ND_BITS))
    bits = (m @ planes) > 0
    bits = bits.reshape(len(m), _ND_BANDS, _ND_BITS)
    weights = (1 << np.arange(_ND_BITS)).astype(np.int64)
    return (bits.astype(np.int64) * weights[None, None, :]).sum(axis=2)


def embedding_neardup_pairs(ds, threshold: float = 0.95) -> pa.Table:
    """All pairs with cosine >= threshold (embedding near-dup), computed
    distributed with NO full-dataset materialization:

      1. narrow signature rows (vec_id, band, bucket) per batch;
      2. groupby(band, bucket) count -> collided buckets only (driver
         holds only the tiny hot-bucket key set, broadcast via ray.put);
      3. second signature pass filters rows in hot buckets, CARRYING the
         embedding (only collided rows ship vectors);
      4. groupby(band, bucket).map_groups scores exact cosine within each
         bucket -> (vec_a, vec_b, cosine) pairs;
      5. driver dedups the (small) pair set across bands.

    Recall is probabilistic but engineered >= 1 - 1.4e-4 per qualifying
    pair at threshold 0.95 (see banding constants above); precision is
    exact (step 4 verifies with the true cosine).  Verified against the
    brute-force oracle on a planted-near-dup fixture in
    tests/test_pipelines.py."""
    import ray
    from ray.data.aggregate import Count

    # single int64 bucket key: band << bits | bucket (buckets < 2^bits
    # so the packing is collision-free); one fixed-width key keeps the
    # shuffle sort cheap
    def sig_narrow(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "bkey": pa.array([], pa.int64())})
        sigs = _nd_signatures(_normalize(m), m.shape[1])
        bands = np.tile(np.arange(_ND_BANDS, dtype=np.int64), len(ids))
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, _ND_BANDS), pa.int64()),
            "bkey": pa.array((bands << _ND_BITS) | sigs.ravel(),
                             pa.int64()),
        })

    # NOTE: callers must feed a multi-block dataset (split at the read,
    # __ray_entry__._read_sized) — a 1-block input serializes the sig
    # pass and makes the sort-aggregate pathological (8-10s vs ~1s)
    sigs = ds.map_batches(sig_narrow, batch_format="pyarrow")
    counts = sigs.groupby("bkey").aggregate(Count(alias_name="n"))
    hot = counts.filter(expr="n > 1")
    hot_parts = [b["bkey"].combine_chunks()
                 for b in hot.iter_batches(batch_format="pyarrow")]
    if not hot_parts or sum(len(p) for p in hot_parts) == 0:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    hot_ref = ray.put(pa.concat_arrays(
        [p if isinstance(p, pa.Array) else p.combine_chunks()
         for p in hot_parts]))

    def hot_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids, m = _to_matrix(batch)
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "bkey": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64()))})
        if len(ids) == 0:
            return empty
        mn = _normalize(m)
        sigs_ = _nd_signatures(mn, m.shape[1])
        bands = np.tile(np.arange(_ND_BANDS, dtype=np.int64), len(ids))
        comp = (bands << _ND_BITS) | sigs_.ravel()
        mask = pc.is_in(pa.array(comp, pa.int64()),
                        value_set=ray.get(hot_ref))
        sel = mask.to_numpy(zero_copy_only=False)
        if not sel.any():
            return empty
        rows = np.repeat(np.arange(len(ids)), _ND_BANDS)[sel]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, _ND_BANDS)[sel], pa.int64()),
            "bkey": pa.array(comp[sel], pa.int64()),
            "embedding": pa.array(list(mn[rows]), pa.list_(pa.float64())),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return empty
        m = np.stack(g["embedding"].to_numpy(zero_copy_only=False))
        scores = m @ m.T
        ai, bj = np.nonzero(np.triu(scores >= threshold, k=1))
        if len(ai) == 0:
            return empty
        a, b = ids[ai], ids[bj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({"vec_a": pa.array(a2, pa.int64()),
                         "vec_b": pa.array(b2, pa.int64()),
                         "cosine": pa.array(scores[ai, bj], pa.float64())})

    pairs = (ds.map_batches(hot_rows, batch_format="pyarrow")
             .groupby("bkey")
             .map_groups(bucket_pairs, batch_format="pyarrow"))
    parts = [b for b in pairs.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = pa.concat_tables(parts)
    a = out["vec_a"].to_numpy().astype(np.int64)
    b = out["vec_b"].to_numpy().astype(np.int64)
    c = out["cosine"].to_numpy()
    # dedup pairs found by multiple bands (final pair set is small):
    # sort by (a, b), keep first of each run
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                     "vec_b": pa.array(b[keep], pa.int64()),
                     "cosine": pa.array(np.round(c[keep], 6),
                                        pa.float64())})


def _quantize_codes(col) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """Shared int8-quantization kernel over an Arrow list<float>
    column: returns (q_flat int64 codes, offsets, lens, scale) — the
    exact arithmetic the quantize_embeddings oracle pins (float64
    127*x/max|x|, half-away-from-zero rounding, zero-vector guard)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy().astype(np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    lens = np.diff(offs)
    n = len(lens)
    starts = offs[:-1]
    m = np.zeros(n, dtype=np.float64)
    ne = lens > 0
    if ne.any():
        m[ne] = np.maximum.reduceat(np.abs(flat), starts[ne])
    mrep = np.repeat(np.where(m == 0, 1.0, m), lens)
    scaled = 127.0 * flat / mrep
    q = (np.sign(scaled)
         * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    q[np.repeat(m == 0, lens)] = 0
    return q, offs, lens, m


def quantize_embeddings(ds):
    """int8 scalar quantization per vector — the storage/bandwidth path
    for ANN at 10^10 vectors (4 bytes -> 1 byte per dim; IVF/LSH probe
    ranking is near-unchanged at this precision): (vec_id,
    scale = max|x| as float64, qvec_csv = round(127*x/scale) as int8).

    Pure per-row arithmetic in one vectorized ``map_batches`` over the
    flattened Arrow list buffer (reduceat per-row maxima) — no shuffle,
    no state.  Rounding is half-AWAY-FROM-ZERO (floor(|v|+0.5)*sign)
    to match SQL ``round`` semantics exactly, and the quantized vector
    serializes as CSV so engine and DuckDB compare hash-for-hash.
    Zero vectors quantize to zeros (scale 0 guarded identically on
    both sides)."""
    def qb(batch: pa.Table) -> pa.Table:
        q, offs, lens, m = _quantize_codes(batch["embedding"])
        starts = offs[:-1]
        csv = [",".join(map(str, q[s:s + ln]))
               for s, ln in zip(starts, lens)]
        return pa.table({
            "vec_id": batch["vec_id"],
            "scale": pa.array(m, pa.float64()),
            "qvec_csv": pa.array(csv, pa.string()),
        })

    return ds.map_batches(qb, batch_format="pyarrow")


def embedding_stats(ds):
    """Per-dimension corpus moments over the int8-quantized codes:
    (dim, n_vecs, sum_q, mean_q, var_q) — the single-pass profile every
    embedding-table health check needs (dead dims, scale drift) and the
    k-means/PCA building block.

    Quantized codes make the moments INTEGER-exact and therefore
    order-independent: float sums differ by partition order, int sums
    never do, so the result is reproducible at any cluster size and
    SQL-oracle-able.  Plan: per-batch partial (dim, n, sum, sumsq) —
    64 rows per batch regardless of batch size (np.add.reduceat over
    the flattened codes) — ONE tiny groupby(dim), then a final map
    derives mean/var doubles from the exact integers (single division
    each, deterministic)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        q, offs, lens, _ = _quantize_codes(b["embedding"])
        if len(lens) == 0 or lens.max() == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "p_n": pa.array([], pa.int64()),
                             "p_s": pa.array([], pa.int64()),
                             "p_ss": pa.array([], pa.int64())})
        d = int(lens.max())
        # uniform-length vectors: reshape is the vectorized per-dim sum
        qm = q.reshape(-1, d)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "p_n": pa.array(np.full(d, qm.shape[0], dtype=np.int64)),
            "p_s": pa.array(qm.sum(axis=0, dtype=np.int64)),
            "p_ss": pa.array((qm * qm).sum(axis=0, dtype=np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("dim")
           .aggregate(Sum("p_n", alias_name="n_vecs"),
                      Sum("p_s", alias_name="sum_q"),
                      Sum("p_ss", alias_name="sumsq_q")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_vecs"].to_numpy()
        s = b["sum_q"].to_numpy()
        ss = b["sumsq_q"].to_numpy()
        return pa.table({
            "dim": b["dim"],
            "n_vecs": b["n_vecs"],
            "sum_q": b["sum_q"],
            "mean_q": pa.array(s / n, pa.float64()),
            "var_q": pa.array((n * ss - s * s) / (n * n), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def label_centroids(ds):
    """Per-label centroid over the int8-quantized codes: (label, dim,
    n_vecs, centroid_q) — the k-means E/M-step shape (and the class-
    prototype primitive for embedding-based curation).

    Same integer-exact combiner story as ``embedding_stats``: each
    batch reduces to |labels in batch| x d partial-sum rows via a
    vectorized np.add.at scatter, one groupby((label, dim)) merges
    them, and the centroid double is a single exact-int division."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        q, offs, lens, _ = _quantize_codes(b["embedding"])
        labels = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lens) == 0 or lens.max() == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "p_n": pa.array([], pa.int64()),
                             "p_s": pa.array([], pa.int64())})
        d = int(lens.max())
        qm = q.reshape(-1, d)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, qm)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "p_n": pa.array(np.repeat(cnt, d)),
            "p_s": pa.array(sums.ravel()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"])
           .aggregate(Sum("p_n", alias_name="n_vecs"),
                      Sum("p_s", alias_name="sum_q")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_vecs"].to_numpy()
        s = b["sum_q"].to_numpy()
        return pa.table({
            "label": b["label"],
            "dim": b["dim"],
            "n_vecs": b["n_vecs"],
            "centroid_q": pa.array(s / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over embeddings
# ---------------------------------------------------------------------------

def _bottom_sample(ds, sample_size: int) -> np.ndarray | None:
    """Deterministic codebook sample: the ``sample_size`` smallest
    vec_ids, gathered with a per-batch partial bottom-k merge (order-
    independent, never a full collect) — same recipe as ``ivf_knn``."""
    def bottom(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        take = np.argsort(ids)[:sample_size]
        return pa.table({
            "vec_id": pa.array(ids[take], pa.int64()),
            "vec": pa.array(list(m[take]), pa.list_(pa.float64()))})

    sids, svecs = [], []
    for b in (ds.map_batches(bottom, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        if b.num_rows:
            sids.append(b["vec_id"].to_numpy())
            svecs.append(np.stack(b["vec"].to_numpy(zero_copy_only=False)))
    if not sids:
        return None
    sids = np.concatenate(sids)
    return np.vstack(svecs)[np.argsort(sids)][:sample_size]


def semantic_dedup(ds, threshold: float = 0.95, n_clusters: int = 16,
                   sample_size: int = 2048):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication" — public): coarse
    k-means clustering over the embedding space, then exact pairwise
    cosine WITHIN each cluster only; a vector is dropped when a
    lower-vec_id in-cluster vector sits at cosine >= threshold (the min
    vec_id of each semantic group is the kept representative).

    Plan: deterministic codebook (same spherical k-means as ``ivf_knn``)
    -> broadcast centroids, one assignment matmul per batch -> ONE
    shuffle on cluster id -> per-cluster pairwise matmul in map_groups.
    The pairwise work is O(sum_c n_c^2) instead of O(n^2) — exactly the
    published algorithm's cost shape; at 10^10 rows scale n_clusters
    ~ n/10^4 so clusters stay matmul-sized (the codebook is still tiny
    next to the data), and shard any straggler cluster by a second
    sub-clustering pass.

    Returns (vec_id, cluster, keep) — keep as int64 0/1."""
    import pandas as pd
    import ray

    sample = _bottom_sample(ds, sample_size)
    if sample is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "keep": pa.array([], pa.int64())})
    cent = train_ivf_centroids(sample, n_clusters)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cent_ = ray.get(cref)
        ids, m = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        mn = _normalize(m)
        a = (mn @ cent_.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a, pa.int64()),
            "vec": pa.array(list(mn), pa.list_(pa.float64()))})

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["vec_id"].to_numpy(), kind="stable")
        ids = g["vec_id"].to_numpy()[order]
        m = np.stack(g["vec"].to_numpy()[order])
        sims = m @ m.T
        # dup iff any EARLIER (lower vec_id) row is >= threshold
        dup = (np.triu(sims >= threshold, k=1)).any(axis=0)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": g["cluster"].to_numpy()[order],
            "keep": (~dup).astype(np.int64),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas"))


def hard_negatives(ds, n_probes: int = 20, k: int = 5):
    """Hard-negative mining for contrastive training: for each of the
    ``n_probes`` lowest-vec_id probe vectors, the ``k`` most similar
    vectors carrying a DIFFERENT label — the near-misses a retrieval /
    embedding trainer wants as negatives.

    Similarity is the INTEGER dot product of the int8-quantized codes
    (the ``quantize_embeddings`` kernel): |q| <= 127 and dim 64 keep
    every dot < 2^21, so scores, the (dot DESC, vec_id ASC) tie order,
    and therefore the whole output are exact — float cosine would make
    top-k membership rounding-dependent at the boundary.

    Shape: probes resolve via per-batch min-k partials merged on the
    driver (n_probes rows); their code matrix broadcasts once
    (``ray.put``, n_probes x dim ints); each batch scores with one
    integer matmul and ships only its per-probe top-k — k x probes
    rows per batch, merged driver-side (ann_bruteforce precedent).
    Output: (probe_id, neighbor_id, dot, rank)."""
    import ray

    def probe_partial(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        idx = np.argsort(ids)[:n_probes]
        return b.take(pa.array(idx, pa.int64()))

    cand = pa.concat_tables(
        ds.map_batches(probe_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    order = np.argsort(cand["vec_id"].to_numpy(zero_copy_only=False))
    probes = cand.take(pa.array(order[:n_probes], pa.int64()))
    pq_codes, poffs, plens, _ = _quantize_codes(probes["embedding"])
    dim = int(plens[0])
    pmat = pq_codes.reshape(len(probes), dim)
    pids = probes["vec_id"].to_numpy(zero_copy_only=False)
    plabels = probes["label"].to_numpy(zero_copy_only=False)
    ref = ray.put((pmat, pids, plabels))

    def score(b: pa.Table) -> pa.Table:
        pm, pi, pl = ray.get(ref)
        q, offs, lens, _ = _quantize_codes(b["embedding"])
        x = q.reshape(len(b), dim)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        labels = b["label"].to_numpy(zero_copy_only=False)
        dots = pm @ x.T                      # (P, nb) int64
        out_p, out_n, out_d = [], [], []
        for p in range(len(pi)):
            ok = (labels != pl[p]) & (ids != pi[p])
            if not ok.any():
                continue
            cand_ids = ids[ok]
            cand_d = dots[p][ok]
            top = np.lexsort((cand_ids, -cand_d))[:k]
            out_p.extend([pi[p]] * len(top))
            out_n.extend(cand_ids[top].tolist())
            out_d.extend(cand_d[top].tolist())
        return pa.table({"probe_id": pa.array(out_p, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "dot": pa.array(out_d, pa.int64())})

    parts = pa.concat_tables(
        ds.map_batches(score, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    df = parts.to_pandas()
    df = df.sort_values(["probe_id", "dot", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("probe_id", as_index=False).head(k)
    df["rank"] = df.groupby("probe_id").cumcount() + 1
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False).cast(pa.schema([
                                    ("probe_id", pa.int64()),
                                    ("neighbor_id", pa.int64()),
                                    ("dot", pa.int64()),
                                    ("rank", pa.int64())]))


def knn_join(ds, k: int = 5):
    """Full k-NN self-join over the embedding table: for EVERY vector
    its ``k`` most-similar others — the neighbor-graph primitive under
    SemDeDup clustering, kNN-LM datastores, and embedding near-dup
    audits (``hard_negatives`` is this op restricted to a probe set
    with a label constraint).

    Similarity is the INTEGER dot product of the int8-quantized codes
    (the ``quantize_embeddings`` kernel, |dot| < 2^21 at dim 64), so
    scores, the (dot DESC, neighbor_id ASC) tie order, and therefore
    top-k MEMBERSHIP are exact — float cosine makes the boundary
    rounding-dependent across partition orders.

    Shape: the whole quantized code matrix broadcasts ONCE via
    ``ray.put`` (1 byte/dim, zero-copy to every task — ~10 GB at
    10^8 x 100d, the documented ceiling; beyond that, route
    per-cluster through ``ann_ivf`` partitions and run this join
    inside each probe cell).  Each batch computes one integer matmul
    against the broadcast side and emits its own rows' top-k directly:
    every batch sees the full matrix, so the local top-k IS the global
    answer and NO driver merge happens.  Tie-exact selection is fully
    vectorized through a composite int64 key (dot << 32 | reversed id
    rank) + np.argpartition.  Output (vec_id, neighbor_id, dot, rank).
    """
    import ray
    import pyarrow.compute as pc

    def qpart(b: pa.Table) -> pa.Table:
        q, offs, lens, _ = _quantize_codes(b["embedding"])
        d = int(lens[0]) if len(lens) else 0
        return pa.table({
            "vec_id": pc.cast(b["vec_id"], pa.int64()),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(q.astype(np.int32), pa.int32()), d)
            if d else pa.array([], pa.list_(pa.int32(), 0)),
        })

    parts = pa.concat_tables(
        ds.map_batches(qpart, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    ids_all = parts["vec_id"].to_numpy()
    order = np.argsort(ids_all)
    ids_all = ids_all[order]
    n_all = len(ids_all)
    dim = parts["q"].type.list_size
    mat = (parts["q"].combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(n_all, dim)[order]
        .astype(np.int64))
    ref = ray.put((ids_all, mat))
    kk = min(k, n_all - 1)
    if kk <= 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "dot": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})

    def score(b: pa.Table) -> pa.Table:
        aid, am = ray.get(ref)
        q, offs, lens, _ = _quantize_codes(b["embedding"])
        nb = len(lens)
        x = q.reshape(nb, dim)
        bids = pc.cast(b["vec_id"], pa.int64()).to_numpy()
        dots = x @ am.T                                # (nb, N) int64
        # composite key: ties break toward the SMALLER neighbor id
        comp = dots * (1 << 32) + (n_all - 1
                                   - np.arange(n_all, dtype=np.int64))
        pos = np.searchsorted(aid, bids)
        pos = np.clip(pos, 0, n_all - 1)
        is_self = aid[pos] == bids
        # sentinel must survive the argpartition's negation: int64 min
        # negates to itself (two's complement), which would SELECT the
        # self column instead of excluding it
        comp[np.arange(nb)[is_self], pos[is_self]] = -(1 << 62)
        part = np.argpartition(-comp, kth=kk - 1, axis=1)[:, :kk]
        sel = np.take_along_axis(comp, part, 1)
        ord2 = np.argsort(-sel, axis=1)
        nb_idx = np.take_along_axis(part, ord2, 1)
        return pa.table({
            "vec_id": pa.array(np.repeat(bids, kk), pa.int64()),
            "neighbor_id": pa.array(aid[nb_idx].ravel(), pa.int64()),
            "dot": pa.array(
                np.take_along_axis(dots, nb_idx, 1).ravel(), pa.int64()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                                     nb), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
