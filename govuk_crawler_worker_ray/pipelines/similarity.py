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
    return (bits.astype(np.uint64)
            << np.arange(_NUM_BITS, dtype=np.uint64)).sum(axis=1)


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


def embedding_neardup_pairs(ds, threshold: float = 0.95) -> pa.Table:
    """All pairs with cosine >= threshold (embedding near-dup).  Each
    batch scores against the full normalized matrix (broadcast once);
    emits only (a < b) passing pairs.  At 10^10 rows the matrix side
    switches to the LSH bucket index; the per-batch kernel is unchanged."""
    import ray

    full_parts = [b for b in ds.iter_batches(batch_format="pyarrow")]
    ids_all, m_all = _to_matrix(pa.concat_tables(full_parts))
    mn = _normalize(m_all)
    ref = ray.put((ids_all, mn))

    def partial(batch: pa.Table) -> pa.Table:
        aids, am = _to_matrix(batch)
        bids, bm = ray.get(ref)
        if len(aids) == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})
        scores = _normalize(am) @ bm.T
        ai, bj = np.nonzero(scores >= threshold)
        a = aids[ai]
        b = bids[bj]
        keep = a < b
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64())})

    parts = [b for b in (ds.map_batches(partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))]
    if not parts:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    order = np.lexsort((out["vec_b"].to_numpy(), out["vec_a"].to_numpy()))
    return out.take(pa.array(order))
