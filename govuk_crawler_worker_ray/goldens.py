"""Scalar golden producers for the non-SQL-expressible deterministic
per-row operators (simhash, fingerprint).

These are INDEPENDENT re-implementations of the operators' contracts in
pure Python int arithmetic (no numpy, no shared kernel code with the
engine's vectorized batch functions in ``pipelines/dedup.py`` /
``pipelines/text_analysis.py``).  ``__ray_entry__.oracle_sql`` persists
their output as parquet and hands DuckDB a ``read_parquet`` of it, so
the driver's rows+schema+hash comparison verifies the vectorized path
against this scalar path — the same two-implementations pattern the
crawl goldens use (reference_oracle.py vs the engine).

Simhash: Charikar (STOC 2002) 64-bit, whitespace tokens, per-token
64-bit blake2b, majority vote per bit with ties -> 0.
Fingerprint: degree-n polynomial rolling hash over utf-8 bytes in
uint64 wraparound arithmetic (Horner form), xor-folded with an offset.
ANN-LSH: hyperplane-LSH top-k (the ``ann_lsh`` query) — the probe set
and ranking are fully deterministic given the fixed hyperplane family
(seed + shape are contract constants), so the twin recomputes the
signatures, the 1-bit-flip probe set, and the candidate cosines with
plain Python float loops and persists (vec_id, rank).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

_MASK64 = (1 << 64) - 1
_FP_MUL = 1099511628211
_FP_OFF = 14695981039346656037


def simhash_scalar(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for w in toks:
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
            "big")
        for i in range(64):
            if (h >> i) & 1:
                votes[i] += 1
            else:
                votes[i] -= 1
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig


def fingerprint_scalar(text: str) -> int:
    data = text.encode("utf-8")
    if not data:
        return 0
    h = 0
    for byte in data:
        h = (h * _FP_MUL + byte) & _MASK64  # Horner == powers-sum mod 2^64
    return h ^ _FP_OFF


# contract constants of the ann_lsh operator (similarity.py cites them
# as part of the query's deterministic spec): hyperplanes are
# standard_normal((dim, _LSH_BITS)) from default_rng(_LSH_SEED)
_LSH_SEED = 20240817
_LSH_BITS = 12


def _lsh_normalize(vec: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(v * v for v in vec))
    if n == 0:
        return list(vec)
    return [v / n for v in vec]


def _lsh_sig(vec: list[float], planes) -> int:
    """Signature bits packed LSB-first; plain Python accumulation."""
    sig = 0
    for b in range(_LSH_BITS):
        s = 0.0
        for i, v in enumerate(vec):
            s += v * float(planes[i][b])
        if s > 0:
            sig |= 1 << b
    return sig


def ann_lsh_scalar(embeddings_path: str, k: int = 10) -> pa.Table:
    """Scalar-twin ann_lsh: query = min-vec_id row; probe its bucket +
    all 1-bit flips; exact cosine over candidates; rank by (score desc,
    vec_id asc)."""
    import numpy as np

    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = [list(map(float, v)) for v in t["embedding"].to_pylist()]
    dim = len(vecs[0]) if vecs else 1
    planes = np.random.default_rng(_LSH_SEED).standard_normal(
        (dim, _LSH_BITS))
    qpos = min(range(len(ids)), key=lambda i: ids[i])
    qn = _lsh_normalize(vecs[qpos])
    qsig = _lsh_sig(qn, planes)
    probe = {qsig} | {qsig ^ (1 << b) for b in range(_LSH_BITS)}
    scored = []
    for vid, v in zip(ids, vecs):
        vn = _lsh_normalize(v)
        if _lsh_sig(vn, planes) not in probe:
            continue
        s = 0.0
        for a, b in zip(vn, qn):
            s += a * b
        scored.append((-s, vid))
    scored.sort()
    top = scored[:k]
    return pa.table({
        "vec_id": pa.array([vid for _, vid in top], pa.int64()),
        "rank": pa.array(list(range(1, len(top) + 1)), pa.int64()),
    })


# contract constants of the ann_ivf operator (similarity.py): sample =
# 2048 smallest vec_ids, 16 centroids, 8 spherical-k-means iterations,
# nprobe 4; init = evenly spaced rows of the vec_id-sorted sample
_IVF_SAMPLE = 2048
_IVF_K = 16
_IVF_ITERS = 8
_IVF_NPROBE = 4


def ann_ivf_scalar(embeddings_path: str, k: int = 10) -> pa.Table:
    """Scalar-twin ann_ivf: plain-Python spherical k-means (same init /
    iteration spec as ``similarity.train_ivf_centroids``), probe the 4
    nearest centroids, exact cosine over rows assigned to probed cells.
    Float sums accumulate left-to-right — engine/golden agreement rests
    on assignment and probe margins dwarfing summation-order ulp noise
    (pinned by test_ann_ivf_matches_scalar_twin)."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = [_lsh_normalize(list(map(float, v)))
            for v in t["embedding"].to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    sample = [vecs[i] for i in order[:_IVF_SAMPLE]]
    n, kc = len(sample), min(_IVF_K, len(sample))
    step = (n - 1) / (kc - 1) if kc > 1 else 0.0
    init_idx = [int(i * step) for i in range(kc)]
    init_idx[-1] = n - 1
    cent = [list(sample[i]) for i in init_idx]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def argmax_dot(v):
        best, bi = None, 0
        for c in range(kc):
            s = dot(v, cent[c])
            if best is None or s > best:
                best, bi = s, c
        return bi

    import math

    for _ in range(_IVF_ITERS):
        assign = [argmax_dot(v) for v in sample]
        for c in range(kc):
            members = [sample[i] for i in range(n) if assign[i] == c]
            if not members:
                continue
            acc = [0.0] * len(members[0])
            for m in members:
                for j, x in enumerate(m):
                    acc[j] += x
            nrm = math.sqrt(sum(x * x for x in acc))
            if nrm > 0:
                cent[c] = [x / nrm for x in acc]
    qpos = order[0]
    qn = vecs[qpos]
    probe = sorted(range(kc), key=lambda c: (-dot(cent[c], qn), c))[
        :_IVF_NPROBE]
    probe_set = set(probe)
    scored = []
    for vid, v in zip(ids, vecs):
        if argmax_dot(v) not in probe_set:
            continue
        scored.append((-dot(v, qn), vid))
    scored.sort()
    top = scored[:k]
    return pa.table({
        "vec_id": pa.array([vid for _, vid in top], pa.int64()),
        "rank": pa.array(list(range(1, len(top) + 1)), pa.int64()),
    })


def write_ann_ivf_golden(embeddings_path: str, out_dir: str) -> str:
    """Persist the ann_ivf scalar-twin golden; idempotent via mtime."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_ann_ivf.parquet")
    marker = os.path.join(out_dir, "golden_ann_ivf_mtime")
    mtime = str(os.path.getmtime(embeddings_path))
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read() == mtime:
                return path
    pq.write_table(ann_ivf_scalar(embeddings_path), path)
    with open(marker, "w") as f:
        f.write(mtime)
    return path


def semantic_dedup_scalar(embeddings_path: str,
                          threshold: float = 0.95) -> pa.Table:
    """Scalar-twin semantic_dedup (SemDeDup): the same spherical
    k-means codebook spec as ``ann_ivf_scalar``, every vector assigned
    to its argmax-cosine centroid, then per cluster a plain-Python
    pairwise cosine scan marking any vector with a lower-vec_id
    in-cluster neighbor at >= threshold.  Engine/golden agreement rests
    on assignment and threshold margins dwarfing summation-order ulp
    noise (same contract as the ann_ivf twin)."""
    import math

    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = [_lsh_normalize(list(map(float, v)))
            for v in t["embedding"].to_pylist()]
    if not ids:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "keep": pa.array([], pa.int64())})
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    sample = [vecs[i] for i in order[:_IVF_SAMPLE]]
    n, kc = len(sample), min(_IVF_K, len(sample))
    step = (n - 1) / (kc - 1) if kc > 1 else 0.0
    init_idx = [int(i * step) for i in range(kc)]
    init_idx[-1] = n - 1
    cent = [list(sample[i]) for i in init_idx]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def argmax_dot(v):
        best, bi = None, 0
        for c in range(kc):
            s = dot(v, cent[c])
            if best is None or s > best:
                best, bi = s, c
        return bi

    for _ in range(_IVF_ITERS):
        assign = [argmax_dot(v) for v in sample]
        for c in range(kc):
            members = [sample[i] for i in range(n) if assign[i] == c]
            if not members:
                continue
            acc = [0.0] * len(members[0])
            for m in members:
                for j, x in enumerate(m):
                    acc[j] += x
            nrm = math.sqrt(sum(x * x for x in acc))
            if nrm > 0:
                cent[c] = [x / nrm for x in acc]

    clusters = {}
    for pos in order:  # vec_id ascending
        clusters.setdefault(argmax_dot(vecs[pos]), []).append(pos)
    out_id, out_cl, out_keep = [], [], []
    for c, members in clusters.items():
        # dup is vs EVERY earlier (lower vec_id) member, kept or not —
        # the engine's upper-triangle rule
        for i, pos in enumerate(members):
            dup = any(dot(vecs[pos], vecs[epos]) >= threshold
                      for epos in members[:i])
            out_id.append(ids[pos])
            out_cl.append(c)
            out_keep.append(0 if dup else 1)
    return pa.table({
        "vec_id": pa.array(out_id, pa.int64()),
        "cluster": pa.array(out_cl, pa.int64()),
        "keep": pa.array(out_keep, pa.int64()),
    })


def write_semantic_dedup_golden(embeddings_path: str,
                                out_dir: str) -> str:
    """Persist the semantic_dedup scalar-twin golden; idempotent via
    mtime."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_semantic_dedup.parquet")
    marker = os.path.join(out_dir, "golden_semantic_dedup_mtime")
    mtime = str(os.path.getmtime(embeddings_path))
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read() == mtime:
                return path
    pq.write_table(semantic_dedup_scalar(embeddings_path), path)
    with open(marker, "w") as f:
        f.write(mtime)
    return path


def write_scalar_goldens(documents_path: str, out_dir: str) -> dict:
    """Compute both goldens over a documents parquet; idempotent via a
    source-mtime marker.  Returns {query_name: golden_parquet_path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {"simhash": os.path.join(out_dir, "golden_simhash.parquet"),
             "fingerprint": os.path.join(out_dir,
                                         "golden_fingerprint.parquet")}
    marker = os.path.join(out_dir, "golden_src_mtime")
    mtime = str(os.path.getmtime(documents_path))
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == mtime and all(os.path.exists(p)
                                         for p in paths.values()):
                return paths
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([f"{simhash_scalar(x):016x}" for x in texts],
                            pa.string()),
    }), paths["simhash"])
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array(
            [f"{fingerprint_scalar(x):016x}" for x in texts], pa.string()),
    }), paths["fingerprint"])
    with open(marker, "w") as f:
        f.write(mtime)
    return paths


def write_ann_lsh_golden(embeddings_path: str, out_dir: str) -> str:
    """Persist the ann_lsh scalar-twin golden; idempotent via mtime."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_ann_lsh.parquet")
    marker = os.path.join(out_dir, "golden_ann_lsh_mtime")
    mtime = str(os.path.getmtime(embeddings_path))
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read() == mtime:
                return path
    pq.write_table(ann_lsh_scalar(embeddings_path), path)
    with open(marker, "w") as f:
        f.write(mtime)
    return path


# ---------------------------------------------------------------------------
# multimodal scalar twins (media_features / video_frames queries)
# ---------------------------------------------------------------------------

_MEDIA_KINDS = ("image", "audio", "video")
_MEDIA_PAYLOAD_BYTES = 4096


def _media_payload(doc_id) -> tuple[bytes, str]:
    """The synthesize contract: payload = repeated 32-byte blake2b of
    str(doc_id), truncated; kind = first seed byte mod 3 (row-intrinsic
    — see pipelines/multimodal.synthesize_media_batch)."""
    seedb = hashlib.blake2b(str(doc_id).encode(), digest_size=32).digest()
    reps = _MEDIA_PAYLOAD_BYTES // 32 + 1
    return ((seedb * reps)[:_MEDIA_PAYLOAD_BYTES],
            _MEDIA_KINDS[seedb[0] % 3])


def media_features_scalar(documents_path: str) -> pa.Table:
    """Pure-Python twin of pipelines/multimodal.media_features with the
    fake decoder: per doc, blake2b(payload, 8) -> feature ints, byte
    mean via exact integer sum (float64-identical to the engine's
    numpy mean: the sum of <=4096 uint8 values is exact in a double)."""
    t = pq.read_table(documents_path, columns=["doc_id"])
    rows = {k: [] for k in ("media_id", "kind", "width", "height",
                            "duration_ms", "mean_byte", "n_bytes")}
    for d in t["doc_id"].to_pylist():
        payload, kind = _media_payload(d)
        base = int.from_bytes(
            hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rows["media_id"].append(str(d))
        rows["kind"].append(kind)
        rows["width"].append(16 + base % 1024 if kind != "audio" else 0)
        rows["height"].append(
            16 + (base >> 10) % 1024 if kind != "audio" else 0)
        rows["duration_ms"].append(
            int(base % 60_000) if kind != "image" else 0)
        rows["mean_byte"].append(round(sum(payload) / len(payload), 6))
        rows["n_bytes"].append(len(payload))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.string()),
        "kind": pa.array(rows["kind"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
        "mean_byte": pa.array(rows["mean_byte"], pa.float64()),
        "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
    })


def video_frames_scalar(documents_path: str, num_frames: int = 4
                        ) -> pa.Table:
    """Pure-Python twin of pipelines/multimodal.video_frames: for each
    video-kind doc, num_frames contiguous payload slices hashed to
    frame digests."""
    t = pq.read_table(documents_path, columns=["doc_id"])
    ids, frames, digests = [], [], []
    for d in t["doc_id"].to_pylist():
        payload, kind = _media_payload(d)
        if kind != "video":
            continue
        n = len(payload)
        for f in range(num_frames):
            lo = (n * f) // num_frames
            hi = (n * (f + 1)) // num_frames
            ids.append(str(d))
            frames.append(f)
            digests.append(hashlib.blake2b(
                payload[lo:hi], digest_size=8).hexdigest())
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "frame_idx": pa.array(frames, pa.int32()),
        "frame_digest": pa.array(digests, pa.string()),
    })


def write_media_goldens(documents_path: str, out_dir: str) -> dict:
    """Persist both media goldens; idempotent via source mtime."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "media_features": os.path.join(out_dir,
                                       "golden_media_features.parquet"),
        "video_frames": os.path.join(out_dir,
                                     "golden_video_frames.parquet"),
    }
    marker = os.path.join(out_dir, "golden_media_mtime")
    mtime = str(os.path.getmtime(documents_path))
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == mtime and all(os.path.exists(p)
                                         for p in paths.values()):
                return paths
    pq.write_table(media_features_scalar(documents_path),
                   paths["media_features"])
    pq.write_table(video_frames_scalar(documents_path),
                   paths["video_frames"])
    with open(marker, "w") as f:
        f.write(mtime)
    return paths


# ---------------------------------------------------------------------------
# minhash-LSH near-dup + components scalar twins
# ---------------------------------------------------------------------------
# Independent pure-Python-int re-implementation of the minhash_neardup
# contract (pipelines/dedup.py docstrings state the spec): whitespace
# tokens -> per-token 64-bit blake2b -> k-word shingle hash as a
# degree-k polynomial in base P with uint64 WRAPAROUND arithmetic ->
# 64 permutations (a*x+b, products/sums wrapping mod 2^64, reduced mod
# the Mersenne prime 2^61-1) with per-doc minima -> 16 bands x 4 rows
# folded through a splitmix64 finalizer -> bucket by band key -> exact
# Jaccard (over shingle-hash sets) >= threshold within collided
# buckets.  The permutation constants are contract constants generated
# by numpy default_rng(12345) exactly as the ann_lsh hyperplanes are;
# every arithmetic step here is plain Python int, no shared kernel
# code with the vectorized engine path.

_MH_P = 1099511628211
_MH_M61 = (1 << 61) - 1
_MH_PERM = 64
_MH_BANDS = 16
_MH_ROWS = _MH_PERM // _MH_BANDS


def _mh_constants() -> tuple[list[int], list[int]]:
    import numpy as np

    rng = np.random.default_rng(12345)
    a = rng.integers(1, np.uint64(_MH_M61), size=_MH_PERM,
                     dtype=np.uint64)
    b = rng.integers(0, np.uint64(_MH_M61), size=_MH_PERM,
                     dtype=np.uint64)
    return [int(x) for x in a], [int(x) for x in b]


def _mh_mix64(x: int) -> int:
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def _mh_shingles(text: str, k: int = 5) -> list[int]:
    toks = text.split()
    if not toks:
        return []
    th = [int.from_bytes(
        hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
        "big") for t in toks]
    kk = min(k, len(toks))
    pows = [pow(_MH_P, kk - 1 - j, 1 << 64) for j in range(kk)]
    out = []
    for i in range(len(th) - kk + 1):
        s = 0
        for j in range(kk):
            s += th[i + j] * pows[j]
        out.append(s & _MASK64)
    return out


def minhash_pairs_scalar(ids: list[int], texts: list[str],
                         threshold: float = 0.8,
                         k: int = 5) -> "pa.Table":
    a_const, b_const = _mh_constants()
    sets: list[set] = []
    buckets: dict[int, list[int]] = {}
    for idx, text in enumerate(texts):
        sh = _mh_shingles(text, k)
        sets.append(set(sh))
        sig = []
        for p in range(_MH_PERM):
            ap, bp = a_const[p], b_const[p]
            if sh:
                m = min(((ap * x + bp) & _MASK64) % _MH_M61 for x in sh)
            else:
                m = 0
            sig.append(m)
        for band in range(_MH_BANDS):
            acc = (0x9E3779B97F4A7C15 + 2654435761 * band) & _MASK64
            for r in range(_MH_ROWS):
                acc = _mh_mix64(acc ^ sig[band * _MH_ROWS + r])
            buckets.setdefault(acc >> 1, []).append(idx)
    pairs: dict[tuple[int, int], float] = {}
    for rows in buckets.values():
        if len(rows) < 2:
            continue
        rows = sorted(rows, key=lambda i: ids[i])
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                da, db = ids[rows[x]], ids[rows[y]]
                if (da, db) in pairs:
                    continue
                sa, sb = sets[rows[x]], sets[rows[y]]
                if not sa and not sb:
                    j = 1.0
                elif not sa or not sb:
                    j = 0.0
                else:
                    j = len(sa & sb) / len(sa | sb)
                if j >= threshold:
                    pairs[(da, db)] = round(j, 6)
    keys = sorted(pairs)
    return pa.table({
        "doc_a": pa.array([p[0] for p in keys], pa.int64()),
        "doc_b": pa.array([p[1] for p in keys], pa.int64()),
        "jaccard": pa.array([pairs[p] for p in keys], pa.float64()),
    })


def neardup_components_scalar(pairs: "pa.Table") -> "pa.Table":
    """Union-find twin of the engine's distributed min-label
    propagation: component = min doc_id reachable from the node."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["doc_a"].to_pylist(),
                    pairs["doc_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((d, find(d)) for d in parent)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "component": pa.array([r[1] for r in rows], pa.int64()),
    })


def minhash_incremental_scalar(new_ids, new_texts, prior_ids,
                               prior_texts, threshold: float = 0.8,
                               k: int = 5) -> "pa.Table":
    """Scalar twin of pipelines.dedup.minhash_incremental: the same
    sign-tagged union fed through the pure-Python minhash_pairs_scalar
    spec, then cross-side pairs only, decoded and sorted."""
    ids = [int(i) for i in new_ids] + [-int(i) - 1 for i in prior_ids]
    texts = list(new_texts) + list(prior_texts)
    pairs = minhash_pairs_scalar(ids, texts, threshold, k)
    rows = sorted(
        (int(b), -int(a) - 1, float(j))
        for a, b, j in zip(pairs["doc_a"].to_pylist(),
                           pairs["doc_b"].to_pylist(),
                           pairs["jaccard"].to_pylist())
        if a < 0 <= b)
    return pa.table({
        "doc_new": pa.array([r[0] for r in rows], pa.int64()),
        "doc_prior": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    })


def write_minhash_incremental_golden(documents_path: str,
                                     out_dir: str) -> str:
    """Persist the minhash_incremental scalar-twin golden over the
    deterministic doc_id % 3 snapshot split (prior = multiples of 3,
    new = the rest — the incremental_dedup fixture); idempotent via
    source mtime."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_minhash_incremental.parquet")
    marker = os.path.join(out_dir, "golden_minhash_incremental_mtime")
    mtime = str(os.path.getmtime(documents_path))
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read() == mtime:
                return path
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    prior = [(i, x) for i, x in zip(ids, texts) if i % 3 == 0]
    new = [(i, x) for i, x in zip(ids, texts) if i % 3 != 0]
    golden = minhash_incremental_scalar(
        [i for i, _ in new], [x for _, x in new],
        [i for i, _ in prior], [x for _, x in prior])
    pq.write_table(golden, path)
    with open(marker, "w") as f:
        f.write(mtime)
    return path


def write_minhash_goldens(documents_path: str, out_dir: str) -> dict:
    """Persist minhash_neardup + neardup_components scalar-twin
    goldens (threshold 0.8, k=5 — the queries' contract constants);
    idempotent via source mtime."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "minhash_neardup": os.path.join(
            out_dir, "golden_minhash_pairs.parquet"),
        "neardup_components": os.path.join(
            out_dir, "golden_neardup_components.parquet"),
    }
    marker = os.path.join(out_dir, "golden_minhash_mtime")
    mtime = str(os.path.getmtime(documents_path))
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == mtime and all(os.path.exists(p)
                                         for p in paths.values()):
                return paths
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    pairs = minhash_pairs_scalar(t["doc_id"].to_pylist(),
                                 t["text"].to_pylist())
    pq.write_table(pairs, paths["minhash_neardup"])
    pq.write_table(neardup_components_scalar(pairs),
                   paths["neardup_components"])
    with open(marker, "w") as f:
        f.write(mtime)
    return paths


# -- content-defined chunking (CDC) dedup signal ------------------------
# The readable per-doc SPEC for pipelines.dedup.cdc_chunk_stats: a
# W-byte polynomial rolling hash over the utf-8 bytes (uint64
# wraparound), a cut AFTER byte i wherever the hash's low mask_bits are
# zero — so chunk boundaries depend only on local CONTENT, and an
# insertion re-aligns every later chunk (the property fixed-window
# chunking lacks; Muthitacharoen et al., LBFS SOSP'01).  No min/max
# clamp: cuts are position-independent, which keeps both sides pure.

CDC_W = 8
CDC_P = 257
CDC_MASK_BITS = 6  # ~64-byte average chunks

# Chunk identity fingerprint: a u64 Horner polynomial (FNV-1a
# constants) over the chunk bytes — h = sum b[t] * MUL^(L-1-t) mod
# 2^64, XOR OFF.  Replaced the round-4 per-chunk hashlib.md5: the
# fingerprint only feeds an equality count (dup iff it repeats
# corpus-wide), so a 64-bit hash's ~n^2/2^65 collision odds are
# vanishing at any per-corpus chunk count this signal targets, and
# the polynomial form vectorizes (one np.add.reduceat over the
# flattened chunk bytes — the fingerprint_batch pattern).  Production
# swap at 10^12-chunk scale: xxhash128.
CDC_FP_MUL = 1099511628211
CDC_FP_OFF = 14695981039346656037


def cdc_fp_scalar(data: bytes) -> int:
    """u64 chunk fingerprint per the spec above (readable twin of the
    vectorized kernel in pipelines.dedup.cdc_chunk_stats)."""
    h = 0
    for byt in data:
        h = (h * CDC_FP_MUL + byt) & ((1 << 64) - 1)
    return h ^ CDC_FP_OFF


def cdc_bounds_scalar(data: bytes, w: int = CDC_W, p: int = CDC_P,
                      mask_bits: int = CDC_MASK_BITS) -> list[int]:
    """Chunk boundary offsets [0, ..., len(data)] per the spec above."""
    mask = (1 << mask_bits) - 1
    n = len(data)
    cuts = []
    if n >= w:
        pw = [pow(p, j, 1 << 64) for j in range(w)]
        for i in range(w - 1, n):
            h = 0
            for j in range(w):
                h = (h + data[i - j] * pw[j]) & ((1 << 64) - 1)
            if (h & mask) == 0 and i + 1 < n:
                cuts.append(i + 1)
    return [0] + cuts + [n]


def cdc_stats_scalar(ids: list, texts: list[str]) -> "pa.Table":
    """(doc_id, n_chunks, n_dup_chunks, dup_ppm): a chunk is dup iff its
    u64 fingerprint (cdc_fp_scalar) occurs more than once across the
    WHOLE corpus (all copies flagged, symmetric)."""
    from collections import Counter

    per_doc: list[list[int]] = []
    counts: Counter = Counter()
    for t in texts:
        b = t.encode("utf-8")
        bd = cdc_bounds_scalar(b)
        hs = [cdc_fp_scalar(b[bd[k]:bd[k + 1]])
              for k in range(len(bd) - 1)]
        per_doc.append(hs)
        counts.update(hs)
    n_chunks = [len(hs) for hs in per_doc]
    n_dup = [sum(1 for h in hs if counts[h] > 1) for hs in per_doc]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chunks": pa.array(n_chunks, pa.int64()),
        "n_dup_chunks": pa.array(n_dup, pa.int64()),
        "dup_ppm": pa.array(
            [(d * 1_000_000) // max(c, 1)
             for d, c in zip(n_dup, n_chunks)], pa.int64()),
    })


def write_cdc_golden(documents_path: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden_cdc_stats.parquet")
    marker = os.path.join(out_dir, "golden_cdc_mtime")
    # ":fp64" versions the cache: the round-5 md5 -> u64-polynomial
    # fingerprint swap must invalidate round-4 goldens
    mtime = str(os.path.getmtime(documents_path)) + ":fp64"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == mtime and os.path.exists(path):
                return path
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    pq.write_table(cdc_stats_scalar(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist()), path)
    with open(marker, "w") as f:
        f.write(mtime)
    return path
