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
    serial (measured: 121s -> ~8s for the minhash pass at 32 CPUs).

    Prefer splitting AT THE READ (``override_num_blocks`` in
    ``read_parquet``, see ``__ray_entry__._read_sized``): the
    repartition here is an all-to-all that costs ~2-5 s of fixed
    overhead in this environment.  This helper only repartitions when
    the input genuinely arrives in fewer blocks than CPUs."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    try:
        nb = ds.num_blocks()
    except Exception:
        nb = 1
    if nb is not None and nb >= min(4, n):
        return ds
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
    n = len(th) - k + 1
    # k-term polynomial as contiguous slice*scalar adds: the broadcast
    # sliding-window form hits numpy's uint64 broadcast pathology
    # (~500x, see state/bloom.py _BIT note)
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc += th[j:j + n] * (_P ** np.uint64(k - 1 - j))
    return acc


def minhash_signature(text: str, k: int = 5,
                      cache: dict | None = None) -> np.ndarray:
    h = _shingle_hashes(text, k, cache)
    if len(h) == 0:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    # (a*x + b) mod M over all shingles, min per permutation — a loop of
    # contiguous 1D ops per permutation (broadcast uint64 is ~500x
    # slower on this numpy build, see state/bloom.py _BIT note)
    out = np.empty(NUM_PERM, dtype=np.uint64)
    tmp = np.empty_like(h)
    for p in range(NUM_PERM):
        np.multiply(h, _A[p], out=tmp)
        tmp += _B[p]
        tmp %= _MERSENNE
        out[p] = tmp.min()
    return out


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public constant mix), vectorized uint64."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def minhash_bands_batch(batch: pa.Table, k: int = 5) -> pa.Table:
    """docs -> exploded (doc_id, band_key) narrow rows.  ``band_key`` is
    one 63-bit mix of (band_id, band row values): a single fixed-width
    int column so the bucket groupby shuffles/sorts one int64 key
    instead of an (int32, string) composite (measured ~2x on the
    aggregate).  A cross-band key collision only adds a candidate pair,
    which the exact Jaccard verify then rejects — correctness unaffected.

    Batch-level vectorization: shingle hashes for ALL docs concatenate
    into one flat stream; each of the 64 permutations is one contiguous
    mul+add+mod pass with per-doc minima via ``np.minimum.reduceat``;
    band keys fold signature rows through a splitmix64 mix — no
    per-document numpy calls, no per-(doc, band) hashing."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    cache: dict = {}  # token-hash memo shared across the batch
    parts = []
    counts = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        h = _shingle_hashes(t, k, cache)
        counts[i] = len(h)
        parts.append(h)
    # (NUM_PERM, n) row-contiguous so the band fold reads contiguous rows
    sigs = np.zeros((NUM_PERM, n), dtype=np.uint64)
    if n and counts.sum():
        flat = np.concatenate(parts)
        nonempty = np.nonzero(counts)[0]
        starts = (np.cumsum(counts) - counts)[nonempty]
        tmp = np.empty_like(flat)
        for p in range(NUM_PERM):
            np.multiply(flat, _A[p], out=tmp)
            tmp += _B[p]
            tmp %= _MERSENNE
            sigs[p, nonempty] = np.minimum.reduceat(tmp, starts)
    keys = np.empty((NUM_BANDS, n), dtype=np.uint64)
    for b in range(NUM_BANDS):
        acc = np.full(n, np.uint64(0x9E3779B97F4A7C15 + 2654435761 * b),
                      dtype=np.uint64)
        for r in range(ROWS_PER_BAND):
            acc = _mix64(acc ^ sigs[b * ROWS_PER_BAND + r])
        keys[b] = acc
    # column-major ravel => per-doc band runs, matching the repeat below
    band_key = (keys >> np.uint64(1)).astype(np.int64).T.ravel()
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, NUM_BANDS)),
        "band_key": pa.array(band_key, pa.int64()),
    })


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k)), set(_shingle_hashes(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _empty_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.int64()),
                     "doc_b": pa.array([], pa.int64()),
                     "jaccard": pa.array([], pa.float64())})


# per-WORKER-PROCESS memos for the in-bucket verify: shingle sets keyed
# (k, doc_id), verdicts keyed (k, doc_a, doc_b).  Cross-band repeat pairs
# mostly land in the same process; capped so long-lived workers can't
# grow without bound.  Values are k-dependent, never threshold-dependent.
_WORKER_SHINGLE_MEMO: dict = {}
_WORKER_PAIR_MEMO: dict = {}
_MEMO_CAP = 200_000


def _join_partitions() -> int:
    try:
        import ray

        return max(4, min(64, int(ray.cluster_resources().get("CPU", 4))))
    except Exception:
        return 4


def minhash_lsh_dedup(ds, threshold: float = 0.8, k: int = 5,
                      distributed: bool | None = None,
                      broadcast_limit: int = 2_000_000):
    """-> verified near-dup pairs (doc_a < doc_b, jaccard >= threshold).

    Stages:
      1. minhash+bands (vectorized map_batches), MATERIALIZED once —
         narrow (doc_id, band_key) rows feed two consumers;
      2. groupby(band) count -> collided buckets only (almost every
         bucket is a singleton; map_groups over singletons costs
         per-group Python overhead x docs x bands);
      3. candidate band rows get their texts attached, then
         groupby(band).map_groups pairs AND Jaccard-verifies inside the
         bucket (texts are group-local; a per-worker shingle/pair memo
         absorbs cross-band repeats landing in the same process).

    Step 3's text attachment has two shapes (ROADMAP #3):
    - ``distributed=False`` (default below ``broadcast_limit`` hot band
      rows): hot keys + candidate texts broadcast via ``ray.put`` —
      ~5x faster at bench scale (``Dataset.join``'s hash shuffle has
      seconds of fixed cost here) and driver memory is bounded by the
      explicit limit, not the corpus;
    - ``distributed=True`` (auto above the limit): hot-bucket semi-join
      and text join via ``Dataset.join`` — NOTHING reaches the driver
      but the verified pair set; each candidate text ships once per hot
      band row, bounded by the collided-bucket mass.  Both shapes are
      equivalence-tested.
    Returns a pyarrow Table (the verified pair set is small; duplicates
    from pairs colliding in several bands are dropped driver-side).
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    # minhash at full CPU width; band rows are narrow (doc_id, band_key)
    bands = (cpu_split(ds)
             .map_batches(lambda b: minhash_bands_batch(b, k),
                          batch_format="pyarrow")
             .materialize())

    from .blocks import nonempty_blocks

    counts = (bands.groupby("band_key")
              .aggregate(Count(alias_name="n")))
    # hot is a groupby+filter output and usually tiny: compact away the
    # zero-schema empty partitions that would crash the hash join below
    hot = nonempty_blocks(counts.filter(expr="n > 1"))
    if hot is None:
        return _empty_pairs()
    if distributed is None:
        hot_rows = int(hot.sum("n") or 0)
        distributed = hot_rows > broadcast_limit
    if distributed:
        npart = _join_partitions()
        hot_bands = bands.join(hot, "inner", num_partitions=npart,
                               on=("band_key",))
        with_text = hot_bands.join(
            ds.select_columns(["doc_id", "text"]), "inner",
            num_partitions=npart, on=("doc_id",))
    else:
        hot_parts = [b["band_key"].combine_chunks()
                     for b in hot.iter_batches(batch_format="pyarrow")]
        if not hot_parts or sum(len(p) for p in hot_parts) == 0:
            return _empty_pairs()
        hot_ref = ray.put(pa.concat_arrays(hot_parts))

        def only_hot(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["band_key"],
                                     value_set=ray.get(hot_ref)))

        hot_bands = (bands.map_batches(only_hot, batch_format="pyarrow")
                     .materialize())
        ids: set = set()
        for b in hot_bands.iter_batches(batch_format="pyarrow"):
            ids.update(b["doc_id"].to_pylist())
        if not ids:
            return _empty_pairs()
        text_ref = ray.put(_collect_texts(ds, ids))

        def attach(b: pa.Table) -> pa.Table:
            texts = ray.get(text_ref)
            return b.append_column("text", pa.array(
                [texts[d] for d in b["doc_id"].to_pylist()],
                pa.string()))

        with_text = hot_bands.map_batches(attach, batch_format="pyarrow")

    def pair_verify(g: pd.DataFrame) -> pd.DataFrame:
        # module-level per-process memos: shingle sets by doc, verdicts
        # by pair — map_groups runs many buckets per worker process and
        # cross-band repeats mostly recur within it
        if (len(_WORKER_SHINGLE_MEMO) > _MEMO_CAP
                or len(_WORKER_PAIR_MEMO) > _MEMO_CAP):
            _WORKER_SHINGLE_MEMO.clear()
            _WORKER_PAIR_MEMO.clear()
        smemo = _WORKER_SHINGLE_MEMO
        pmemo = _WORKER_PAIR_MEMO
        ids_ = g["doc_id"].tolist()
        txts = g["text"].tolist()
        order = sorted(range(len(ids_)), key=lambda i: ids_[i])
        sets = []
        for i in order:
            s = smemo.get((k, ids_[i]))
            if s is None:
                s = set(_shingle_hashes(txts[i], k))
                smemo[(k, ids_[i])] = s
            sets.append(s)
        out_a, out_b, out_j = [], [], []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                a, bb = ids_[order[x]], ids_[order[y]]
                sa, sb = sets[x], sets[y]
                # PPJoin size filter: J(A,B) <= min/max of the set
                # sizes, so a size-skewed pair can't reach threshold —
                # skip the intersection (exact: J would be < t anyway)
                la, lb = len(sa), len(sb)
                if min(la, lb) < threshold * max(la, lb):
                    continue
                key = (k, a, bb)
                j = pmemo.get(key)
                if j is None:
                    if not sa and not sb:
                        j = 1.0
                    elif not sa or not sb:
                        j = 0.0
                    else:
                        j = len(sa & sb) / len(sa | sb)
                    pmemo[key] = j
                if j >= threshold:
                    out_a.append(a)
                    out_b.append(bb)
                    out_j.append(round(j, 6))
        return pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "jaccard": pd.Series(out_j, dtype="float64")})

    parts = [b for b in (with_text
                         .groupby("band_key")
                         .map_groups(pair_verify, batch_format="pandas")
                         .iter_batches(batch_format="pyarrow"))
             if b.num_rows]
    if not parts:
        return _empty_pairs()
    out = pa.concat_tables(
        [p.select(["doc_a", "doc_b", "jaccard"]) for p in parts])
    a = out["doc_a"].to_numpy()
    b = out["doc_b"].to_numpy()
    j = out["jaccard"].to_numpy()
    # cross-batch dedup of the (small) VERIFIED pair set + stable order
    order = np.lexsort((b, a))
    a, b, j = a[order], b[order], j[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                     "doc_b": pa.array(b[keep], pa.int64()),
                     "jaccard": pa.array(j[keep], pa.float64())})


def minhash_incremental(new_ds, prior_ds, threshold: float = 0.8,
                        k: int = 5, **lsh_kwargs):
    """Cross-run NEAR-dup increment — the fuzzy counterpart of
    ``incremental_dedup``: which NEW arrivals are >= ``threshold``
    Jaccard-similar to a document a PRIOR run already kept?  Output
    (doc_new, doc_prior, jaccard), one row per verified cross-side
    pair, sorted by (doc_new, doc_prior).

    Contract: doc_ids are non-negative int64 and the two runs' id
    spaces are disjoint from each other's DOCUMENTS (ids may overlap;
    the side tag below keeps them apart).

    Plan: tag side in the id SIGN (prior doc i -> -i-1, a bijection on
    non-negative int64), run ONE ``minhash_lsh_dedup`` banding +
    verification pass over the union — at production scale the prior
    side's (doc_id, band_key) rows are the persisted LSH index read
    back from storage, so only the increment is re-shingled — and keep
    only the verified pairs whose endpoints straddle the sides.
    Same-side pairs ride the same collided buckets either way (the
    bucket's pair loop is quadratic in bucket size regardless), so the
    post-filter costs nothing asymptotically; a cross-side-only
    verifier is the documented refinement if same-side dup mass ever
    dominates a bucket."""

    def _tag(flip: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            if (ids < 0).any():
                raise ValueError(
                    "minhash_incremental: doc_ids must be >= 0")
            if flip:
                ids = -ids - 1
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": b["text"]})
        return f

    union = (new_ds.map_batches(_tag(False), batch_format="pyarrow")
             .union(prior_ds.map_batches(_tag(True),
                                         batch_format="pyarrow")))
    pairs = minhash_lsh_dedup(union, threshold, k, **lsh_kwargs)
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    j = pairs["jaccard"].to_numpy()
    # doc_a < doc_b, so a cross-side pair always has the (negative)
    # prior id in doc_a; same-side pairs (both new or both prior) drop
    cross = (a < 0) & (b >= 0)
    doc_new = b[cross]
    doc_prior = -a[cross] - 1
    jj = j[cross]
    order = np.lexsort((doc_prior, doc_new))
    return pa.table({
        "doc_new": pa.array(doc_new[order], pa.int64()),
        "doc_prior": pa.array(doc_prior[order], pa.int64()),
        "jaccard": pa.array(jj[order], pa.float64()),
    })


def _collect_texts(ds, ids: set) -> dict:
    """Fetch texts for a (bounded) candidate id set via a broadcast
    semi-join filter — only candidate rows reach the driver (the
    broadcast shape of minhash_lsh_dedup; the join shape never calls
    this)."""
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


def connected_components_distributed(pairs_ds, max_iters: int = 50):
    """Connected components over an EDGE DATASET by iterative min-label
    propagation — the scale path for near-dup clusters too large for a
    driver union-find (each iteration is narrow groupby work; converges
    in O(diameter) rounds, and near-dup clusters are shallow).

    Input: Dataset of (doc_a, doc_b) int64 edges.  Output: pa.Table
    (doc_id, component) with component = min doc_id in the component —
    identical to ``connected_components`` (equivalence tested).

    Per iteration: every node's label candidates = its own label plus
    its neighbors' labels (edges exploded both directions, joined to
    the current label table by a broadcast map since labels are narrow;
    at 10^9+ nodes this becomes a Dataset.join on doc_id) -> one
    groupby(node).min.  Terminates when no label changed.
    """
    from ray.data.aggregate import Min

    def explode(b: pa.Table) -> pa.Table:
        a = b["doc_a"].combine_chunks()
        bb = b["doc_b"].combine_chunks()
        # both directions + self loops so min() covers the node itself
        return pa.table({
            "src": pa.concat_arrays([a, bb, a, bb]),
            "dst": pa.concat_arrays([bb, a, a, bb]),
        })

    from .blocks import nonempty_blocks

    def _empty_cc() -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})

    both = nonempty_blocks(
        pairs_ds.map_batches(explode, batch_format="pyarrow"))
    if both is None:
        return _empty_cc()
    # labels is a groupby output: when the dup graph is smaller than
    # the shuffle's partition count (tiny corpora, dup-free rounds) it
    # carries zero-schema empty blocks that crash the next hash join —
    # compact after every (already wanted) materialize.
    labels = nonempty_blocks(
        both.groupby("src").aggregate(Min("dst", alias_name="label"))
        .map_batches(lambda b: pa.table({"node": b["src"],
                                         "label": b["label"]}),
                     batch_format="pyarrow"))
    if labels is None:
        return _empty_cc()
    # convergence: sum(labels) is nonnegative and strictly decreases
    # while any label improves — a one-scalar driver check per round.
    # labels MUST materialize per iteration: without it each join would
    # re-execute the whole prior-iteration lineage (lazy Datasets).
    npart = _join_partitions()
    prev_sum = None
    for _ in range(max_iters):
        cand = both.join(labels, "inner", num_partitions=npart,
                         on=("dst",), right_on=("node",))
        cand_min = (cand.groupby("src")
                    .aggregate(Min("label", alias_name="label"))
                    .map_batches(lambda b: pa.table({
                        "node": b["src"], "label": b["label"]}),
                        batch_format="pyarrow"))
        labels = nonempty_blocks(
            labels.union(cand_min)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(lambda b: pa.table({
                "node": b["node"], "label": b["label"]}),
                batch_format="pyarrow"))
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    out = pa.concat_tables(list(labels.iter_batches(
        batch_format="pyarrow")))
    order = np.argsort(out["node"].to_numpy())
    return pa.table({
        "doc_id": pa.array(out["node"].to_numpy()[order], pa.int64()),
        "component": pa.array(out["label"].to_numpy()[order], pa.int64()),
    })


def connected_components(pairs: pa.Table) -> pa.Table:
    """Union-find over verified pairs (candidate set is small by
    construction; ``connected_components_distributed`` is the built
    min-label-propagation scale path for huge pair sets)."""
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
# exact n-gram Jaccard set-similarity self-join (prefix filter)
# ---------------------------------------------------------------------------

_CP_BITS = np.uint64(21)  # max codepoint 0x10FFFF < 2^21


def _gram_ids(text: str, n: int) -> np.ndarray:
    """Sorted distinct character-n-gram ids (uint64).  For n <= 3 the
    packing is INJECTIVE (21 bits per codepoint), so ids ARE the grams
    — no hashing, and Jaccard over ids equals Jaccard over the gram
    strings exactly (what the DuckDB substr/unnest oracle computes).
    n > 3 falls back to mixed rolling hashes (collision odds ~2^-64 per
    pair-union; no SQL oracle claimed there)."""
    cps = np.frombuffer(text.encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    m = len(cps) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    g = cps[:m].copy()
    if n <= 3:
        for j in range(1, n):
            g = (g << _CP_BITS) | cps[j:m + j]
    else:
        for j in range(1, n):
            g = _mix64(g ^ cps[j:m + j])
    return np.unique(g)


def _gram_df(ds, n: int):
    """Document frequency per distinct gram: one narrow explode +
    groupby count.  The char-n-gram alphabet is bounded by charset^n
    (~10^5-10^6 in practice, unlike word shingles), so the df map is
    broadcastable at any corpus size."""
    from ray.data.aggregate import Count

    def explode(b: pa.Table) -> pa.Table:
        parts = [_gram_ids(t, n) for t in b["text"].to_pylist()]
        allg = (np.concatenate(parts) if parts
                else np.empty(0, np.uint64))
        return pa.table({"gram": pa.array(allg, pa.uint64())})

    return (cpu_split(ds).map_batches(explode, batch_format="pyarrow")
            .groupby("gram").aggregate(Count(alias_name="df")))


# dense all-pairs gate: alphabet (grams with df >= 2) small enough
# that per-doc membership rows are a few hundred floats, and the
# broadcast membership matrix fits comfortably in the object store
_DENSE_MAX_ALPHABET = 4096
_DENSE_MAX_BYTES = 256 << 20
_DENSE_CHUNK_ROWS = 512


# bucketed middle-regime gates: broadcast budget for the per-doc
# gram-id arrays, docs per size block, and the local-alphabet size
# past which a block pair falls back from dense matmul to per-pair
# sorted intersects
_BUCKET_MAX_BYTES = 2 << 30
_BUCKET_ROWS = 512
_BUCKET_DENSE_ALPHABET = 1 << 17


def _ngram_allpairs_bucketed(ds, threshold: float, n: int) -> pa.Table:
    """Exact all-pairs Jaccard for the MIDDLE regime (mode="bucketed"):
    alphabet too large for the dense membership matrix, similarity too
    dense for prefix filtering to prune (every hot gram's prefix bucket
    is a near-all-pairs join plus shuffle overhead).

    Length-bucket partitioning: docs sort by (|grams|, doc_id) into
    ``_BUCKET_ROWS``-row blocks; with sizes ascending, a block pair
    (i <= j) can contain a J >= t pair only if
    ``max_sz(i) >= t * min_sz(j)`` (the PPJoin size filter at block
    granularity), so whole block pairs skip without touching a row.
    Each admissible pair computes EXACT intersection counts by one of
    two kernels, chosen per block pair by a cost model: an
    INVERTED-INDEX incidence count (sort both blocks' (gram, row)
    streams, cross the per-common-gram row lists, one bincount — work
    is exactly T = Σ ci*cj, the number of (doc pair, shared gram)
    incidences) or, when T approaches the dense bound ni*nj*avg_sz, a
    block-LOCAL float32 matmul over the pair's union alphabet (BLAS
    retires flops ~200x faster per op, but only wins when blocks are
    truly dense; never chosen past ``_BUCKET_DENSE_ALPHABET``).  Block
    pairs fan out as a Dataset (the ``_ngram_allpairs_dense`` chunking
    pattern).

    Broadcast bound: the per-doc gram-id arrays ship ONCE via
    ``ray.put`` (~8 bytes per distinct gram per doc) behind a
    ``_BUCKET_MAX_BYTES`` guard — this regime's OUTPUT is inherently
    near-quadratic, so corpora here are moderate by nature; past the
    guard the honest tool is ``minhash_lsh_dedup``."""
    import ray
    import ray.data as rd

    def gram_rows(b: pa.Table) -> pa.Table:
        ids_, szs_, gl = [], [], []
        for did, text in zip(b["doc_id"].to_numpy(),
                             b["text"].to_pylist()):
            g = _gram_ids(text, n)
            if len(g) == 0:
                continue
            ids_.append(did)
            szs_.append(len(g))
            gl.append(g.tobytes())
        return pa.table({
            "doc_id": pa.array(ids_, pa.int64()),
            "sz": pa.array(szs_, pa.int64()),
            "grams": pa.array(gl, pa.binary()),
        })

    parts = [b for b in (cpu_split(ds)
                         .map_batches(gram_rows, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))
             if b.num_rows]
    if not parts:
        return _empty_pairs()
    t = pa.concat_tables(parts)
    total_bytes = int(pc.sum(pc.binary_length(t["grams"])).as_py() or 0)
    if total_bytes > _BUCKET_MAX_BYTES:
        raise ValueError(
            f"ngram_jaccard bucketed mode: gram arrays total "
            f"{total_bytes >> 20} MiB > {_BUCKET_MAX_BYTES >> 20} MiB "
            "broadcast budget — at this scale the output is "
            "quadratic-infeasible; use minhash_lsh_dedup")
    ids = t["doc_id"].to_numpy()
    szs = t["sz"].to_numpy()
    order = np.lexsort((ids, szs))  # size asc, doc_id tiebreak
    ids = ids[order].copy()
    szs = szs[order].copy()
    gl = t["grams"].to_pylist()
    grams = [np.frombuffer(gl[i], dtype=np.uint64) for i in order]
    bref = ray.put((ids, szs, grams))

    n_docs = len(ids)
    bounds = list(range(0, n_docs, _BUCKET_ROWS))
    nb = len(bounds)
    his = [min(lo + _BUCKET_ROWS, n_docs) for lo in bounds]
    pairs_i, pairs_j = [], []
    for i in range(nb):
        max_sz_i = int(szs[his[i] - 1])
        for j in range(i, nb):
            if max_sz_i >= threshold * int(szs[bounds[j]]):
                pairs_i.append(i)
                pairs_j.append(j)
            else:
                # bucket start sizes ascend with j, so the size filter
                # is monotone: the first rejected j rejects all later
                # ones — without the break this driver loop is a full
                # O(nb^2) scan at every corpus size
                break
    if not pairs_i:
        return _empty_pairs()
    chunks = rd.from_arrow(pa.table({
        "bi": pa.array(pairs_i, pa.int64()),
        "bj": pa.array(pairs_j, pa.int64()),
    }))

    def _seg(grams_, lo, hi):
        """Inverted-index view of one block: sorted unique grams, and
        per-gram row lists as (offsets, row array)."""
        g = np.concatenate(grams_[lo:hi])
        r = np.repeat(np.arange(hi - lo, dtype=np.int64),
                      [len(grams_[x]) for x in range(lo, hi)])
        o = np.argsort(g, kind="stable")
        g, r = g[o], r[o]
        u, start, cnt = np.unique(g, return_index=True,
                                  return_counts=True)
        return u, start, cnt, r

    def compute(b: pa.Table) -> pa.Table:
        ids_, szs_, grams_ = ray.get(bref)
        out_a, out_b, out_j = [], [], []
        for bi, bj in zip(b["bi"].to_numpy(), b["bj"].to_numpy()):
            ilo, ihi = bounds[bi], his[bi]
            jlo, jhi = bounds[bj], his[bj]
            ni, nj = ihi - ilo, jhi - jlo
            u_i, st_i, ct_i, rows_i = _seg(grams_, ilo, ihi)
            if bi == bj:
                u_j, st_j, ct_j, rows_j = u_i, st_i, ct_i, rows_i
            else:
                u_j, st_j, ct_j, rows_j = _seg(grams_, jlo, jhi)
            _, ix_i, ix_j = np.intersect1d(u_i, u_j,
                                           assume_unique=True,
                                           return_indices=True)
            ci, cj = ct_i[ix_i], ct_j[ix_j]
            T = int((ci * cj).sum())  # (doc pair, shared gram) count
            G = max(len(u_i), len(u_j))
            # cost model: inverted-index work is T incidence ops;
            # dense matmul is ni*nj*G_local float32 flops but BLAS
            # retires them ~200x faster per op — matmul wins only in
            # the truly dense blocks (T approaching ni*nj*avg_sz)
            if T * 200 <= ni * nj * G or G > _BUCKET_DENSE_ALPHABET:
                # per-common-gram cross products, fully vectorized:
                # for gram k (ci[k] i-docs x cj[k] j-docs) enumerate
                # the block of ci*cj incidences by flat position
                tk = ci * cj
                tot = int(tk.sum())
                inter = np.zeros((ni, nj), np.int64)
                if tot:
                    gid = np.repeat(np.arange(len(tk)), tk)
                    pos = (np.arange(tot, dtype=np.int64)
                           - np.repeat(np.cumsum(tk) - tk, tk))
                    cjg = cj[gid]
                    pi = rows_i[st_i[ix_i][gid] + pos // cjg]
                    pj = rows_j[st_j[ix_j][gid] + pos % cjg]
                    counts = np.bincount(pi * nj + pj,
                                         minlength=ni * nj)
                    inter = counts.reshape(ni, nj).astype(np.int64)
            else:
                local = (u_i if bi == bj
                         else np.union1d(u_i, u_j))
                Gl = len(local)

                def mat(lo, hi):
                    M = np.zeros((hi - lo, Gl), np.float32)
                    for x in range(lo, hi):
                        M[x - lo, np.searchsorted(local,
                                                  grams_[x])] = 1.0
                    return M

                Mi = mat(ilo, ihi)
                Mj = Mi if bi == bj else mat(jlo, jhi)
                inter = np.rint(Mi @ Mj.T).astype(np.int64)
            union = (szs_[ilo:ihi, None] + szs_[None, jlo:jhi]
                     - inter)
            jac = inter.astype(np.float64) / union
            keep = jac >= threshold
            if bi == bj:
                keep &= (np.arange(jlo, jhi)[None, :]
                         > np.arange(ilo, ihi)[:, None])
            r, c = np.nonzero(keep)
            ia, ib = ids_[ilo + r], ids_[jlo + c]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
            out_j.append(jac[r, c])
        if not out_a:
            return _empty_pairs()
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
        })

    outs = [b for b in chunks.map_batches(
        compute, batch_format="pyarrow", batch_size=1).iter_batches(
            batch_format="pyarrow") if b.num_rows]
    if not outs:
        return _empty_pairs()
    return pa.concat_tables(outs).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])


def _ngram_allpairs_dense(ds, threshold: float, n: int,
                          grams2: np.ndarray) -> pa.Table:
    """Exact all-pairs Jaccard for the DEGENERATE small-alphabet regime
    (template-heavy corpora where most docs share most grams): prefix
    filtering cannot prune there — the candidate join degenerates to
    all-pairs while paying shuffle + driver-dedup overhead on top
    (measured at sf0.1: 377 distinct trigrams over 5000 docs, 39% of
    ALL pairs truly >= 0.5, prefix path >400 s).  With <= 4096 live
    grams the gram SET of every doc is one dense row of a (docs x
    alphabet) 0/1 matrix, so exact intersections for a row block are
    ONE float32 matmul against the broadcast matrix: 12.5M exact
    Jaccards in ~2 s at 32 CPUs.  The matrix is built distributed
    (map_batches), broadcast once via ``ray.put``, and row blocks fan
    out as a Dataset — the ann_bruteforce chunking pattern.  Note the
    output itself is inherently quadratic in this regime; the all-pairs
    WORK matches the output size, which no exact algorithm beats.

    ``grams2``: sorted uint64 gram ids with df >= 2 (df == 1 grams
    can't intersect; sizes count them separately)."""
    import ray
    import ray.data as rd

    G = len(grams2)

    def member(b: pa.Table) -> pa.Table:
        ids_, szs_, rows_ = [], [], []
        for did, text in zip(b["doc_id"].to_numpy(),
                             b["text"].to_pylist()):
            g = _gram_ids(text, n)
            if len(g) == 0:
                continue
            pos = np.searchsorted(grams2, g)
            hit = pos < G
            hit[hit] = grams2[pos[hit]] == g[hit]
            row = np.zeros(G, np.float32)
            row[pos[hit]] = 1.0
            ids_.append(did)
            szs_.append(len(g))
            rows_.append(row.tobytes())
        return pa.table({
            "doc_id": pa.array(ids_, pa.int64()),
            "sz": pa.array(szs_, pa.int64()),
            "mem": pa.array(rows_, pa.binary()),
        })

    mparts = [b for b in (cpu_split(ds)
                          .map_batches(member, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow"))]
    if not mparts:
        return _empty_pairs()
    mt = pa.concat_tables(mparts)
    ids = mt["doc_id"].to_numpy()
    order = np.argsort(ids)  # index order == id order => i<j <=> a<b
    ids = ids[order].copy()
    szs = mt["sz"].to_numpy()[order].copy()
    mem = mt["mem"].to_pylist()
    M = np.frombuffer(b"".join(mem[i] for i in order),
                      dtype=np.float32).reshape(len(ids), G)
    mref = ray.put((ids, szs, M))
    n_docs = len(ids)
    lo = np.arange(0, n_docs, _DENSE_CHUNK_ROWS, dtype=np.int64)
    chunks = rd.from_arrow(pa.table({
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(np.minimum(lo + _DENSE_CHUNK_ROWS, n_docs),
                       pa.int64()),
    }))

    def compute(b: pa.Table) -> pa.Table:
        ids_, szs_, M_ = ray.get(mref)
        col = np.arange(len(ids_))
        out_a, out_b, out_j = [], [], []
        for clo, chi in zip(b["lo"].to_numpy(), b["hi"].to_numpy()):
            # float32 counts are exact: intersections <= G <= 4096 << 2^24
            inter = np.rint(M_[clo:chi] @ M_.T).astype(np.int64)
            union = szs_[clo:chi, None] + szs_[None, :] - inter
            jac = inter.astype(np.float64) / union  # union >= 1 always
            keep = (col[None, :] > np.arange(clo, chi)[:, None]) \
                & (jac >= threshold)
            r, c = np.nonzero(keep)
            out_a.append(ids_[clo + r])
            out_b.append(ids_[c])
            out_j.append(jac[r, c])
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
        })

    parts = [b for b in chunks.map_batches(
        compute, batch_format="pyarrow", batch_size=1).iter_batches(
            batch_format="pyarrow") if b.num_rows]
    if not parts:
        return _empty_pairs()
    return pa.concat_tables(parts).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])


def ngram_jaccard_dedup(ds, threshold: float = 0.5, n: int = 3,
                        mode: str = "auto",
                        distributed: bool | None = None,
                        broadcast_limit: int = 2_000_000):
    """EXACT character-n-gram Jaccard near-dup pairs: (doc_a < doc_b,
    jaccard >= threshold), jaccard = |A∩B| / |A∪B| over distinct
    n-grams — the exact counterpart of ``minhash_lsh_dedup`` (which
    approximates the same measure with LSH recall).

    Shape (prefix-filter set-similarity join — Chaudhuri et al. SSJoin
    / Xiao et al. PPJoin, public results; all exchanges narrow):
      1. gram DOCUMENT FREQUENCY pass (narrow explode + groupby count;
         char-n-gram alphabets are charset^n-bounded so the df map
         broadcasts via ``ray.put`` at any corpus size);
      2. prefix rows: per doc order distinct grams by (df, gram)
         ASCENDING and keep the first |A| - ceil(t*|A|) + 1 — any pair
         with J >= t must share a prefix gram, and df-ascending order
         puts the RAREST grams in the prefix so buckets stay tiny
         (numeric order measured 40x slower here: common trigrams
         collected hundreds of docs per bucket).  Grams with df == 1
         are dropped outright (nothing to collide with);
      3. candidate pairs: vectorized SELF-JOIN of the prefix rows on
         gram (``Dataset.join``) + doc_a < doc_b + the PPJoin size
         filter t*|A| <= |B| (J >= t forces it) + the PPJoin
         POSITIONAL filter on the df-order positions;
      4. exact verify inside ``map_batches`` — two shapes, mirroring
         ``minhash_lsh_dedup``: ``distributed=False`` (default below
         ``broadcast_limit`` candidate pairs) broadcasts the deduped
         pair set + gram arrays via ``ray.put`` (driver bounded by the
         explicit limit); ``distributed=True`` (auto above it) attaches
         each side's gram array to the raw candidate rows via
         ``Dataset.join`` (duplicates re-verify behind a per-worker
         memo and collapse in a keep-first tail dedup) — nothing
         reaches the driver but verified pairs.  Per-pair
         ``np.intersect1d`` of sorted ids either way.
    Returns a sorted pyarrow Table.  The jaccard column is the raw
    float64 quotient of exact integers, so it is bit-identical to the
    oracle's ``CAST(i AS DOUBLE) / (na + nb - i)``.

    ``mode``: "prefix" forces the prefix-filter join, "dense" forces
    the all-pairs membership-matrix path, "bucketed" is the MIDDLE
    regime (large alphabet AND dense similarity, where the dense
    matrix won't fit and prefix buckets degenerate to all-pairs plus
    shuffle overhead): length-bucketed exact all-pairs with the PPJoin
    size filter applied at block granularity — see
    ``_ngram_allpairs_bucketed``.  "auto" (default) picks dense when
    the live alphabet is small — the regime where prefix filtering
    cannot prune (template corpora: every doc shares most grams, the
    candidate join IS all-pairs plus overhead, and the true output is
    quadratic anyway).  See ``_ngram_allpairs_dense``."""
    import ray

    if mode not in ("auto", "prefix", "dense", "bucketed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "bucketed":
        # middle regime (explicit): large alphabet AND dense similarity
        # — length-bucketed exact all-pairs, no df pass needed
        return _ngram_allpairs_bucketed(ds, threshold, n)
    df_parts = [b for b in _gram_df(ds, n)
                .iter_batches(batch_format="pyarrow")]
    if not df_parts:
        return _empty_pairs()
    dft = pa.concat_tables(df_parts)
    dfg = (dft["gram"].to_numpy(zero_copy_only=False)
           .astype(np.uint64, copy=False))
    dfc = dft["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(dfg)
    if mode != "prefix":
        grams2 = dfg[o][dfc[o] >= 2]
        if len(grams2) == 0:
            return _empty_pairs()  # no gram shared by 2 docs => no pairs
        n_docs = ds.count()
        dense_ok = (len(grams2) <= _DENSE_MAX_ALPHABET
                    and n_docs * len(grams2) * 4 <= _DENSE_MAX_BYTES)
        if mode == "dense" or dense_ok:
            if not dense_ok:
                raise ValueError(
                    "dense mode needs a small alphabet: "
                    f"{len(grams2)} live grams x {n_docs}+ docs "
                    "exceeds the broadcast budget")
            return _ngram_allpairs_dense(ds, threshold, n, grams2)
    df_ref = ray.put((dfg[o], dfc[o]))

    def prefix_rows(b: pa.Table) -> pa.Table:
        sg, sc = ray.get(df_ref)
        grams_out, docs_out, sz_out, pos_out = [], [], [], []
        for did, text in zip(b["doc_id"].to_numpy(),
                             b["text"].to_pylist()):
            g = _gram_ids(text, n)
            sz = len(g)
            if sz == 0:
                continue
            p = sz - int(np.ceil(threshold * sz)) + 1
            pos = np.searchsorted(sg, g)
            if pos.max(initial=-1) >= len(sg) or \
                    (len(g) and (sg[pos] != g).any()):
                raise AssertionError(
                    "gram missing from df table (dtype drift?)")
            dfs = sc[pos]
            order = np.lexsort((g, dfs))[:p]
            take = g[order]
            # position of each prefix gram in the doc's FULL df-ordered
            # gram list — the PPJoin positional filter's input (the
            # suffix beyond position i holds at most sz - i - 1 more
            # shared grams)
            ppos = np.arange(len(order), dtype=np.int64)
            keep2 = dfs[order] > 1
            take = take[keep2]
            ppos = ppos[keep2]
            if not len(take):
                continue
            grams_out.append(take)
            docs_out.append(np.full(len(take), did, np.int64))
            sz_out.append(np.full(len(take), sz, np.int64))
            pos_out.append(ppos)
        if not grams_out:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "sz": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array(np.concatenate(grams_out), pa.uint64()),
            "doc_id": pa.array(np.concatenate(docs_out), pa.int64()),
            "sz": pa.array(np.concatenate(sz_out), pa.int64()),
            "pos": pa.array(np.concatenate(pos_out), pa.int64()),
        })

    rows = (cpu_split(ds).map_batches(prefix_rows,
                                      batch_format="pyarrow")
            .materialize())
    right = rows.map_batches(
        lambda b: pa.table({"gram": b["gram"], "doc_b": b["doc_id"],
                            "sz_b": b["sz"], "pos_b": b["pos"]}),
        batch_format="pyarrow")
    joined = rows.join(right, "inner",
                       num_partitions=_join_partitions(), on=("gram",))

    def pair_filter(b: pa.Table) -> pa.Table:
        a = b["doc_id"].to_numpy()
        bb = b["doc_b"].to_numpy()
        sa = b["sz"].to_numpy()
        sb = b["sz_b"].to_numpy()
        # doc_a < doc_b + PPJoin size filter: J >= t => t*|A| <= |B|
        keep = (a < bb) & (threshold * sa <= sb) & (threshold * sb <= sa)
        # PPJoin POSITIONAL filter (Xiao et al. 2008): this row's gram
        # sits at df-order position i in A and j in B, so shared grams
        # number at most 1 + min(sz_a-i-1, sz_b-j-1); J >= t needs
        # overlap >= t*(sz_a+sz_b)/(1+t).  A qualifying pair always
        # passes on its FIRST shared prefix gram's row (later rows may
        # fail — the pair-set union keeps it), so dropping rows below
        # the bound loses nothing.  Epsilon on the KEEP side: a float
        # tie must never drop a true pair (verify removes any false
        # positive anyway).
        pa_ = b["pos"].to_numpy()
        pb_ = b["pos_b"].to_numpy()
        ubound = 1 + np.minimum(sa - pa_ - 1, sb - pb_ - 1)
        keep &= (ubound * (1.0 + threshold)
                 >= threshold * (sa + sb) - 1e-9)
        return pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                         "doc_b": pa.array(bb[keep], pa.int64())})

    cand = joined.map_batches(pair_filter, batch_format="pyarrow")

    if distributed is None:
        # auto: the broadcast shape's driver bound is the candidate
        # pair count (same contract as minhash_lsh_dedup's hot rows)
        n_cand = cand.count()
        distributed = n_cand > broadcast_limit

    if distributed:
        # join shape (the minhash ROADMAP #3 fix, same here): dedup the
        # candidate pairs DISTRIBUTED, attach each side's gram array
        # via Dataset.join — nothing reaches the driver but the
        # verified pair set
        npart = _join_partitions()

        # candidates join the gram sides UN-deduped: a pre-join
        # dedup needs a hash shuffle, and this Ray build's shuffle
        # operators (groupby aggregate / map_groups) emit SCHEMA-LESS
        # empty blocks that crash a downstream Acero join ("no match
        # for key field reference") — empty blocks bypass map
        # operators, so they cannot be laundered.  Duplicate pairs
        # (one per extra shared prefix gram) re-verify behind a
        # per-worker memo and collapse in the final keep-first dedup.
        pair_ds = cand

        def gram_rows(b: pa.Table) -> pa.Table:
            # grams travel as raw uint64 BYTES: Acero's hash join
            # rejects list<> payload columns but carries binary fine
            gl = [_gram_ids(t, n).tobytes()
                  for t in b["text"].to_pylist()]
            return pa.table({
                "doc_id": b["doc_id"],
                "grams": pa.array(gl, pa.binary())})

        grams_ds = cpu_split(ds).map_batches(
            gram_rows, batch_format="pyarrow").materialize()
        ga_side = grams_ds.map_batches(
            lambda b: pa.table({"doc_a": b["doc_id"],
                                "grams_a": b["grams"]}),
            batch_format="pyarrow")
        gb_side = grams_ds.map_batches(
            lambda b: pa.table({"doc_b": b["doc_id"],
                                "grams_b": b["grams"]}),
            batch_format="pyarrow")
        pair_full = (pair_ds
                     .join(ga_side, "inner", num_partitions=npart,
                           on=("doc_a",))
                     .join(gb_side, "inner", num_partitions=npart,
                           on=("doc_b",)))

        def verify_joined(b: pa.Table) -> pa.Table:
            if len(_WORKER_PAIR_MEMO) > _MEMO_CAP:
                _WORKER_PAIR_MEMO.clear()
            pmemo = _WORKER_PAIR_MEMO
            ka, kb, kj = [], [], []
            for a, bb, ga, gb in zip(b["doc_a"].to_pylist(),
                                     b["doc_b"].to_pylist(),
                                     b["grams_a"].to_pylist(),
                                     b["grams_b"].to_pylist()):
                key = ("ng", n, a, bb)
                j = pmemo.get(key)
                if j is None:
                    ga = np.frombuffer(ga, dtype=np.uint64)
                    gb = np.frombuffer(gb, dtype=np.uint64)
                    inter = len(np.intersect1d(ga, gb,
                                               assume_unique=True))
                    union = len(ga) + len(gb) - inter
                    j = inter / union if union else 0.0
                    pmemo[key] = j
                if j >= threshold:
                    ka.append(a)
                    kb.append(bb)
                    kj.append(j)
            return pa.table({"doc_a": pa.array(ka, pa.int64()),
                             "doc_b": pa.array(kb, pa.int64()),
                             "jaccard": pa.array(kj, pa.float64())})

        parts = [b for b in pair_full.map_batches(
            verify_joined, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow") if b.num_rows]
        if not parts:
            return _empty_pairs()
        out = pa.concat_tables(parts)
        a = out["doc_a"].to_numpy()
        bb = out["doc_b"].to_numpy()
        j = out["jaccard"].to_numpy()
        # keep-first dedup of the verified set (duplicate candidates
        # from multiple shared prefix grams) + stable output order
        order = np.lexsort((bb, a))
        a, bb, j = a[order], bb[order], j[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        return pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                         "doc_b": pa.array(bb[keep], pa.int64()),
                         "jaccard": pa.array(j[keep], pa.float64())})

    # broadcast shape (default below broadcast_limit): candidate pairs
    # + their gram arrays via ray.put — ~seconds faster at bench scale
    # (two Dataset.join hash exchanges have fixed cost), driver memory
    # bounded by the explicit limit
    pairs: set = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        pairs.update(zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist()))
    if not pairs:
        return _empty_pairs()
    ids: set = {d for p in pairs for d in p}
    idarr = pa.array(sorted(ids), pa.int64())

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=idarr))

    gram_map: dict = {}
    for b in (cpu_split(ds).map_batches(flt, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for did, text in zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()):
            gram_map[did] = _gram_ids(text, n)
    gref = ray.put(gram_map)
    plist = sorted(pairs)
    import ray.data as rd

    pair_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([p[0] for p in plist], pa.int64()),
        "doc_b": pa.array([p[1] for p in plist], pa.int64())}))

    def verify(b: pa.Table) -> pa.Table:
        gm = ray.get(gref)
        ka, kb, kj = [], [], []
        for a, bb in zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist()):
            ga, gb = gm[a], gm[bb]
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                ka.append(a)
                kb.append(bb)
                kj.append(j)
        return pa.table({"doc_a": pa.array(ka, pa.int64()),
                         "doc_b": pa.array(kb, pa.int64()),
                         "jaccard": pa.array(kj, pa.float64())})

    parts = [b for b in pair_ds.map_batches(
        verify, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow") if b.num_rows]
    if not parts:
        return _empty_pairs()
    out = pa.concat_tables(parts)
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def ngram_jaccard_bruteforce(texts: dict, threshold: float,
                             n: int) -> list:
    """All-pairs scalar twin (tests only)."""
    ids = sorted(texts)
    out = []
    for i, a in enumerate(ids):
        ga = _gram_ids(texts[a], n)
        for b in ids[i + 1:]:
            gb = _gram_ids(texts[b], n)
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out.append((a, b, j))
    return out


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (Charikar 2002), vectorized
    across the WHOLE batch: one Arrow whitespace split, one
    dictionary_encode so each distinct token is blake2b-hashed exactly
    once, then per-doc bit votes via a single ``np.add.reduceat`` over
    the flattened token stream (empty docs handled out-of-band since
    reduceat can't express empty segments)."""
    n_docs = batch.num_rows
    sigs = np.zeros(n_docs, dtype=np.uint64)
    if n_docs:
        text = batch["text"].combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        # Arrow emits empty boundary tokens Python str.split() drops
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            doc_idx = doc_idx[keep]
        if len(flat):
            enc = flat.dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            uh = np.empty(len(uniq), dtype=np.uint64)
            for i, t in enumerate(uniq):  # per UNIQUE token only
                uh[i] = int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"),
                                    digest_size=8).digest(), "big")
            hs = uh[codes]
            # bit j of h == unpackbits(le-bytes, bitorder=little)[:, j];
            # the shift-broadcast form hits numpy's uint64 pathology
            # (~2500x slower — see state/bloom.py _BIT note)
            bits = np.unpackbits(
                hs.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8),
                axis=1, bitorder="little").astype(np.int32)
            cnt = np.bincount(doc_idx, minlength=n_docs)
            nonempty = np.nonzero(cnt)[0]
            starts = (np.cumsum(cnt) - cnt)[nonempty]
            ones = np.add.reduceat(bits, starts, axis=0)
            votes = 2 * ones - cnt[nonempty][:, None]
            packed = np.packbits(votes > 0, axis=1, bitorder="little")
            sigs[nonempty] = packed.view("<u8").ravel()
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array([f"{int(v):016x}" for v in sigs], pa.string()),
    })


def simhash_signatures(ds):
    return cpu_split(ds).map_batches(simhash_batch, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy<2 has no bitwise_count)."""
    return np.unpackbits(
        x.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8),
        axis=1).sum(axis=1).astype(np.int64)


def simhash_neardup(ds, k: int = 3):
    """Near-dup pairs by SimHash hamming distance: (doc_a < doc_b,
    hamming <= k) — the banded exact-match shape the module doc
    promises.  Pigeonhole: any pair within hamming k must agree EXACTLY
    on at least one of k+1 disjoint bit bands, so candidates come from
    grouping on (band_idx, band_value) — one narrow hash shuffle —
    and each bucket pairs + verifies exact hamming locally (vectorized
    xor + popcount over the upper triangle).  A pair can collide in
    several bands, so a final groupby((doc_a, doc_b)) dedups
    distributed — no driver-side pair set.  Recall is EXACT (unlike
    minhash banding), which is why the DuckDB all-pairs oracle over the
    scalar-twin signatures can verify it hash-for-hash.

    Template-heavy corpora put near-identical signatures in the same
    buckets; the bucket pairing is then the true (quadratic) output
    size, same reality as ngram_jaccard's dense regime."""
    import pandas as pd
    from ray.data.aggregate import Min

    bands = k + 1
    widths = [64 // bands + (1 if i < 64 % bands else 0)
              for i in range(bands)]
    offs = np.cumsum([0] + widths[:-1])

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        sig = np.array([int(s, 16) for s in b["simhash"].to_pylist()],
                       dtype=np.uint64)
        keys, dids, sigs_ = [], [], []
        for bi in range(bands):
            bv = (sig >> np.uint64(offs[bi])) \
                & np.uint64((1 << widths[bi]) - 1)
            keys.append((np.int64(bi) << np.int64(48))
                        | bv.astype(np.int64))
            dids.append(ids)
            sigs_.append(sig)
        return pa.table({
            "bkey": pa.array(np.concatenate(keys), pa.int64()),
            "doc_id": pa.array(np.concatenate(dids), pa.int64()),
            "sig": pa.array(np.concatenate(sigs_), pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sig = g["sig"].to_numpy().astype(np.uint64)
        m = len(ids)
        if m < 2:
            z = np.empty(0, dtype=np.int64)  # typed empty
            return pd.DataFrame({"doc_a": z, "doc_b": z, "hamming": z})
        iu, ju = np.triu_indices(m, 1)
        ham = _popcount64(sig[iu] ^ sig[ju])
        keep = ham <= k
        return pd.DataFrame({"doc_a": ids[iu[keep]],
                             "doc_b": ids[ju[keep]],
                             "hamming": ham[keep]})

    pairs = (simhash_signatures(ds)
             .map_batches(explode, batch_format="pyarrow")
             .groupby("bkey")
             .map_groups(bucket_pairs, batch_format="pandas"))
    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def incremental_dedup(new_ds, prior_ds, num_partitions: int = 8,
                      broadcast_limit: int = 2_000_000,
                      distributed: bool | None = None):
    """Cross-run incremental dedup — the daily-increment scenario: a
    new arrival batch deduplicates against the hash set of everything a
    PRIOR run already kept, then within itself.  Output: one row per
    genuinely new distinct text, (content_hash, doc_id=min, n_dups).

    Shape: both sides reduce to narrow hash rows.  Auto-switches on
    the prior hash-set size (the minhash/pagerank precedent):

    - below ``broadcast_limit`` per-batch-distinct prior hashes the
      set broadcasts once via ``ray.put`` and the new side filters
      with ``pc.is_in`` inside ``map_batches`` — the native hash join
      pays ~3 s of fixed aggregator setup that dominates small
      increments (measured 6.6 s -> sub-second at sf0.1);
    - above it, the new side anti-joins with Ray Data's native
      ``left_anti`` hash join (the anti_join precedent — no
      broadcast, correct when the prior corpus is 100 TB too).

    Either way the survivors finish with the exact_dedup groupby and
    nothing but 16-byte-hash rows ever shuffles or broadcasts."""
    import ray
    from ray.data.aggregate import Count, Min

    def prior_hashes(batch: pa.Table) -> pa.Table:
        h = content_hash_batch(batch)
        return pa.table({
            "prior_hash": pc.unique(h["content_hash"].combine_chunks()),
        })

    prior = prior_ds.map_batches(prior_hashes, batch_format="pyarrow")
    if distributed is None:
        # materialize before the switch: count() would otherwise run
        # the lazy hash lineage once and the chosen path a second time
        prior = prior.materialize()
        distributed = prior.count() > broadcast_limit

    new_hashed = (new_ds
                  .map_batches(content_hash_batch,
                               batch_format="pyarrow")
                  .select_columns(["doc_id", "content_hash"]))
    if not distributed:
        # stay in Arrow end to end (no pandas str-object round-trip):
        # concat the narrow hash batches and unique once
        parts = [b["prior_hash"].combine_chunks()
                 for b in prior.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        hs = (pc.unique(pa.concat_arrays(parts)) if parts
              else pa.array([], pa.string()))
        href = ray.put(hs)

        def anti(b: pa.Table) -> pa.Table:
            seen = pc.is_in(b["content_hash"].combine_chunks(),
                            value_set=ray.get(href))
            return b.filter(pc.invert(seen))

        fresh = new_hashed.map_batches(anti, batch_format="pyarrow")
    else:
        fresh = new_hashed.join(prior, "left_anti",
                                num_partitions=num_partitions,
                                on=("content_hash",),
                                right_on=("prior_hash",))
    return (fresh.groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups")))


_snap_merge_task = None


def _snap_merge_remote():
    """Lazily-built Ray task that outer-merges the two snapshots'
    narrow (key, hash) blocks in ONE worker and classifies — the
    small-snapshot replacement for the full_outer exchange (see
    _dup_merge_remote for the idiom and the measured join floor)."""
    global _snap_merge_task
    if _snap_merge_task is None:
        import ray

        def _merge(n_new, *blocks):
            import pandas as pd

            a = pa.concat_tables(blocks[:n_new]).to_pandas()
            p = (pa.concat_tables(blocks[n_new:])
                 .rename_columns(["doc_id", "h_prior"]).to_pandas())
            m = a.merge(p, on="doc_id", how="outer")
            hn = m["h_new"].notna()
            hp = m["h_prior"].notna()
            keep = (hn ^ hp) | (hn & hp & (m["h_new"] != m["h_prior"]))
            m = m[keep]
            change = np.where(
                m["h_new"].notna() & m["h_prior"].notna(), "changed",
                np.where(m["h_new"].notna(), "added", "removed"))
            return pa.table({
                "doc_id": pa.Array.from_pandas(m["doc_id"]),
                "change": pa.array(change, pa.string()),
            })

        _snap_merge_task = ray.remote(_merge)
    return _snap_merge_task


def snapshot_diff(new_ds, prior_ds, num_partitions: int | None = None,
                  merge_limit: int = 8_000_000):
    """Recrawl delta between two crawl snapshots of the same corpus —
    the "what changed since the last crawl" report a recrawl scheduler
    feeds on (the reference gets page-level change detection implicitly
    from filesystem overwrite, workflow.go:153-216; here it is a
    first-class distributed operator).  Both snapshots are keyed by a
    unique ``doc_id``; output is one row per DIFFERING page:
    (doc_id, change) with change in {'added', 'removed', 'changed'} —
    pages whose content hash is identical in both snapshots never
    leave the join.

    Shape for 100 TB x 2 snapshots: each side reduces to narrow
    (doc_id, md5) rows inside ``map_batches`` (the exact_dedup
    kernel), ONE native full_outer hash exchange joins them, and the
    classification is a vectorized per-batch filter — both sides
    stream, nothing broadcasts, nothing materializes driver-side.

    Below ``merge_limit`` combined narrow rows the full_outer
    exchange — a measured ~3 s fixed aggregator floor on this host
    regardless of input size — is replaced by ONE worker-side pandas
    outer merge over the block refs (the dup_spans single-task-merge
    idiom; refs move worker-to-worker, nothing touches the driver)."""
    import ray

    from .blocks import default_partitions, nonempty_blocks

    if num_partitions is None:
        num_partitions = default_partitions()

    def side(ds, key_out, hash_out):
        def narrow(b: pa.Table) -> pa.Table:
            h = content_hash_batch(b)
            return pa.table({key_out: b["doc_id"],
                             hash_out: h["content_hash"]})
        return nonempty_blocks(
            ds.map_batches(narrow, batch_format="pyarrow"))

    new = side(new_ds, "doc_id", "h_new")
    prior = side(prior_ds, "p_doc_id", "h_prior")
    # key type flows through from the inputs; only the degenerate
    # both-empty relation defaults to int64 (no rows to infer from)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "change": pa.array([], pa.string())})
    if new is None and prior is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    if new is None or prior is None:
        import ray.data as rd

        only, key, tag = ((prior, "p_doc_id", "removed")
                          if new is None else (new, "doc_id", "added"))
        return only.map_batches(
            lambda b, k=key, t=tag: pa.table({
                "doc_id": b[k],
                "change": pa.array([t] * b.num_rows, pa.string())}),
            batch_format="pyarrow")

    if new.count() + prior.count() <= merge_limit:
        import ray.data as rd

        new_refs = new.to_arrow_refs()
        refs = new_refs + prior.to_arrow_refs()
        out = ray.get(
            _snap_merge_remote().remote(len(new_refs), *refs))
        return rd.from_arrow(out)

    joined = new.join(prior, "full_outer",
                      num_partitions=num_partitions,
                      on=("doc_id",), right_on=("p_doc_id",))

    def classify(b: pa.Table) -> pa.Table:
        have_new = pc.is_valid(b["h_new"])
        have_prior = pc.is_valid(b["h_prior"])
        # Kleene and/or: not_equal is NULL on one-sided rows, and the
        # non-Kleene kernels would propagate that null into the filter
        # mask (filter treats null as drop) — losing added/removed rows
        changed = pc.and_kleene(
            pc.and_(have_new, have_prior),
            pc.not_equal(b["h_new"], b["h_prior"]))
        keep = pc.or_kleene(pc.xor(have_new, have_prior), changed)
        t = b.filter(keep)
        hn = pc.is_valid(t["h_new"])
        hp = pc.is_valid(t["h_prior"])
        change = pc.if_else(
            pc.and_(hn, hp), pa.scalar("changed", pa.string()),
            pc.if_else(hn, pa.scalar("added", pa.string()),
                       pa.scalar("removed", pa.string())))
        # Ray's full_outer join coalesces the equi-key pair into the
        # left column name, so doc_id is already populated on
        # right-only rows
        return pa.table({
            "doc_id": t["doc_id"],
            "change": change,
        })

    return joined.map_batches(classify, batch_format="pyarrow")


def chunk_dedup(ds, chunk_tokens: int = 8):
    """Span-level exact dedup with document reassembly (the
    RefinedWeb / MassiveText "remove duplicated spans, keep the first
    occurrence" pass — Penedo et al. 2023, public; lines/paragraphs
    stand in here as fixed ``chunk_tokens``-word chunks because the
    synthetic corpus has no newlines).

    A chunk survives only at its globally FIRST occurrence — min
    (doc_id, chunk_id) over every place the identical chunk text
    appears; each doc is then reassembled from its surviving chunks in
    order.  Docs whose every chunk was seen earlier (exact dups)
    disappear entirely.

    Plan (two shuffles, both narrow):
      1. explode to (doc_id, chunk_id, ctext) chunk rows (vectorized
         token split + C-level pandas group-join per batch);
      2. groupby(ctext) with a packed-int Min aggregate — no
         map_groups, the winner position decodes from one int64;
      3. groupby(doc_id).map_groups reassembly (sort by chunk_id,
         join) — per-doc groups, same shape as sessionize.
    Chunk text moves exactly once (it must — reassembly needs it);
    everything else is int64 columns."""
    import pandas as pd
    from ray.data.aggregate import Min

    _CID_BITS = 20  # 2^20 chunks/doc == 8M tokens/doc; assert below

    def explode(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_pos = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_pandas()[keep].to_numpy()
        d = doc_pos[keep]
        if not len(d):
            return pa.table({"packed": pa.array([], pa.int64()),
                             "ctext": pa.array([], pa.string())})
        # token index within doc -> chunk id
        n_tok = np.bincount(d, minlength=n_docs)
        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        tok_idx = np.arange(len(d)) - starts[d]
        cid = tok_idx // chunk_tokens
        assert int(cid.max()) < (1 << _CID_BITS), \
            "doc exceeds 2^20 chunks; widen the packed key"
        # loud guard instead of silent int64 wrap (the pseq-overflow
        # lesson from the seen-set rank exchange)
        assert int(batch["doc_id"].to_numpy(
            zero_copy_only=False).max(initial=0)) < (1 << 43), \
            "doc_id exceeds 2^43; packed (doc_id, chunk_id) key wraps"
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[d]
        g = (pd.DataFrame({"doc_id": ids, "cid": cid, "tok": words})
             .groupby(["doc_id", "cid"], sort=False)["tok"]
             .agg(" ".join).reset_index())
        packed = (g["doc_id"].to_numpy().astype(np.int64)
                  << _CID_BITS) | g["cid"].to_numpy().astype(np.int64)
        return pa.table({"packed": pa.array(packed, pa.int64()),
                         "ctext": pa.array(g["tok"].to_numpy(),
                                           pa.string())})

    winners = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby("ctext")
               .aggregate(Min("packed", alias_name="packed")))

    # reassembly partitions: docs hash to ~2x CPU partitions so the
    # per-group work is ONE vectorized pandas groupby per partition,
    # not one Ray map_groups dispatch per doc (~1 ms x n_docs — the
    # distinctive_terms lesson)
    from .blocks import default_partitions

    n_parts = default_partitions()

    def unpack(batch: pa.Table) -> pa.Table:
        packed = batch["packed"].to_numpy(zero_copy_only=False)
        doc = packed >> _CID_BITS
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "chunk_id": pa.array(packed & ((1 << _CID_BITS) - 1),
                                 pa.int64()),
            "ctext": batch["ctext"],
            "part": pa.array(doc % n_parts, pa.int64()),
        })

    def reassemble_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_id"])
        out = (g.groupby("doc_id", sort=False)["ctext"]
               .agg(kept_text=" ".join, n_kept="size").reset_index())
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out[["doc_id", "kept_text", "n_kept"]]

    return (winners.map_batches(unpack, batch_format="pyarrow")
            .groupby("part").map_groups(reassemble_part,
                                        batch_format="pandas"))


def normalized_dedup(ds):
    """Normalization-invariant exact dedup: documents identical AFTER
    the standard scrub (lowercase, digit masking, punct strip,
    whitespace collapse — text_analysis.normalize_batch) collapse to
    one row: (norm_hash, doc_id = min, n_dups).  Catches the
    near-duplicate class exact dedup misses (case/formatting variants)
    without any similarity machinery.  Same plan as exact_dedup: the
    normalize+hash map is vectorized per batch, ONE narrow groupby."""
    from ray.data.aggregate import Count, Min

    from .text_analysis import normalize_batch

    def h(batch: pa.Table) -> pa.Table:
        norm = normalize_batch(batch)
        hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
                  for t in norm["norm_text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "norm_hash": pa.array(hashes, pa.string()),
        })

    return (ds.map_batches(h, batch_format="pyarrow")
            .groupby("norm_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups")))


def _sorted_i64_broadcast(ds, col: str, payload: str | None = None):
    """Ship a narrow int64 key set (optionally with one int64 payload
    column) ONCE via ``ray.put`` as sorted numpy arrays — the shared
    broadcast-membership primitive behind dup_spans and
    cdc_chunk_stats' no-exchange fast paths.  Returns an ObjectRef of
    ``keys_sorted`` (no payload) or ``(keys_sorted, payload_sorted)``;
    ``ds=None`` or an empty relation yields zero-length arrays.
    Batches concat in Arrow/numpy — no pandas object round-trip."""
    import ray

    ks, ps = [], []
    if ds is not None:
        for b in ds.iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            ks.append(b[col].to_numpy(zero_copy_only=False))
            if payload is not None:
                ps.append(b[payload].to_numpy(zero_copy_only=False))
    k = np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
    if payload is None:
        return ray.put(np.sort(k))
    p = np.concatenate(ps) if ps else np.empty(0, dtype=np.int64)
    order = np.argsort(k, kind="stable")
    return ray.put((k[order], p[order]))


def _in_sorted(sorted_keys, values):
    """Membership of ``values`` in a sorted int64 array via clipped
    ``searchsorted``.  Returns ``(hit_mask, pos)`` where ``pos`` indexes
    ``sorted_keys`` (valid wherever ``hit_mask``); an empty key set
    yields an all-False mask — the edge every hand-rolled copy of this
    idiom had to re-derive."""
    if not len(sorted_keys):
        z = np.zeros(len(values), dtype=np.int64)
        return z.astype(bool), z
    pos = np.clip(np.searchsorted(sorted_keys, values), 0,
                  len(sorted_keys) - 1)
    return sorted_keys[pos] == values, pos


_dup_merge_task = None


def _dup_merge_remote():
    """Lazily-built Ray task that merges block-local (ghash, cnt)
    partials into the global duplicated-gram set in ONE worker —
    numpy sort + reduceat, no hash-shuffle machinery.  Ray 2.49's
    hash-shuffle groupby costs a measured ~3.5-4 s of fixed aggregator
    overhead on this host regardless of input size (see BASELINE.md),
    so below ``merge_limit`` partial rows this single-task reduce is
    strictly better; above it the distributed groupby takes over."""
    global _dup_merge_task
    if _dup_merge_task is None:
        import ray

        def _merge(min_docs, *blocks):
            ghs = [b["ghash"].to_numpy(zero_copy_only=False)
                   for b in blocks if b.num_rows]
            if not ghs:
                e = np.empty(0, dtype=np.int64)
                return e, e
            gh = np.concatenate(ghs)
            cnt = np.concatenate(
                [b["cnt"].to_numpy(zero_copy_only=False)
                 for b in blocks if b.num_rows])
            order = np.argsort(gh, kind="stable")
            gh = gh[order]
            cnt = cnt[order]
            first = np.empty(len(gh), dtype=bool)
            first[0] = True
            first[1:] = gh[1:] != gh[:-1]
            starts = np.nonzero(first)[0]
            sums = np.add.reduceat(cnt, starts)
            keep = sums >= min_docs
            return gh[starts][keep], sums[keep]

        _dup_merge_task = ray.remote(_merge)
    return _dup_merge_task


def dup_spans(ds, n: int = 8, min_docs: int = 2,
              broadcast_limit: int = 2_000_000,
              merge_limit: int = 8_000_000):
    """Duplicated-span detection — every position where a token
    ``n``-gram recurs across >= ``min_docs`` DISTINCT documents (the
    substring-dedup signal of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", public; fixed-width n-grams
    stand in for the suffix-array substrings, the standard scalable
    approximation).  Output (doc_id, pos, n_docs): 1-based token
    position of each duplicated n-gram start and how many distinct
    docs share it — the span list a downstream cut-and-reassemble pass
    (``chunk_dedup``) consumes.

    Plan — every exchanged row is pure int64; gram TEXT never leaves
    the batch it was tokenized in:
      1. vectorized n-gram explode to (doc_id, pos, ghash): per-token
         64-bit hashes (``pd.util.hash_array``, one C pass) combined
         into a positional polynomial over the window (8 shifted
         uint64 multiply-adds — order-sensitive, so "a b" != "b a"),
         then per-batch (ghash, doc) pair dedup as a combiner;
      2. grams-with->=min_docs from block-local distinct-doc partial
         counts — a document's rows never split across blocks (explode
         emits a doc's grams together and the combiner runs on whole
         blocks), so the block-local distinct count is a correct
         partial of the global one.  Below ``merge_limit`` partial
         rows the partials merge in ONE worker-side numpy reduce
         (Ray 2.49's hash-shuffle groupby has a ~3.5-4 s fixed
         aggregator floor on this host); above it, ONE distributed
         groupby(ghash) SUM;
      3. duplicated-gram membership + n_docs ships ONCE (``ray.put``
         of sorted int64 arrays) and each occurrence batch flags by
         ``searchsorted`` — no second exchange at all below
         ``broadcast_limit`` duplicated grams; above it (pathological
         corpora) ONE inner int64 hash join against the dup side.
    The 64-bit key makes a cross-doc false merge a birthday event at
    ~2^-64 per pair (~1e-6 at 10M distinct grams, vanishing at test
    scale); the first version shuffled the gram STRINGS twice and was
    8-10x wider on the wire (16.2 s -> the join plan -> this plan at
    sf0.1)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .blocks import nonempty_blocks

    _P = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier

    def explode(batch: pa.Table) -> pa.Table:
        n_docs_b = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_pos = np.repeat(np.arange(n_docs_b), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.to_pandas()[keep].to_numpy()
        d = doc_pos[keep]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "ghash": pa.array([], pa.int64())})
        if len(d) < n:
            return empty
        th = pd.util.hash_array(w).astype(np.uint64)
        # within-doc token index (vectorized cumcount over sorted d)
        starts = np.searchsorted(d, np.arange(n_docs_b))
        tok_idx = np.arange(len(d)) - starts[d]
        # a window starts at i iff the (n-1)-ahead token is same-doc
        m = len(d) - n + 1
        ok = d[:m] == d[n - 1:]
        with np.errstate(over="ignore"):
            acc = th[:m].copy()
            p = _P
            for j in range(1, n):
                acc += th[j:m + j] * p
                p = p * _P
        if not ok.any():
            return empty
        return pa.table({
            "doc_id": pa.array(ids[d[:m][ok]], pa.int64()),
            "pos": pa.array(tok_idx[:m][ok] + 1, pa.int64()),
            "ghash": pa.array(acc[ok].view(np.int64), pa.int64()),
        })

    grams = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def pair_combiner(b: pa.Table) -> pa.Table:
        # block-local distinct-doc count per gram: doc locality per
        # block (see batch_size=None note below) makes this a correct
        # partial of the global distinct count, so one row per
        # (block, gram) crosses the wire instead of one per
        # (gram, doc) pair
        df = pd.DataFrame({
            "ghash": b["ghash"].to_numpy(zero_copy_only=False),
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        g = df.groupby("ghash", as_index=False, sort=False).agg(
            cnt=("doc_id", "size"))
        # explicit types: an empty pandas frame would otherwise emit
        # null-typed columns and break the downstream int64 exchange
        return pa.table({
            "ghash": pa.array(g["ghash"].to_numpy(dtype=np.int64),
                              pa.int64()),
            "cnt": pa.array(g["cnt"].to_numpy(dtype=np.int64),
                            pa.int64()),
        })

    def only_dups(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_docs"], min_docs))

    def _empty_result():
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64())}))

    n_grams = grams.count()
    if n_grams == 0:
        return _empty_result()

    import ray

    def _flag_with(dup_ref):
        def flag(b: pa.Table) -> pa.Table:
            gh_s, nd_s = ray.get(dup_ref)
            g = b["ghash"].to_numpy(zero_copy_only=False)
            hit, pos = _in_sorted(gh_s, g)
            return pa.table({
                "doc_id": b["doc_id"].filter(pa.array(hit)),
                "pos": b["pos"].filter(pa.array(hit)),
                "n_docs": pa.array(nd_s[pos[hit]], pa.int64()),
            })

        return flag

    # batch_size=None => whole blocks, preserving the doc-locality the
    # partial-count argument above relies on.  Locality holds because an
    # explode output batch (<=1024 docs x ~n_tokens rows, a few MB) is
    # far below target_max_block_size (128 MB default) and so is never
    # sliced across blocks; corpora with multi-MB single documents must
    # lower the explode batch_size to keep that true.
    partials = (grams.map_batches(pair_combiner, batch_format="pyarrow",
                                  batch_size=None).materialize())
    n_part = partials.count()
    if n_part == 0:
        return _empty_result()

    if n_part <= merge_limit:
        # small-corpus fast path: ONE worker-side numpy reduce over the
        # block-local partials replaces the hash-shuffle groupby (which
        # costs a measured ~3.5-4 s of fixed aggregator overhead on this
        # host regardless of input size); refs move worker-to-worker,
        # nothing touches the driver.  8M partial rows = ~128 MB of
        # int64 pairs, well inside one worker's heap.
        refs = partials.to_arrow_refs()
        gh_s, nd_s = ray.get(
            _dup_merge_remote().remote(min_docs, *refs))
        if len(gh_s) == 0:
            return _empty_result()
        dup_ref = ray.put((gh_s, nd_s))
        return grams.map_batches(_flag_with(dup_ref),
                                 batch_format="pyarrow")

    # scale path: exchange partitions scale with the PARTIAL COUNT,
    # not CPU width — fixed per-partition aggregator cost dominates on
    # small corpora (same sizing rule as cdc_chunk_stats)
    P_h = max(2, min(16, (n_part + 65535) // 65536))
    counts = (partials.groupby("ghash", num_partitions=P_h)
              .aggregate(Sum("cnt", alias_name="n_docs")))
    dup = nonempty_blocks(counts.map_batches(only_dups,
                                             batch_format="pyarrow"))
    n_dup = 0 if dup is None else dup.count()
    if n_dup == 0:
        return _empty_result()

    if n_dup <= broadcast_limit:
        # dup-gram membership + n_docs ship ONCE; each occurrence
        # batch filters by searchsorted — the (grams JOIN dup)
        # exchange disappears entirely
        dup_ref = _sorted_i64_broadcast(dup, "ghash", "n_docs")
        return grams.map_batches(_flag_with(dup_ref),
                                 batch_format="pyarrow")

    # pathological corpus (more duplicated grams than the broadcast
    # budget): ONE inner int64 hash join against the dup side.
    # Ray quirk (ray 2.49 hash_shuffle.py:223,584): join-side schemas
    # broadcast only with the FIRST dispatched block, and empty blocks
    # short-circuit before broadcasting — nonempty_blocks above plus
    # this compacting repartition keeps the dup side's blocks
    # provably non-empty.
    try:
        P = max(2, min(grams.num_blocks(), 16))
    except Exception:
        P = 8
    dup = dup.repartition(max(1, min(P, (n_dup + 65535) // 65536)))

    joined = grams.join(dup, "inner", num_partitions=P, on=("ghash",))
    return joined.select_columns(["doc_id", "pos", "n_docs"])


def cdc_chunk_stats(ds, num_partitions: int | None = None,
                    broadcast_limit: int = 2_000_000):
    """Content-defined chunking dedup signal: (doc_id, n_chunks,
    n_dup_chunks, dup_ppm), where chunks are cut wherever a W-byte
    polynomial rolling hash over the utf-8 bytes has zero low bits
    (goldens.cdc_bounds_scalar is the spec; Muthitacharoen et al.,
    LBFS SOSP'01) and a chunk is dup iff its u64 Horner fingerprint
    (goldens.cdc_fp_scalar; NOT cryptographic — cross-chunk false
    merges are birthday events, ~1e-7 at 10^6 distinct chunks, and
    the documented production swap at 10^12 chunks is xxhash128)
    occurs >1 time across the corpus.  Boundaries depend only on local content, so an
    insertion re-aligns every later chunk — the shift-robust
    counterpart of the fixed-window ``chunk_dedup``.

    Plan shape: one chunkify pass (materialized — two consumers),
    then TWO data-scaled exchanges: groupby(h) count -> dup hashes
    only, which BROADCAST (ray.put of a sorted int64 array, flagging
    by per-batch searchsorted) below ``broadcast_limit`` and join
    distributed above it (minhash's auto-switch idiom); per-doc
    combiner partials then one final groupby(doc_id).  Nothing wider
    than 16-byte rows moves; the full chunk-hash cardinality stays
    distributed — only hashes that REPEAT reach the driver, and only
    under the broadcast limit.

    The chunkify kernel is whole-batch vectorized (round 5; the
    round-4 version looped per doc and md5'd per chunk): the Arrow
    string values buffer IS the batch's concatenated utf-8 bytes, so
    ONE W-term rolling hash runs over the whole slab and cut
    candidates that straddle doc boundaries are masked out by a
    searchsorted validity check; chunk fingerprints are the u64
    Horner polynomial of goldens.cdc_fp_scalar, computed for every
    chunk at once via the flattened-gather + np.add.reduceat pattern
    of text_analysis.fingerprint_batch."""
    from ray.data.aggregate import Count, Sum

    from ..goldens import CDC_FP_OFF, CDC_MASK_BITS, CDC_P, CDC_W
    from ..pipelines.text_analysis import _fp_powers
    from .blocks import default_partitions, nonempty_blocks

    P = default_partitions() if num_partitions is None else num_partitions
    pw = np.array([pow(CDC_P, j, 1 << 64) for j in range(CDC_W)],
                  dtype=np.uint64)
    mask = np.uint64((1 << CDC_MASK_BITS) - 1)
    fp_off = np.uint64(CDC_FP_OFF)

    def chunkify(b: pa.Table) -> pa.Table:
        n_docs = b.num_rows
        if n_docs == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        arr = b["text"].combine_chunks().cast(pa.large_utf8())
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        starts, ends = offsets[:-1], offsets[1:]
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base, stop = int(starts[0]), int(ends[-1])

        # ONE rolling hash over the whole slab (values are stored
        # contiguously in offset order, so the buffer slice IS the
        # batch's docs concatenated); a window ending at local k
        # proposes a cut at global c = base + k + W
        cuts = np.empty(0, dtype=np.int64)
        nb = stop - base
        if nb >= CDC_W:
            u = data[base:stop].astype(np.uint64)
            h = np.zeros(nb - CDC_W + 1, dtype=np.uint64)
            for j in range(CDC_W):
                # term b[i-j] * p^j == u[W-1-j : nb-j] * pw[j]
                h += u[CDC_W - 1 - j: nb - j] * pw[j]
            cand = np.nonzero((h & mask) == np.uint64(0))[0] + (base +
                                                                CDC_W)
            if len(cand):
                # validity: the W-byte window and the cut must sit
                # strictly inside ONE doc (per-doc semantics of
                # cdc_bounds_scalar): cut < doc end, window start
                # >= doc start  <=>  cut - start >= W
                d = np.searchsorted(starts, cand, side="right") - 1
                ok = (cand < ends[d]) & (cand - starts[d] >= CDC_W)
                cuts, cut_doc = cand[ok], d[ok]

        # chunk layout: per doc, chunks start at [doc start] + its
        # cuts (both ascending, so one interleave places everything)
        cc = (np.bincount(cut_doc, minlength=n_docs).astype(np.int64)
              if len(cuts) else np.zeros(n_docs, dtype=np.int64))
        tot = cc + 1  # n_chunks per doc (empty doc => 1 empty chunk)
        first = np.cumsum(tot) - tot
        cs = np.empty(int(tot.sum()), dtype=np.int64)
        cs[first] = starts
        if len(cuts):
            rank = np.arange(len(cuts), dtype=np.int64) - np.repeat(
                np.cumsum(cc) - cc, cc)
            cs[first[cut_doc] + 1 + rank] = cuts
        ce = np.empty_like(cs)
        ce[:-1] = cs[1:]
        ce[first + cc] = ends  # last chunk of each doc ends at doc end
        cl = ce - cs

        # u64 Horner fingerprint of every chunk at once
        # (fingerprint_batch pattern: flatten, gather, power-weight,
        # reduceat per chunk)
        fp = np.zeros(len(cs), dtype=np.uint64)
        total = int(cl.sum())
        if total:
            cum = np.cumsum(cl) - cl
            pos = np.arange(total, dtype=np.int64)
            rep_cum = np.repeat(cum, cl)
            src = np.repeat(cs, cl) + (pos - rep_cum)
            flat = data[src].astype(np.uint64)
            exp = np.repeat(cl - 1, cl) - (pos - rep_cum)
            prod = flat * _fp_powers(int(cl.max()))[exp]
            nonempty = np.nonzero(cl)[0]
            fp[nonempty] = np.add.reduceat(prod, cum[nonempty])
        fp ^= fp_off
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, tot), pa.int64()),
            "h": pa.array(fp.view(np.int64), pa.int64()),
        })

    import ray

    rows = (ds.map_batches(chunkify, batch_format="pyarrow")
            .materialize())
    n_rows = rows.count()
    if n_rows == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_chunks": pa.array([], pa.int64()),
            "n_dup_chunks": pa.array([], pa.int64()),
            "dup_ppm": pa.array([], pa.int64()),
        })
    # exchange partitions scale with the CHUNK COUNT, not CPU width:
    # every hash-shuffle partition carries fixed aggregator cost, so a
    # CPU-wide P on a small corpus is pure overhead (measured: the
    # r4 join at P=64 on 28k rows cost 4.2 s vs 1.4 s at P=4)
    P_h = max(2, min(P, (n_rows + 65535) // 65536))
    counts = rows.groupby("h", num_partitions=P_h).aggregate(
        Count(alias_name="cnt"))

    def only_dups(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["cnt"], 1))

    dup = nonempty_blocks(counts.map_batches(only_dups,
                                             batch_format="pyarrow"))
    n_dup = 0 if dup is None else dup.count()

    if n_dup <= broadcast_limit:
        # dup-hash membership ships ONCE (ray.put of a sorted int64
        # array); each batch flags by searchsorted — the round-4
        # (rows JOIN counts) exchange is gone entirely
        dup_ref = _sorted_i64_broadcast(dup, "h")

        def flag_agg(b: pa.Table) -> pa.Table:
            import pandas as pd

            dref = ray.get(dup_ref)
            h = b["h"].to_numpy(zero_copy_only=False)
            hit, _ = _in_sorted(dref, h)
            d = hit.astype(np.int64)
            df = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                "n": 1, "d": d})
            g = df.groupby("doc_id", as_index=False).agg(
                p_n=("n", "sum"), p_d=("d", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = rows.map_batches(flag_agg, batch_format="pyarrow")
    else:
        # heavily-duplicated corpus at scale: keep the dup side
        # distributed.  Inner join tags dup INSTANCES only, so per-doc
        # chunk totals come from a second combiner pass over rows and
        # the two partial streams UNION into one final groupby
        dup_h = dup.select_columns(["h"]).repartition(
            max(1, min(P, (n_dup + 65535) // 65536)))
        joined = rows.join(dup_h, "inner", num_partitions=P_h,
                           on=("h",))

        def dup_partial(b: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                "d": 1})
            g = df.groupby("doc_id", as_index=False).agg(
                p_d=("d", "sum"))
            g["p_n"] = 0
            return pa.Table.from_pandas(g[["doc_id", "p_n", "p_d"]],
                                        preserve_index=False)

        def tot_partial(b: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                "n": 1})
            g = df.groupby("doc_id", as_index=False).agg(
                p_n=("n", "sum"))
            g["p_d"] = 0
            return pa.Table.from_pandas(g[["doc_id", "p_n", "p_d"]],
                                        preserve_index=False)

        partials = (rows.map_batches(tot_partial,
                                     batch_format="pyarrow")
                    .union(joined.map_batches(dup_partial,
                                              batch_format="pyarrow")))

    agg = (partials.groupby("doc_id", num_partitions=P_h)
           .aggregate(Sum("p_n", alias_name="n_chunks"),
                      Sum("p_d", alias_name="n_dup_chunks")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_chunks"].to_numpy()
        d = b["n_dup_chunks"].to_numpy()
        return b.append_column("dup_ppm", pa.array(
            (d * 1_000_000) // np.maximum(n, 1), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")
