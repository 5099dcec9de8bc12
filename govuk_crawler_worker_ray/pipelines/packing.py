"""Training-sequence packing layout — the "concatenate all documents,
then slice fixed-length windows" packing every GPT-style pretraining run
uses (Radford et al. 2019; Brown et al. 2020 — public method).

``pack_offsets`` assigns every document its global token offset in the
doc_id-ordered concatenation of the corpus, plus the first/last training
sequence it lands in.  That offset is a GLOBAL PREFIX SUM — the one
primitive Ray Data has no native operator for — implemented as the
classic two-phase distributed scan:

  1. narrow projection (doc_id, n_tokens, bucket) where buckets are
     doc_id ranges (order-preserving);
  2. per-bucket token sums via a pre-aggregated groupby — a tiny table
     (one row per bucket) that the driver exclusive-scans and
     broadcasts;
  3. groupby(bucket).map_groups: sort by doc_id inside the bucket,
     local exclusive cumsum + the bucket's base offset.

Only narrow int64 rows ever shuffle; text is read once for token
counts and never moves.  At 10^10 docs, widen ``bucket_docs`` so the
driver-side scan stays ~10^5 rows (or add one more scan level — the
same trick, recursively); for sparse/non-dense ids swap the fixed-width
bucket for range-partition boundaries from an id-quantile sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"


def pack_offsets(ds, seq_tokens: int = 2048, bucket_docs: int = 64):
    """-> (doc_id, n_tokens, tok_start, seq_first, seq_last): the
    packing layout of the doc_id-ordered token concatenation sliced
    into ``seq_tokens``-token training sequences.  Empty docs occupy
    zero tokens (seq_last == seq_first at their start offset)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = pc.cast(pc.count_substring_regex(batch["text"],
                                                 TOKEN_RE),
                        pa.int64()).to_numpy()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "bucket": pa.array(ids // bucket_docs, pa.int64()),
        })

    # narrow int64 rows only; bounded, safe to pin for the two passes
    narrow_ds = ds.map_batches(narrow,
                               batch_format="pyarrow").materialize()

    # phase 1: per-bucket sums (pre-aggregated per batch), driver scan
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "bucket": batch["bucket"].to_numpy(zero_copy_only=False),
            "t": batch["n_tokens"].to_numpy(zero_copy_only=False)})
        g = df.groupby("bucket", as_index=False).agg(p=("t", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = (narrow_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("p", alias_name="bucket_tokens"))
            .to_pandas().sort_values("bucket"))
    base = dict(zip(
        sums["bucket"].to_numpy(),
        np.concatenate(([0], np.cumsum(
            sums["bucket_tokens"].to_numpy())[:-1])).astype(np.int64)))
    bref = ray.put(base)

    # phase 2: in-bucket exclusive cumsum + bucket base
    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_ = ray.get(bref)
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        start = (np.concatenate(([0], np.cumsum(n)[:-1]))
                 + base_[int(g["bucket"].iloc[0])])
        occ = np.maximum(n, 1)  # empty docs: seq_last == seq_first
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "tok_start": start,
            "seq_first": start // seq_tokens,
            "seq_last": (start + occ - 1) // seq_tokens,
        })

    return (narrow_ds.groupby("bucket")
            .map_groups(scan_bucket, batch_format="pandas"))


def deterministic_shuffle(ds):
    """Global training-order shuffle: every document gets a dense
    position 0..N-1 in ascending (md5(doc_id), doc_id) order — the
    reproducible corpus shuffle a training run consumes (stable across
    re-partitioning, resume, and cluster size, unlike
    ``random_shuffle``).

    Global rank without a global sort materialization: the 2-hex-char
    hash prefix gives 256 ORDER-PRESERVING buckets (fixed-width
    lowercase hex compares lexicographically = numerically), so rank =
    exclusive-scan of bucket counts + in-bucket local sort — the same
    two-phase scan as ``pack_offsets``.  Only (doc_id, 32-char hash)
    rows shuffle once, by bucket.

    md5-per-row in Python is the honest oracle-parity cost at test
    scale (see sampling.py's contract note); the production swap is a
    vectorized 128-bit hash behind the same ordering contract."""
    import hashlib

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def hashed(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(str(d).encode()).hexdigest()
              for d in batch["doc_id"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "h": pa.array(hs, pa.string()),
            "bucket": pa.array([int(h[:2], 16) for h in hs],
                               pa.int64()),
        })

    hashed_ds = ds.map_batches(hashed,
                               batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(b, minlength=256)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "partial_n": pa.array(cnt[nz], pa.int64())})

    sums = (hashed_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("partial_n", alias_name="n"))
            .to_pandas().sort_values("bucket"))
    base = dict(zip(
        sums["bucket"].to_numpy(),
        np.concatenate(([0], np.cumsum(
            sums["n"].to_numpy())[:-1])).astype(np.int64)))
    bref = ray.put(base)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_ = ray.get(bref)
        g = g.sort_values(["h", "doc_id"])
        start = base_[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "shuffle_pos": start + np.arange(len(g), dtype=np.int64),
        })

    return (hashed_ds.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pandas"))


def mm_pack(ds, seq_tokens: int = 2048, media_tokens: int = 64):
    """Interleaved-document packing layout: each doc's training cost is
    its span-text token count plus a FIXED ``media_tokens`` budget per
    media span (the image-patch / audio-frame placeholder budget every
    interleaved multimodal pretraining recipe charges — public method:
    Flamingo/MM1-style token accounting), packed in deterministic
    shuffle order (ascending (md5(doc_id), doc_id), the
    ``deterministic_shuffle`` contract) and sliced into ``seq_tokens``
    sequences.

    -> (doc_id, n_tokens, n_media, cost, tok_start, seq_first,
    seq_last).  Same two-phase distributed prefix sum as
    ``pack_offsets`` (256 order-preserving hash-prefix buckets, tiny
    driver scan, in-bucket cumsum); the span column is consumed
    zero-copy — flatten + bincount, never a Python row.  Zero-cost
    docs occupy a point (seq_last == seq_first)."""
    import hashlib

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def narrow(batch: pa.Table) -> pa.Table:
        sp = batch["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp).to_numpy()
        n = batch.num_rows
        t_per_span = pc.cast(pc.count_substring_regex(
            pc.fill_null(flat.field("text"), ""), TOKEN_RE),
            pa.int64()).to_numpy()
        m_per_span = pc.is_valid(flat.field("media_ref")).to_numpy(
            zero_copy_only=False)
        n_tok = np.bincount(parent, weights=t_per_span,
                            minlength=n).astype(np.int64)
        n_med = np.bincount(parent, weights=m_per_span,
                            minlength=n).astype(np.int64)
        ids = batch["doc_id"].to_pylist()
        hs = [hashlib.md5(str(d).encode()).hexdigest() for d in ids]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_media": pa.array(n_med, pa.int64()),
            "cost": pa.array(n_tok + media_tokens * n_med, pa.int64()),
            "h": pa.array(hs, pa.string()),
            "bucket": pa.array([int(h[:2], 16) for h in hs],
                               pa.int64()),
        })

    narrow_ds = ds.map_batches(narrow,
                               batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        c = batch["cost"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(b, weights=c, minlength=256).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "p": pa.array(cnt[nz], pa.int64())})

    sums = (narrow_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("p", alias_name="bucket_cost"))
            .to_pandas().sort_values("bucket"))
    base = dict(zip(
        sums["bucket"].to_numpy(),
        np.concatenate(([0], np.cumsum(
            sums["bucket_cost"].to_numpy())[:-1])).astype(np.int64)))
    bref = ray.put(base)

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_ = ray.get(bref)
        g = g.sort_values(["h", "doc_id"])
        c = g["cost"].to_numpy()
        start = (np.concatenate(([0], np.cumsum(c)[:-1]))
                 + base_[int(g["bucket"].iloc[0])])
        occ = np.maximum(c, 1)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy(),
            "n_media": g["n_media"].to_numpy(),
            "cost": c,
            "tok_start": start,
            "seq_first": start // seq_tokens,
            "seq_last": (start + occ - 1) // seq_tokens,
        })

    return (narrow_ds.groupby("bucket")
            .map_groups(scan_bucket, batch_format="pandas"))


def pack_manifest(ds, seq_tokens: int = 2048, media_tokens: int = 64):
    """Data-loader manifest for the ``mm_pack`` layout: one row per
    (training sequence, document) pair the sequence draws from ->
    (seq, doc_id, sl_start, sl_tokens), where ``sl_start`` is the
    document-local offset of the slice and ``sl_tokens`` its length
    after clipping to the sequence window (zero-cost docs keep their
    point row with sl_tokens == 0, so every packed doc is accounted
    for).  Pure per-batch numpy expansion over the mm_pack output —
    ``np.repeat`` on (seq_last - seq_first + 1), no shuffle beyond
    mm_pack's own; output rows ~= docs + sequence boundary crossings."""
    packed = mm_pack(ds, seq_tokens=seq_tokens,
                     media_tokens=media_tokens)

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["tok_start"].to_numpy()
        c = batch["cost"].to_numpy()
        sf = batch["seq_first"].to_numpy()
        sl = batch["seq_last"].to_numpy()
        reps = (sl - sf + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ts), dtype=np.int64), reps)
        # seq index within each doc's run: global arange minus each
        # run's start, then offset by the doc's first sequence
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        seq = (np.arange(reps.sum(), dtype=np.int64)
               - np.repeat(starts, reps) + np.repeat(sf, reps))
        lo = np.maximum(ts[doc_idx], seq * seq_tokens)
        hi = np.minimum(ts[doc_idx] + c[doc_idx],
                        (seq + 1) * seq_tokens)
        return pa.table({
            "seq": pa.array(seq, pa.int64()),
            "doc_id": batch["doc_id"].take(
                pa.array(doc_idx, pa.int64())),
            "sl_start": pa.array(lo - ts[doc_idx], pa.int64()),
            "sl_tokens": pa.array(np.maximum(hi - lo, 0), pa.int64()),
        })

    return packed.map_batches(expand, batch_format="pyarrow")
