"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — `import PIL`/`librosa` are gated and raise
``NotImplementedError`` at use), but everything Ray-side is real and
tested: the schema (binary column + metadata struct), the actor-pool
stage signature (setup once per actor in ``__init__``), small
batch sizes for wide binary rows, and the output layout.  Tests run the
same stages with the deterministic fake decoder.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string()),
    pa.field("kind", pa.string()),          # image | audio | video
    pa.field("payload", pa.binary()),       # opaque encoded bytes
    pa.field("content_type", pa.string()),
])

# Wide binary rows: keep batches small so batch x concurrency fits the
# worker heap (see module docstring in SURVEY.md §4 memory row).
MEDIA_BATCH_SIZE = 64


def synthesize_media_batch(batch: pa.Table, payload_bytes: int = 4096
                           ) -> pa.Table:
    """Deterministic fake media: payload = keyed blake2b stream.  Stands
    in for reading real blobs; exercises binary-column plumbing."""
    ids = batch["doc_id"].to_pylist()
    kinds = ["image", "audio", "video"]
    payloads = []
    out_kind = []
    for d in ids:
        seedb = hashlib.blake2b(str(d).encode(), digest_size=32).digest()
        reps = payload_bytes // 32 + 1
        payloads.append((seedb * reps)[:payload_bytes])
        # kind must be ROW-intrinsic (first seed byte), never the
        # batch-local index: block boundaries are an executor choice,
        # and output that depends on them is nondeterministic
        out_kind.append(kinds[seedb[0] % 3])
    return pa.table({
        "media_id": pa.array([str(d) for d in ids], pa.string()),
        "kind": pa.array(out_kind, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "content_type": pa.array(
            [{"image": "image/png", "audio": "audio/wav",
              "video": "video/mp4"}[k] for k in out_kind], pa.string()),
    })


class MediaDecodeStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` loads the (heavy) decoder once per actor;
    ``__call__`` decodes a batch.  Pass ``decoder="fake"`` for the
    deterministic stand-in; ``decoder="pil"``/"librosa" require the real
    libraries (absent here -> NotImplementedError at construction, not
    silently at batch time).

    Usage:
        ds.map_batches(MediaDecodeStage,
                       fn_constructor_kwargs={"decoder": "fake"},
                       batch_format="pyarrow",
                       batch_size=MEDIA_BATCH_SIZE,
                       concurrency=4, num_cpus=1)
    """

    def __init__(self, decoder: str = "fake") -> None:
        self.decoder = decoder
        if decoder == "fake":
            self._decode = self._decode_fake
        elif decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs Pillow (not in this "
                    "container); use decoder='fake'") from e
            raise NotImplementedError("PIL decode path not implemented")
        elif decoder == "librosa":
            try:
                import librosa  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real audio decode needs librosa (not in this "
                    "container); use decoder='fake'") from e
            raise NotImplementedError("librosa decode path not implemented")
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    @staticmethod
    def _decode_fake(payload: bytes, kind: str) -> dict:
        """Deterministic pseudo-decode: stable features from the bytes."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        h = hashlib.blake2b(payload, digest_size=8).digest()
        base = int.from_bytes(h, "big")
        return {
            "width": 16 + base % 1024 if kind != "audio" else 0,
            "height": 16 + (base >> 10) % 1024 if kind != "audio" else 0,
            "duration_ms": int(base % 60_000) if kind != "image" else 0,
            "mean_byte": float(arr.mean()) if len(arr) else 0.0,
            "n_bytes": len(arr),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = [self._decode(p, k) for p, k in zip(payloads, kinds)]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "width": pa.array([f["width"] for f in feats], pa.int32()),
            "height": pa.array([f["height"] for f in feats], pa.int32()),
            "duration_ms": pa.array([f["duration_ms"] for f in feats],
                                    pa.int64()),
            "mean_byte": pa.array([round(f["mean_byte"], 6)
                                   for f in feats], pa.float64()),
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
        })


class FrameSampleStage:
    """Actor-pool stage: sample N pseudo-frames from video payloads —
    output is one row per (media_id, frame_idx) with a frame digest
    (the explode layout real frame extraction would produce)."""

    def __init__(self, num_frames: int = 4) -> None:
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, digests = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "video":
                continue
            n = len(payload)
            for f in range(self.num_frames):
                lo = (n * f) // self.num_frames
                hi = (n * (f + 1)) // self.num_frames
                ids.append(mid)
                frames.append(f)
                digests.append(hashlib.blake2b(
                    payload[lo:hi], digest_size=8).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(frames, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
        })


def media_features(docs_ds, decoder: str = "fake", concurrency: int = 2):
    """documents -> synthesized media -> actor-pool decode features."""
    media = docs_ds.map_batches(synthesize_media_batch,
                                batch_format="pyarrow",
                                batch_size=MEDIA_BATCH_SIZE)
    return media.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1)


def video_frames(docs_ds, num_frames: int = 4, concurrency: int = 2):
    media = docs_ds.map_batches(synthesize_media_batch,
                                batch_format="pyarrow",
                                batch_size=MEDIA_BATCH_SIZE)
    return media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1)


def span_stats(ds):
    """Per-document statistics over the INTERLEAVED span column — the
    north-rule input shape (doc_id: string, spans:
    list<struct<kind, text, media_ref, offset>>) consumed directly as
    zero-copy Arrow: ``list_flatten`` + ``list_parent_indices`` turn
    the nested column into flat child arrays without materializing a
    single Python row.  Output (doc_id, n_spans, n_text_spans,
    n_media_spans, text_chars): the text/media interleaving profile a
    curation pass filters on (all-media docs, text-free boilerplate).
    Stateless one-pass map — no shuffle at any scale."""
    import pyarrow.compute as pc

    def per_batch(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp).to_numpy()
        n = b.num_rows
        n_spans = pc.list_value_length(sp).to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_text = pc.equal(flat.field("kind"),
                           "text").to_numpy(zero_copy_only=False)
        has_media = pc.is_valid(flat.field("media_ref")).to_numpy(
            zero_copy_only=False)
        chars = pc.coalesce(
            pc.cast(pc.utf8_length(flat.field("text")), pa.int64()),
            pa.scalar(0, pa.int64())).to_numpy(zero_copy_only=False)
        n_text = np.bincount(parent, weights=is_text,
                             minlength=n).astype(np.int64)
        n_media = np.bincount(parent, weights=has_media,
                              minlength=n).astype(np.int64)
        t_chars = np.bincount(parent, weights=chars,
                              minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_text_spans": pa.array(n_text, pa.int64()),
            "n_media_spans": pa.array(n_media, pa.int64()),
            "text_chars": pa.array(t_chars, pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def mm_quality_gate(ds, min_text_chars: int = 20,
                    max_media_ppm: int = 600_000):
    """Multimodal curation gate over the INTERLEAVED span column: keep
    documents with at least one text-KIND span (possibly empty — the
    char floor below is what excludes text-free docs), >=
    ``min_text_chars`` total text, and a media-span fraction at most
    ``max_media_ppm`` (exact integer parts-per-million of n_spans) —
    the "drop all-media galleries and text-free boilerplate" filter an
    interleaved training mix applies before packing (mm_pack).

    Output (doc_id, n_spans, n_media_spans, text_chars, media_ppm) for
    the KEPT docs only.  Composes the zero-copy ``span_stats`` kernel
    with one vectorized Arrow filter — stateless map, no shuffle, no
    floats (ppm is floor-division so the gate hash-matches SQL)."""
    import pyarrow.compute as pc

    def gate(b: pa.Table) -> pa.Table:
        n = b["n_spans"].to_numpy()
        m = b["n_media_spans"].to_numpy()
        ppm = np.where(n > 0, (m * 1_000_000) // np.maximum(n, 1), 0)
        t = b.append_column("media_ppm",
                            pa.array(ppm.astype(np.int64), pa.int64()))
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["text_chars"],
                                 pa.scalar(min_text_chars, pa.int64())),
                pc.greater_equal(t["n_text_spans"],
                                 pa.scalar(1, pa.int64()))),
            pc.less_equal(t["media_ppm"],
                          pa.scalar(max_media_ppm, pa.int64())))
        return t.filter(keep).select(
            ["doc_id", "n_spans", "n_media_spans", "text_chars",
             "media_ppm"])

    return span_stats(ds).map_batches(gate, batch_format="pyarrow")


def interleaved_dedup(ds):
    """Exact dedup of interleaved documents keyed on the NORTH-RULE
    span-sequence invariant: two docs are duplicates iff their ordered
    (kind, text, media_ref) span sequences are byte-identical — the
    same per-row equality the crawl parity suite pins (reference
    extract fixtures, workflow.go:218-252).  Output one row per
    distinct sequence: (span_digest, n_docs, min_doc_id).

    Canonical encoding: spans sorted by ``offset``, fields joined with
    US (0x1f) and records with RS (0x1e), NULLs coded as one NUL byte —
    prefix-unambiguous, and expressible verbatim in SQL
    (``md5(string_agg(kind || chr(31) || ... ORDER BY "offset"))``) so
    the digests hash-match DuckDB's.  Per batch the nested column
    flattens zero-copy; only the per-doc join + md5 is Python (the
    fingerprint precedent — the honest cost of oracle parity; the
    production swap is a vectorized 128-bit hash over the same bytes).
    Exchange is (digest, doc_id) — 50-byte rows — into ONE groupby."""
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    NULB = "\x00"
    US = "\x1f"
    RS = "\x1e"

    def digest(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        kind = flat.field("kind").to_pylist()
        text = flat.field("text").to_pylist()
        ref = flat.field("media_ref").to_pylist()
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        # per-doc slices of the FLAT arrays via list_parent_indices,
        # which is null-skipping and rebased exactly like list_flatten
        # (raw ListArray.offsets are neither: a sliced chunk or a null
        # spans entry with advancing offsets would mis-align them —
        # the same null-safe pattern span_stats uses)
        parent = pc.list_parent_indices(sp).to_numpy(
            zero_copy_only=False)
        doc_ix = np.arange(b.num_rows, dtype=np.int64)
        starts = np.searchsorted(parent, doc_ix, side="left")
        ends = np.searchsorted(parent, doc_ix, side="right")
        out = []
        keep = []
        for i in range(b.num_rows):
            lo, hi = starts[i], ends[i]
            if hi == lo:
                # zero-span (or null-spans) docs have no sequence:
                # excluded, matching the oracle's unnest semantics
                # (emits no rows for them) — parity on any legal input
                continue
            keep.append(i)
            order = np.argsort(off[lo:hi], kind="stable") + lo
            enc = RS.join(
                (kind[j] if kind[j] is not None else NULB) + US
                + (text[j] if text[j] is not None else NULB) + US
                + (ref[j] if ref[j] is not None else NULB)
                for j in order)
            out.append(hashlib.md5(enc.encode("utf-8")).hexdigest())
        ids = b["doc_id"] if len(keep) == b.num_rows else \
            b["doc_id"].take(pa.array(keep, pa.int64()))
        return pa.table({
            "span_digest": pa.array(out, pa.string()),
            "doc_id": ids,
        })

    return (ds.map_batches(digest, batch_format="pyarrow")
            .groupby("span_digest")
            .aggregate(Count(alias_name="n_docs"),
                       Min("doc_id", alias_name="min_doc_id")))


def interleaved_curation(ds):
    """The multimodal counterpart of the C4 recipe: keep interleaved
    documents that (a) pass the ``mm_quality_gate`` and (b) are their
    span-sequence duplicate group's min-doc_id winner
    (``interleaved_dedup``) — gate-then-dedup, composed as one lazy
    chain.  Output = the gate's profile rows for the kept docs
    (doc_id, n_spans, n_media_spans, text_chars, media_ppm).

    Both legs stream over the same input independently (span flatten
    is cheap; neither leg ships span text to the exchange); the final
    keep is ONE narrow hash join of the gate rows against the winner
    id set."""
    from .blocks import nonempty_blocks

    def _empty():
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "n_spans": pa.array([], pa.int64()),
            "n_media_spans": pa.array([], pa.int64()),
            "text_chars": pa.array([], pa.int64()),
            "media_ppm": pa.array([], pa.int64())}))

    # BOTH join sides must be provably non-empty: a 0-row side crashes
    # inside the JoinOperator's own shuffle (the customer_activity
    # lesson), and an all-gated-out corpus is a legal input
    gate = nonempty_blocks(mm_quality_gate(ds))
    if gate is None:
        return _empty()
    winners = nonempty_blocks(
        interleaved_dedup(ds).map_batches(
            lambda b: pa.table({"w_doc_id": b["min_doc_id"]}),
            batch_format="pyarrow"))
    if winners is None:
        return _empty()
    return (gate.join(winners, "inner", num_partitions=4,
                      on=("doc_id",), right_on=("w_doc_id",))
            .select_columns(["doc_id", "n_spans", "n_media_spans",
                             "text_chars", "media_ppm"]))


# reserved sentinel for a NULL group key crossing a Ray groupby
# exchange (Ray 2.49's sort partitioner cannot order null strings,
# and a bare \x00 was observed mangled to "" by the polars-backed
# sort); real span kinds / event types must not contain \x1f
_NULL_KEY = "\x1f__null__"


def span_transitions(ds):
    """Kind-bigram transition census over the INTERLEAVED span column:
    (kind_from, kind_to, n) for every adjacent span pair in OFFSET
    order — the text->image->text interleaving grammar of the corpus
    (how often media interrupts prose, whether galleries run
    media-after-media), the profile an interleaved packing policy
    (mm_pack) is tuned against.  Offset order is the north-rule
    span-sequence order invariant (kind, text, media_ref, order), so
    a shuffled stored list yields the same transitions.

    Plan: zero-copy ``list_flatten`` + ``list_parent_indices``, ONE
    numpy lexsort per batch puts spans in (doc, offset) order, a
    boundary mask drops cross-document pairs, and a pandas combiner
    pre-aggregates so only (kind, kind, partial_n) rows — at most
    |kinds|^2 per batch — reach the single tiny groupby Sum.  No
    per-row Python, one exchange of combiner-sized rows at any
    corpus size."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def per_batch(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "kind_from": pa.array([], pa.string()),
            "kind_to": pa.array([], pa.string()),
            "pn": pa.array([], pa.int64()),
        })
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        if not len(flat):
            return empty
        parent = pc.list_parent_indices(sp).to_numpy()
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        order = np.lexsort((off, parent))
        kinds = flat.field("kind").to_numpy(
            zero_copy_only=False)[order]
        par = parent[order]
        same_doc = par[:-1] == par[1:]
        if not same_doc.any():
            return empty
        df = pd.DataFrame({"kind_from": kinds[:-1][same_doc],
                           "kind_to": kinds[1:][same_doc]})
        g = df.groupby(["kind_from", "kind_to"], dropna=False,
                       as_index=False).size()
        # NULL kinds stay legal groups (dropna=False above, matching
        # the SQL twin's GROUP BY), but Ray 2.49's sort-based groupby
        # partitioner cannot ORDER a null string key ('<' between None
        # and str inside find_partition_index) — encode null as the
        # reserved \\x00 sentinel for the exchange and decode after
        def enc(s):
            return pa.array(s.where(s.notna(), _NULL_KEY).tolist(),
                            pa.string())

        return pa.table({
            "kind_from": enc(g["kind_from"]),
            "kind_to": enc(g["kind_to"]),
            "pn": pa.array(g["size"].to_numpy().astype(np.int64),
                           pa.int64()),
        })

    def decode(b: pa.Table) -> pa.Table:
        def dec(c):
            c = c.combine_chunks()
            return pc.if_else(pc.equal(c, _NULL_KEY),
                              pa.scalar(None, pa.string()), c)

        return pa.table({
            "kind_from": dec(b["kind_from"]),
            "kind_to": dec(b["kind_to"]),
            "n": b["n"],
        })

    return (ds.map_batches(per_batch, batch_format="pyarrow")
            .groupby(["kind_from", "kind_to"])
            .aggregate(Sum("pn", alias_name="n"))
            .map_batches(decode, batch_format="pyarrow"))


def media_manifest(ds):
    """Flatten the interleaved span column to the ordered media-asset
    manifest (doc_id, span_offset, kind, media_ref) — one row per span
    carrying a media_ref, in document order.  This is the exact feed an
    asset-fetch actor pool (`stages/fetch.py`) or the stubbed decoders
    above consume; the span ``offset`` preserves the reference's
    span-sequence order invariant (kind, text, media_ref, order).
    Zero-copy flatten + one vectorized filter; no shuffle."""
    import pyarrow.compute as pc

    def per_batch(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp)
        ids = pc.take(b["doc_id"].combine_chunks(), parent)
        mask = pc.is_valid(flat.field("media_ref"))
        return pa.table({
            "doc_id": pc.filter(ids, mask),
            "span_offset": pc.cast(pc.filter(flat.field("offset"), mask),
                                   pa.int64()),
            "kind": pc.filter(flat.field("kind"), mask),
            "media_ref": pc.filter(flat.field("media_ref"), mask),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def media_context(ds):
    """Caption/alt-text mining over the INTERLEAVED span column: for
    each media span (``media_ref`` non-null) the nearest preceding and
    nearest following NON-EMPTY text-kind span within its document, in
    ``offset`` order — the text-media alignment a multimodal training
    pipeline pairs with the decoded asset (reference parity: spans are
    the same (kind, text, media_ref, order) sequence the crawl's
    extract path walks, reference workflow.go:218-252).

    Output (doc_id, span_offset, media_ref, prev_text, next_text);
    ``''`` where no qualifying text span exists on that side.  Spans
    live inside ONE row, so the whole transform is a stateless
    per-batch map — zero-copy flatten, one lexsort, two C-level
    grouped fills; no shuffle at any scale."""
    import pandas as pd
    import pyarrow.compute as pc

    def per_batch(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp).to_numpy()
        n = len(parent)
        empty = pa.table({
            "doc_id": pa.array([], pa.string()),
            "span_offset": pa.array([], pa.int64()),
            "media_ref": pa.array([], pa.string()),
            "prev_text": pa.array([], pa.string()),
            "next_text": pa.array([], pa.string()),
        })
        if n == 0:
            return empty
        off = flat.field("offset").to_numpy(
            zero_copy_only=False).astype(np.int64)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        txt_arr = pc.fill_null(flat.field("text"), "")
        tlen = pc.utf8_length(txt_arr).to_numpy(zero_copy_only=False)
        has_m = pc.is_valid(flat.field("media_ref")).to_numpy(
            zero_copy_only=False)
        if not has_m.any():
            return empty
        txt = txt_arr.to_pandas().to_numpy()
        mref = flat.field("media_ref").to_pandas().to_numpy()
        ids = pc.take(b["doc_id"].combine_chunks(),
                      pa.array(parent)).to_pandas().to_numpy()

        order = np.lexsort((off, parent))
        p = parent[order]
        it = ((kind[order] == "text") & (tlen[order] > 0))
        # index of the last/next qualifying text span, strictly
        # before/after: grouped ffill/bfill of the own-index column,
        # shifted by one for rows that are themselves text
        ti = np.where(it, np.arange(n, dtype=np.float64), np.nan)
        s = pd.Series(ti)
        tf = s.groupby(p).ffill().to_numpy()
        tb = s.groupby(p).bfill().to_numpy()
        tf_prev = pd.Series(tf).groupby(p).shift(1).to_numpy()
        tb_next = pd.Series(tb).groupby(p).shift(-1).to_numpy()
        prev_idx = np.where(it, tf_prev, tf)
        next_idx = np.where(it, tb_next, tb)

        mask = has_m[order]
        pi = prev_idx[mask]
        ni = next_idx[mask]
        ts = txt[order]
        prev_t = np.where(np.isnan(pi), "",
                          ts[np.nan_to_num(pi).astype(np.int64)])
        next_t = np.where(np.isnan(ni), "",
                          ts[np.nan_to_num(ni).astype(np.int64)])
        return pa.table({
            "doc_id": pa.array(ids[order][mask], pa.string()),
            "span_offset": pa.array(off[order][mask], pa.int64()),
            "media_ref": pa.array(mref[order][mask], pa.string()),
            "prev_text": pa.array(prev_t, pa.string()),
            "next_text": pa.array(next_t, pa.string()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def media_dedup(ds):
    """Exact media-asset dedup across the corpus: group the interleaved
    spans by ``media_ref`` and keep the FIRST occurrence by (doc_id,
    span offset) — the asset-level analogue of ``dedup_exact`` (fetch
    each shared stylesheet/image once, then reference-count it).

    Output (media_ref, n_refs, first_doc_id, first_offset).

    Plan for 10^10 spans: per-batch combiner collapses each block to
    (media_ref, partial count, partial min key) rows, ONE
    groupby(media_ref) with Sum+Min partials merges them, a final map
    unpacks the key — only asset-sized rows shuffle, never the spans.
    The min key is ``doc_id + '\\t' + zero-padded offset``: tab sorts
    below every URL codepoint, so string min == (doc_id, offset)
    lexicographic min (the round-2 '|'-separator lesson, ADVICE r2)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    def combiner(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp)
        mask = pc.is_valid(flat.field("media_ref"))
        ids = pc.filter(pc.take(b["doc_id"].combine_chunks(), parent),
                        mask).to_pandas().to_numpy()
        mr = pc.filter(flat.field("media_ref"),
                       mask).to_pandas().to_numpy()
        off = pc.filter(flat.field("offset"), mask).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(mr) == 0:
            return pa.table({"media_ref": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64()),
                             "p_k": pa.array([], pa.string())})
        key = pd.Series(ids) + "\t" + pd.Series(off).astype(
            str).str.zfill(12)
        g = (pd.DataFrame({"media_ref": mr, "k": key.to_numpy()})
             .groupby("media_ref", as_index=False)
             .agg(p_n=("k", "size"), p_k=("k", "min")))
        return pa.table({
            "media_ref": pa.array(g["media_ref"].to_numpy(), pa.string()),
            "p_n": pa.array(g["p_n"].to_numpy().astype(np.int64),
                            pa.int64()),
            "p_k": pa.array(g["p_k"].to_numpy(), pa.string()),
        })

    agg = (ds.map_batches(combiner, batch_format="pyarrow")
           .groupby("media_ref")
           .aggregate(Sum("p_n", alias_name="n_refs"),
                      Min("p_k", alias_name="_k")))

    def unpack(b: pa.Table) -> pa.Table:
        k = b["_k"].to_pandas()
        parts = k.str.rsplit("\t", n=1, expand=True)
        return pa.table({
            "media_ref": b["media_ref"],
            "n_refs": pc.cast(b["n_refs"], pa.int64()),
            "first_doc_id": pa.array(parts[0].to_numpy(), pa.string()),
            "first_offset": pa.array(
                parts[1].astype(np.int64).to_numpy(), pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def span_text(ds):
    """Render an interleaved document to plain text: the non-empty
    ``text`` fields of its spans joined by single spaces in ``offset``
    order — the bridge from the north-rule nested shape to every text
    operator above (token_count, dedup, quality all compose on the
    output).  Spans live inside ONE row, so the whole transform is a
    stateless per-batch map: zero-copy flatten, vectorized mask, one
    C-level pandas group-join — docs whose spans carry no text yield
    an empty string (kept, so row count is stable)."""
    import pandas as pd
    import pyarrow.compute as pc

    def per_batch(b: pa.Table) -> pa.Table:
        sp = b["spans"].combine_chunks()
        flat = pc.list_flatten(sp)
        parent = pc.list_parent_indices(sp).to_numpy()
        txt = pc.fill_null(flat.field("text"), "")
        keep = pc.greater(pc.utf8_length(txt),
                          0).to_numpy(zero_copy_only=False)
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"p": parent[keep],
                           "o": off[keep],
                           "t": txt.to_pandas().to_numpy()[keep]})
        joined = (df.sort_values(["p", "o"])
                  .groupby("p", sort=True)["t"].agg(" ".join))
        out = np.full(b.num_rows, "", dtype=object)
        out[joined.index.to_numpy()] = joined.to_numpy()
        return pa.table({
            "doc_id": b["doc_id"],
            "text": pa.array(out, pa.string()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")
