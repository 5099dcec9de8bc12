"""Text-analysis operators over the ``documents`` table — the
training-data additions the north rule mandates beyond the reference's
own operators (language-ID, quality scoring, token counting, document
fingerprinting).

All hot paths are vectorized: pyarrow.compute regex kernels (RE2 — the
same engine DuckDB uses, so the SQL oracles match byte-for-byte) or
numpy.  Each function takes/returns ``ray.data.Dataset`` and streams;
nothing materializes the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,;:!?]"
# distinctive stopword markers per language (whole-word, case-insensitive)
LANG_MARKERS = {
    "en": r"(?i)\b(the|and|of|to|is)\b",
    "de": r"(?i)\b(der|die|und|das|ist)\b",
    "es": r"(?i)\b(el|la|que|los|es)\b",
    "fr": r"(?i)\b(le|la|les|et|est)\b",
}
CJK_RE = r"[一-鿿]"
STOP_RE = r"(?i)\b(the|and|of|a|to|in|is)\b"


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id + n_tokens (whitespace tokens, RE2 ``\\S+``)."""
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pc.cast(pc.count_substring_regex(batch["text"],
                                                     TOKEN_RE), pa.int64()),
    })


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc stats: chars, tokens, punctuation count, stopword count."""
    text = batch["text"]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_tokens": pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                            pa.int64()),
        "n_punct": pc.cast(pc.count_substring_regex(text, PUNCT_RE),
                           pa.int64()),
        "n_stopwords": pc.cast(pc.count_substring_regex(text, STOP_RE),
                               pa.int64()),
    })


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Heuristic quality score as integer points 0..10: length band (4) +
    stopword ratio (4) + punctuation sanity (2) — the usual
    pretraining-filter features, kept integer so the DuckDB oracle hashes
    identically (no float accumulation)."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                       pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, STOP_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE),
                      pa.float64())
    stop_ratio = pc.divide(n_stop, pc.max_element_wise(n_tokens,
                                                       pa.scalar(1.0)))
    punct_ratio = pc.divide(n_punct, pc.max_element_wise(n_chars,
                                                         pa.scalar(1.0)))
    len_ok = pc.cast(pc.and_(pc.greater_equal(n_chars, pa.scalar(100.0)),
                             pc.less_equal(n_chars, pa.scalar(20000.0))),
                     pa.int64())
    stop_ok = pc.cast(pc.greater_equal(stop_ratio, pa.scalar(0.01)),
                      pa.int64())
    punct_ok = pc.cast(pc.less_equal(punct_ratio, pa.scalar(0.2)),
                       pa.int64())
    points = pc.add(pc.multiply(len_ok, pa.scalar(4, pa.int64())),
                    pc.add(pc.multiply(stop_ok, pa.scalar(4, pa.int64())),
                           pc.multiply(punct_ok, pa.scalar(2, pa.int64()))))
    return pa.table({"doc_id": batch["doc_id"], "quality_points": points})


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """N-gram/stopword heuristic language ID: CJK chars => zh, else the
    marker-regex argmax over {en,de,es,fr}; ties break by fixed language
    order (en,de,es,fr) — deterministic, SQL-expressible."""
    text = batch["text"]
    counts = {lang: pc.count_substring_regex(text, rx).to_numpy()
              for lang, rx in LANG_MARKERS.items()}
    cjk = pc.count_substring_regex(text, CJK_RE).to_numpy()
    langs = list(LANG_MARKERS)
    mat = np.stack([counts[lang] for lang in langs], axis=1)
    best = mat.argmax(axis=1)  # first max wins = fixed order tiebreak
    pred = np.array(langs, dtype=object)[best]
    pred = np.where(cjk > 0, "zh", pred)
    return pa.table({
        "doc_id": batch["doc_id"],
        "pred_lang": pa.array(list(pred), pa.string()),
    })


_FP_MUL = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)
_FP_POW = np.array([1], dtype=np.uint64)  # MUL^i table, grown on demand


def _fp_powers(n: int) -> np.ndarray:
    """MUL^0..MUL^(n-1) in uint64 wraparound, cached across batches."""
    global _FP_POW
    if len(_FP_POW) < n:
        tbl = np.full(max(n, 2 * len(_FP_POW)), _FP_MUL, dtype=np.uint64)
        tbl[0] = 1
        _FP_POW = np.cumprod(tbl)  # uint64 multiply wraps mod 2^64
    return _FP_POW


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: degree-n polynomial rolling hash over the
    utf-8 bytes (uint64 wraparound) — cheap content identity for
    incremental recrawl diffing (the engine analog of mirror-file
    comparison).  Vectorized across the WHOLE batch: the Arrow string
    buffer is flattened once, each byte multiplied by its cached power
    of MUL, and per-doc sums come from one ``np.add.reduceat``."""
    n_docs = batch.num_rows
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs:
        arr = batch["text"].combine_chunks().cast(pa.large_utf8())
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        starts, ends = offsets[:-1], offsets[1:]
        lens = ends - starts
        total = int(lens.sum())
        if total:
            cum = np.cumsum(lens) - lens  # output start per doc
            pos = np.arange(total, dtype=np.int64)
            rep_cum = np.repeat(cum, lens)
            src = np.repeat(starts, lens) + (pos - rep_cum)
            flat = data[src].astype(np.uint64)
            # exponent = doc_len - 1 - pos_in_doc
            exp = np.repeat(lens - 1, lens) - (pos - rep_cum)
            prod = flat * _fp_powers(int(lens.max()))[exp]
            nonempty = np.nonzero(lens)[0]
            sums = np.add.reduceat(prod, cum[nonempty])
            out[nonempty] = sums ^ _FP_OFF
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array([f"{int(v):016x}" for v in out],
                                pa.string()),
    })


# ---------------------------------------------------------------------------
# Dataset-level pipelines
# ---------------------------------------------------------------------------

def token_counts(ds):
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


def text_stats(ds):
    return ds.map_batches(text_stats_batch, batch_format="pyarrow")


def quality_scores(ds):
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def lang_id(ds):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def fingerprints(ds):
    from .dedup import cpu_split

    return cpu_split(ds).map_batches(fingerprint_batch,
                                     batch_format="pyarrow")


def lang_histogram(ds):
    """groupby(lang).count() with per-batch PRE-AGGREGATION: each batch
    emits one row per lang, the groupby shuffles only those partials
    (the combiner pattern — SURVEY.md §2.7 aggregations note)."""
    def partial(batch: pa.Table) -> pa.Table:
        enc = batch["lang"].combine_chunks().dictionary_encode()
        langs = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(langs))
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "partial_n": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("partial_n", alias_name="n")))


def token_df(ds):
    """Vocabulary document frequency: (token, df) — for each distinct
    whitespace token, how many documents contain it (the DF side of
    TF-IDF and the input to stopword discovery).  Per-batch combiner:
    tokens are deduped per document and pre-counted per batch, so the
    one wide groupby(token) moves at most one row per (token, batch) —
    vocabulary-sized, not corpus-sized.  Hot tokens ("the") are exactly
    the pre-aggregated ones, so the shuffle is skew-free by
    construction."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        text = batch["text"].combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"token": flat.to_pandas()[keep],
                           "doc": doc_idx[keep]})
        g = (df.drop_duplicates()
             .groupby("token", as_index=False).agg(partial_df=("doc",
                                                               "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("partial_df", alias_name="df")))


# normalization/scrub regexes (RE2 — identical engine in pyarrow and
# DuckDB, so the SQL oracle matches byte-for-byte)
_SCRUB_DIGITS = r"[0-9]+"
_SCRUB_PUNCT = r"[.,;:!?]"
_SCRUB_WS = r"\s+"


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Pretraining text normalization: lowercase, mask digit runs to
    ``<num>``, strip sentence punctuation, collapse whitespace runs to
    one space, trim.  Pure RE2 kernel chain over the Arrow column —
    zero Python per row; the scrub every pretraining corpus pass needs
    before tokenization/dedup."""
    t = pc.utf8_lower(batch["text"])
    t = pc.replace_substring_regex(t, _SCRUB_DIGITS, "<num>")
    t = pc.replace_substring_regex(t, _SCRUB_PUNCT, "")
    t = pc.replace_substring_regex(t, _SCRUB_WS, " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({
        "doc_id": batch["doc_id"],
        "norm_text": t,
        "norm_chars": pc.cast(pc.utf8_length(t), pa.int64()),
    })


def normalize_texts(ds):
    return ds.map_batches(normalize_batch, batch_format="pyarrow")


# PII/scrub patterns (RE2-safe: no lookbehind; identical engine in
# pyarrow and DuckDB so the SQL oracle matches byte-for-byte)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """C4/CCNet-style PII masking: emails -> ``<email>``, URLs ->
    ``<url>``, phone-like digit runs -> ``<phone>``, with per-doc mask
    counts (the audit column every scrub pass ships with).  Pure RE2
    kernel chain — zero Python per row; order matters (URLs first so
    an address inside a URL doesn't double-mask)."""
    t = batch["text"]
    n_url = pc.count_substring_regex(t, _PII_URL)
    t = pc.replace_substring_regex(t, _PII_URL, "<url>")
    n_email = pc.count_substring_regex(t, _PII_EMAIL)
    t = pc.replace_substring_regex(t, _PII_EMAIL, "<email>")
    n_phone = pc.count_substring_regex(t, _PII_PHONE)
    t = pc.replace_substring_regex(t, _PII_PHONE, "<phone>")
    return pa.table({
        "doc_id": batch["doc_id"],
        "scrubbed_text": t,
        "n_urls": pc.cast(n_url, pa.int64()),
        "n_emails": pc.cast(n_email, pa.int64()),
        "n_phones": pc.cast(n_phone, pa.int64()),
    })


def pii_scrub(ds):
    return ds.map_batches(pii_scrub_batch, batch_format="pyarrow")


# GPT-2-family pretokenizer shape (public: Radford et al. 2019 release):
# contraction suffixes, letter runs, digit runs, punctuation runs,
# whitespace — RE2-compatible (no lookahead), identical counts in
# pyarrow and DuckDB (probed)
BPE_TOKEN_RE = (r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+"
                r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id + n_bpe_tokens under the GPT-2-style pretokenizer regex —
    the 'BPE-ish' token counting a training-data pipeline budgets with
    (vocab merges only split WITHIN these pretokens, so this upper-
    bounds and tracks real BPE token counts)."""
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": pc.cast(
            pc.count_substring_regex(batch["text"], BPE_TOKEN_RE),
            pa.int64()),
    })


def bpe_token_counts(ds):
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")


def distinctive_terms(ds, k: int = 3, num_partitions: int = 8,
                      broadcast_limit: int = 2_000_000,
                      distributed: bool | None = None):
    """Rarest-``k`` distinctive terms per document: each doc's distinct
    tokens score against the corpus document-frequency table and the
    ``k`` lowest-df tokens win (ties by token text) — the integer-exact
    cousin of TF-IDF term extraction (pure (df, token) ordering, no
    float idf, so the oracle hashes bit-for-bit).

    Two paths (auto-picked by vocabulary size, the minhash-candidates
    pattern):
    - broadcast (default when vocab <= ``broadcast_limit``): the
      (token, df) table ships once via ``ray.put``; the doc batches are
      then scored IN PLACE — zero shuffle, fully vectorized pandas
      (measured 18s -> ~1s at sf0.1: the join path's per-doc
      map_groups pays ~1ms x n_docs of group dispatch);
    - distributed (unbounded vocab — numbers/typos at web scale):
      ``Dataset.join`` on token, then per-doc top-k in map_groups.
      Correct at any vocab size, pays two shuffles."""
    import pandas as pd
    import ray

    def pairs_df(batch: pa.Table) -> "pd.DataFrame":
        n_docs = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return (pd.DataFrame({
            "doc_id": ids[doc_idx[keep]],
            "token": flat.to_pandas()[keep].to_numpy()})
            .drop_duplicates())

    # (token, df) via the same distributed combiner; materialized so
    # the auto-switch count() and the broadcast to_pandas() don't
    # re-execute the pipeline (narrow, vocabulary-sized).  Compacted to
    # non-empty blocks: it is a groupby output and feeds a hash join in
    # the distributed path (see blocks.nonempty_blocks).
    from .blocks import nonempty_blocks

    dfreq = nonempty_blocks(token_df(ds))
    if dfreq is None:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64())}))

    if distributed is None:
        distributed = dfreq.count() > broadcast_limit

    if not distributed:
        vocab = dfreq.to_pandas()
        vref = ray.put(pd.Series(
            vocab["df"].to_numpy().astype(np.int64),
            index=vocab["token"].to_numpy()))

        def score(batch: pa.Table) -> pa.Table:
            lut = ray.get(vref)
            g = pairs_df(batch)
            g["df"] = lut[g["token"]].to_numpy()
            g = (g.sort_values(["doc_id", "df", "token"])
                 .groupby("doc_id", sort=False).head(k))
            g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
            return pa.Table.from_pandas(
                g[["doc_id", "rank", "token", "df"]],
                preserve_index=False)

        return ds.map_batches(score, batch_format="pyarrow")

    doc_tokens = ds.map_batches(
        lambda b: pa.Table.from_pandas(pairs_df(b),
                                       preserve_index=False),
        batch_format="pyarrow")
    joined = doc_tokens.join(dfreq, "inner",
                             num_partitions=num_partitions,
                             on=("token",))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "token"]).head(k)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "token": g["token"].to_numpy(),
            "df": g["df"].to_numpy().astype(np.int64),
        })

    return joined.groupby("doc_id").map_groups(topk,
                                               batch_format="pandas")


def lang_mix(ds):
    """Per-source language composition: (source, lang, n_docs,
    share_ppm) where share_ppm is the doc count's exact
    parts-per-million share of its source (integer floor division, so
    it hash-matches SQL's window-over-aggregate) — the "is this domain
    monolingual boilerplate?" curation view next to lang_histogram.

    One combiner-pre-aggregated groupby moves <=|sources|x|langs| rows;
    the per-source totals join is a driver-side dict broadcast (the
    totals table is source-cardinality-tiny by construction — at web
    scale 'source' is a registrable domain, ~10^7 keys, still
    driver-safe; past that, swap the dict for a second tiny
    Dataset.join on source)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"source": b["source"].to_pylist(),
                           "lang": b["lang"].to_pylist(), "n": 1})
        g = df.groupby(["source", "lang"], as_index=False).agg(
            p_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    detail = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("p_n", alias_name="n_docs"))
              .materialize())
    totals: dict[str, int] = {}
    for b in detail.iter_batches(batch_format="pyarrow"):
        for s, n in zip(b["source"].to_pylist(),
                        b["n_docs"].to_pylist()):
            totals[s] = totals.get(s, 0) + int(n)

    def share(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy()
        tot = np.fromiter((totals[s] for s in b["source"].to_pylist()),
                          dtype=np.int64, count=b.num_rows)
        ppm = (n * 1_000_000) // np.maximum(tot, 1)
        return b.append_column(
            "share_ppm", pa.array(ppm.astype(np.int64), pa.int64()))

    return detail.map_batches(share, batch_format="pyarrow")


def source_token_detail(ds):
    """Per-source (n_docs, n_tokens) over whitespace tokens (TOKEN_RE,
    same contract as token_count): per-batch combiner pre-aggregates
    (source, docs, tokens) so the groupby moves <=|sources| rows per
    batch.  Shared by domain_mix and sampling.domain_mix_sample —
    the one copy of the token-accounting contract their oracles pin.
    Returns a MATERIALIZED |sources|-row Dataset (registrable-domain
    cardinality, the lang_mix bound)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        tok = pc.cast(pc.count_substring_regex(b["text"], TOKEN_RE),
                      pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": b["source"].to_pylist(),
                           "n": 1, "tok": tok})
        # dropna=False: NULL-source docs form their own group, matching
        # the DuckDB twins' GROUP BY source (SQL keeps NULL groups) —
        # same latent parity gap event_transitions fixed
        g = df.groupby("source", as_index=False, dropna=False).agg(
            p_n=("n", "sum"), p_tok=("tok", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("p_n", alias_name="n_docs"),
                       Sum("p_tok", alias_name="n_tokens"))
            .materialize())


def domain_mix(ds):
    """Per-source mixing weights for a training-data blend: (source,
    n_docs, n_tokens, token_share_ppm, weight_ppm).  token_share_ppm
    is the exact integer ppm share of whitespace tokens (TOKEN_RE,
    same contract as token_count); weight_ppm is the sqrt-flattened
    mix — weight proportional to isqrt(n_tokens) — the standard
    temperature-style reweighting that upweights small domains
    relative to their raw token share (the tau=2 point of the
    p_i^(1/tau) family used in multilingual/multi-domain pretraining
    recipes).  All-integer arithmetic: isqrt + floor-division ppm, so
    the result is summation-order-free and the DuckDB twin
    (FLOOR(SQRT(x)) == isqrt(x) exactly for x < 2^52 — web-scale
    per-source token counts sit comfortably under it) hash-matches.

    Same shuffle shape as lang_mix (see source_token_detail), then the
    two scalar totals broadcast from the driver (source is a
    registrable domain at web scale, ~10^7 keys, driver-safe; past
    that swap the totals for a tiny cross-join against a 1-row
    aggregate).  Python bigint arithmetic in the final map dodges
    int64 overflow of tokens * 1e6 at the 10^13-token scale."""
    import math

    detail = source_token_detail(ds)
    tot_tok, tot_sqrt = 0, 0
    for b in detail.iter_batches(batch_format="pyarrow"):
        for t in b["n_tokens"].to_pylist():
            tot_tok += int(t)
            tot_sqrt += math.isqrt(int(t))

    def weights(b: pa.Table) -> pa.Table:
        toks = [int(t) for t in b["n_tokens"].to_pylist()]
        share = [(t * 1_000_000) // max(tot_tok, 1) for t in toks]
        w = [(math.isqrt(t) * 1_000_000) // max(tot_sqrt, 1)
             for t in toks]
        return pa.table({
            "source": b["source"],
            "n_docs": b["n_docs"],
            "n_tokens": pa.array(toks, pa.int64()),
            "token_share_ppm": pa.array(share, pa.int64()),
            "weight_ppm": pa.array(w, pa.int64()),
        })

    return detail.map_batches(weights, batch_format="pyarrow")


def quality_filter(ds, q: float = 0.5):
    """Global-quantile quality gate: keep documents at or above the
    corpus's exact discrete ``q``-quantile of quality_points (the
    "drop the bottom half by quality" curation step).

    Two-pass global statistic, never a global sort: pass 1 builds the
    integer score histogram with per-batch bincount partials (the
    shuffle moves ~11 rows/batch), the DRIVER reads the tiny histogram
    and derives the quantile_disc threshold (element ceil(q*n)-1 of the
    sorted multiset); pass 2 re-streams and filters.  The input is read
    twice — that is the streaming-correct trade against materializing a
    10^10-row scored dataset."""
    scored = ds.map_batches(quality_score_batch, batch_format="pyarrow")

    def hist(batch: pa.Table) -> pa.Table:
        pts = batch["quality_points"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(pts, minlength=11)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pts": pa.array(nz, pa.int64()),
                         "partial_n": pa.array(cnt[nz], pa.int64())})

    from ray.data.aggregate import Sum

    # DRIVER-SIDE CARDINALITY ASSUMPTION: quality_points is an 11-value
    # integer domain by construction, so the histogram is <= 11 rows;
    # the shared guard still applies in case the scoring domain grows
    from ..pipelines.blocks import driver_histogram

    h = driver_histogram(
        scored.map_batches(hist, batch_format="pyarrow")
        .groupby("pts").aggregate(Sum("partial_n", alias_name="n")),
        "quality_filter").sort_values("pts")
    counts = h["n"].to_numpy()
    n_total = int(counts.sum())
    target = max(int(np.ceil(q * n_total)) - 1, 0)
    thr = int(h["pts"].to_numpy()[np.searchsorted(
        np.cumsum(counts) - 1, target)])

    def gate(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch["quality_points"], thr))

    return scored.map_batches(gate, batch_format="pyarrow")


def heavy_hitters(ds, pct: int = 1):
    """Corpus-level frequent tokens: every token whose total occurrence
    count exceeds ``pct`` percent of all tokens, with its EXACT count —
    stopword discovery / boilerplate detection.  Threshold compare stays
    in integers (100 * count > pct_scaled * total) so the oracle hashes
    bit-for-bit.

    Shape: the same skew-free vocabulary combiner as ``token_df`` (per-
    batch exact counts, one vocabulary-sized groupby) plus a scalar
    total from the same partials.  At unbounded vocabulary the swap is a
    mergeable SpaceSaving/Misra-Gries summary per batch with an exact
    second pass over the surviving candidates (the kmv_distinct
    precedent for sketch-backed operators)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        s = pd.Series(flat.to_pandas()[keep].to_numpy())
        g = s.value_counts()
        return pa.table({
            "token": pa.array(g.index.to_numpy(), pa.string()),
            "partial_n": pa.array(g.to_numpy().astype(np.int64),
                                  pa.int64())})

    # narrow (token, count) partials feed BOTH the per-token sum and
    # the corpus total without re-reading the text
    partials = ds.map_batches(partial,
                              batch_format="pyarrow").materialize()
    counts = (partials.groupby("token")
              .aggregate(Sum("partial_n", alias_name="n_occurrences")))
    total = int(partials.sum("partial_n"))

    def gate(batch: pa.Table) -> pa.Table:
        n = batch["n_occurrences"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(100 * n > pct * total))

    return counts.map_batches(gate, batch_format="pyarrow")


def bigram_fluency(ds):
    """Corpus-frequency fluency proxy — the role the CCNet/KenLM
    perplexity filter plays in pretraining curation (Wenzek et al.
    2020, public), with an integer-exact statistic instead of a float
    LM: per doc, the mean corpus-wide occurrence count of its token
    bigrams.  Typical prose scores high (its transitions are common);
    gibberish and boilerplate-with-rare-joins score low.

    Two passes over the text: (1) the global bigram count table via the
    skew-free combiner (per-batch counts, one vocabulary-sized
    groupby), broadcast once via ``ray.put``; (2) per-doc vectorized
    lookup + integer sum, one double division at the end — so the
    oracle hashes bit-for-bit.  Bigram vocabulary outgrowing a
    broadcast swaps pass 2 to the distinctive_terms join path."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def doc_bigrams(batch: pa.Table):
        n_docs = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.to_pandas()[keep].to_numpy()
        d = doc_idx[keep]
        if len(d) < 2:
            return (np.array([], np.int64),
                    np.array([], dtype=object), n_docs)
        same = d[1:] == d[:-1]
        bg = (pd.Series(w[:-1][same], dtype=object) + " "
              + pd.Series(w[1:][same], dtype=object)).to_numpy()
        return d[:-1][same], bg, n_docs

    def count_partial(batch: pa.Table) -> pa.Table:
        _, bg, _ = doc_bigrams(batch)
        g = pd.Series(bg).value_counts()
        return pa.table({
            "bg": pa.array(g.index.to_numpy(), pa.string()),
            "partial_n": pa.array(g.to_numpy().astype(np.int64),
                                  pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bg").aggregate(Sum("partial_n", alias_name="n"))
              .to_pandas())
    lut_ref = ray.put(pd.Series(counts["n"].to_numpy().astype(np.int64),
                                index=counts["bg"].to_numpy()))

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        d, bg, n_docs = doc_bigrams(batch)
        n_bi = np.bincount(d, minlength=n_docs).astype(np.int64)
        sums = np.zeros(n_docs, dtype=np.int64)
        if len(d):
            np.add.at(sums, d, lut[bg].to_numpy())
        safe = np.maximum(n_bi, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "avg_bigram_freq": pa.array(
                sums.astype(np.float64) / safe, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def repetition_stats(ds):
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights", App. A —
    public): per doc, the fraction of tokens that duplicate another
    token in the same document and the fraction of tokens covered by
    the single most frequent bigram.  Both are standard pretraining
    quality-filter features (high values => boilerplate/spam).

    Embarrassingly parallel (per-doc), no shuffle: one Arrow whitespace
    split + pandas C-level groupbys per batch.  Output is narrow
    (doc_id + 3 scalars)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        s = pd.Series(flat.to_pandas()[keep].to_numpy(), dtype=object)
        d = doc_idx[keep]
        n_tok = np.bincount(d, minlength=n_docs).astype(np.int64)
        n_dist = np.zeros(n_docs, dtype=np.int64)
        if len(d):
            g = (pd.DataFrame({"doc": d, "tok": s})
                 .drop_duplicates().groupby("doc")["tok"].size())
            n_dist[g.index.to_numpy()] = g.to_numpy()
        max_bg = np.zeros(n_docs, dtype=np.int64)
        if len(d) > 1:
            same = d[1:] == d[:-1]
            if same.any():
                left = s.to_numpy()
                bg = pd.DataFrame({
                    "doc": d[:-1][same],
                    "bg": pd.Series(left[:-1][same], dtype=object)
                    + " " + pd.Series(left[1:][same], dtype=object)})
                m = (bg.groupby(["doc", "bg"]).size()
                     .groupby(level=0).max())
                max_bg[m.index.to_numpy()] = m.to_numpy()
        safe_n = np.maximum(n_tok, 1).astype(np.float64)
        dup_frac = (n_tok - n_dist).astype(np.float64) / safe_n
        top_bg_frac = 2.0 * max_bg.astype(np.float64) / safe_n
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "dup_token_frac": pa.array(dup_frac, pa.float64()),
            "top_bigram_frac": pa.array(top_bg_frac, pa.float64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def decontaminate(ds, bench_mod: int = 17, n: int = 5):
    """Benchmark decontamination: flag training documents whose word
    ``n``-grams overlap a benchmark set (the standard eval-leak check —
    GPT-3 App. C / PaLM-style n-gram overlap, public method).  The
    "benchmark" here is the deterministic slice ``doc_id % bench_mod
    == 0`` of the same corpus (no external data).

    Scale shape: the benchmark gram set is SMALL by nature (eval suites
    are tiny next to a 100 TB corpus), so it is built distributed, then
    collected once and broadcast via ``ray.put`` — every flag task does
    an O(1) hash probe per position; the training corpus itself streams
    and never shuffles."""
    import pandas as pd
    import ray

    def grams_of(batch: pa.Table, only_bench: bool) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sel = (ids % bench_mod == 0) if only_bench \
            else (ids % bench_mod != 0)
        if not sel.any():
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype=object)})
        sub = batch.filter(pa.array(sel))
        toks = pc.utf8_split_whitespace(sub["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(sub.num_rows), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_pandas()[keep].to_numpy()
        d = doc_idx[keep]
        if len(d) < n:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype=object)})
        ok = d[:len(d) - n + 1] == d[n - 1:]  # gram stays in one doc
        gram = pd.Series(words[:len(d) - n + 1], dtype=object)
        for i in range(1, n):
            gram = gram + " " + pd.Series(
                words[i:len(d) - n + 1 + i], dtype=object)
        return pd.DataFrame({
            "doc_id": sub["doc_id"].to_numpy(zero_copy_only=False)[
                d[:len(d) - n + 1][ok]],
            "gram": gram[ok].to_numpy()})

    def bench_partial(batch: pa.Table) -> pa.Table:
        g = grams_of(batch, only_bench=True)
        return pa.table({"gram": pa.array(
            pd.unique(g["gram"]), pa.string())})

    bench_grams = set(
        ds.map_batches(bench_partial, batch_format="pyarrow")
        .unique("gram"))
    bench_ref = ray.put(frozenset(bench_grams))

    def flag(batch: pa.Table) -> pa.Table:
        grams = ray.get(bench_ref)
        g = grams_of(batch, only_bench=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cand = ids[ids % bench_mod != 0]
        hits = np.zeros(len(cand), dtype=np.int64)
        if len(g):
            hit = g["gram"].isin(grams)
            h = (pd.DataFrame({"doc_id": g["doc_id"], "hit": hit})
                 .groupby("doc_id")["hit"].sum())
            lut = pd.Series(np.arange(len(cand)), index=cand)
            hits[lut[h.index.to_numpy()].to_numpy()] = \
                h.to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(cand, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64),
                                     pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def length_histogram(ds):
    """Log2-bucketed document-length histogram: (bucket = floor(log2
    (n_chars)), n_docs, sum_chars) — the corpus-shape report every
    curation run starts with.  Integer bit_length arithmetic (no
    floats), per-batch partial counts, one tiny groupby."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(batch["text"]), pa.int64()).to_numpy()
        # floor(log2(x)) for x >= 1 == bit_length - 1; empty docs -> -1
        bucket = np.array([int(x).bit_length() - 1 for x in n],
                          dtype=np.int64)
        df = pd.DataFrame({"bucket": bucket, "n": 1, "chars": n})
        g = df.groupby("bucket", as_index=False).agg(
            partial_n=("n", "sum"), partial_c=("chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("partial_n", alias_name="n_docs"),
                       Sum("partial_c", alias_name="sum_chars")))


# ---------------------------------------------------------------------------
# sparse retrieval: integer-scaled tf-idf ranking against a fixed query
# ---------------------------------------------------------------------------

TFIDF_QUERY = ("table", "hash", "merge")
_IDF_SCALE = 1 << 20


def tfidf_rank(ds, terms: tuple[str, ...] = TFIDF_QUERY, k: int = 25):
    """Top-k documents for a bag-of-words query by integer-scaled
    tf-idf — the sparse-retrieval primitive (quality-classifier seed
    selection, contamination probes, BM25's exact-arithmetic cousin).

    score(d) = sum_t  tf(t, d) * ((N << 20) // df(t))  over the query
    terms, with whitespace-token-exact tf (split + equality count, the
    same integers DuckDB's string_split_regex + list_filter produce);
    integer throughout so the oracle hashes bit-for-bit (ln-based idf
    is not reproducible across math libraries).

    Two-phase broadcast plan — the shape that holds at 10^10 docs:
      1. df pass: per-batch partial (term -> [0/1 per doc] sums) via
         vectorized split/flatten/reduceat, ONE tiny groupby (|terms|
         rows), driver computes the |terms| integer idfs and
         ``ray.put``s them;
      2. score pass: per-batch tf x broadcast idf + partial top-k,
         driver merges k rows/batch.  No all-to-all anywhere.
    Output (doc_id, score), score desc / doc_id asc."""
    import ray
    from ray.data.aggregate import Sum

    def tf_counts(col: pa.ChunkedArray | pa.Array,
                  term: str) -> np.ndarray:
        toks = pc.split_pattern_regex(col, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        eq = pc.cast(pc.equal(toks.values, term),
                     pa.int64()).to_numpy(zero_copy_only=False)
        eq = np.nan_to_num(eq).astype(np.int64)
        out = np.zeros(len(toks), dtype=np.int64)
        lens = np.diff(offs)
        ne = lens > 0
        if ne.any():
            out[ne] = np.add.reduceat(eq, offs[:-1][ne])
        return out

    def df_partial(b: pa.Table) -> pa.Table:
        rows = []
        for t in terms:
            nz = int((tf_counts(b["text"], t) > 0).sum())
            rows.append((t, nz, len(b)))
        return pa.table({
            "term": pa.array([r[0] for r in rows], pa.string()),
            "p_df": pa.array([r[1] for r in rows], pa.int64()),
            "p_n": pa.array([r[2] for r in rows], pa.int64()),
        })

    dft = (ds.map_batches(df_partial, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("p_df", alias_name="df"),
                      Sum("p_n", alias_name="n")))
    dfd = {r["term"]: (int(r["df"]), int(r["n"]))
           for r in dft.iter_rows()}
    n_docs = next(iter(dfd.values()))[1] if dfd else 0
    idf = {t: ((n_docs * _IDF_SCALE) // df if df else 0)
           for t, (df, _) in dfd.items()}
    idf_ref = ray.put(idf)

    def score_partial(b: pa.Table) -> pa.Table:
        idf_ = ray.get(idf_ref)
        ids = b["doc_id"].to_numpy()
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        score = np.zeros(len(ids), dtype=np.int64)
        for t in terms:
            score += tf_counts(b["text"], t) * idf_[t]
        order = np.lexsort((ids, -score))[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.int64())})

    parts = [b for b in (ds.map_batches(score_partial,
                                        batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))
             if b.num_rows]
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64())})
    allp = pa.concat_tables(parts)
    ids = allp["doc_id"].to_numpy()
    score = allp["score"].to_numpy()
    order = np.lexsort((ids, -score))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                     "score": pa.array(score[order], pa.int64())})


# ---------------------------------------------------------------------------
# token windows: fixed-size chunking for training-shard layout
# ---------------------------------------------------------------------------


def token_windows(ds, window: int = 32, stride: int | None = None):
    """Split every document into fixed-size whitespace-token windows —
    the "pack long docs into model-context-sized chunks" primitive
    (the step between curation and ``pack_offsets``; overlap via
    ``stride`` < ``window`` gives the RoBERTa-style sliding chunks).
    Output (doc_id, win_idx, n_tokens, win_text); empty docs emit
    nothing.

    Pure per-batch flat_map — no shuffle, no state: one Arrow
    whitespace split per batch, window membership computed as numpy
    index arithmetic over the flattened token stream, and one C-level
    pandas group-join builds the window texts (the chunk_dedup explode
    shape).  Window count per doc is 1 + ceil(max(n - window, 0) /
    stride), the standard sliding-window count."""
    import pandas as pd

    if stride is None:
        stride = window
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # gaps (stride > window) would make the last-window count
        # formula emit starts past the end of short docs
        raise ValueError("stride must be <= window (tiling or overlap)")

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "win_idx": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "win_text": pa.array([], pa.string())})
        n_docs = batch.num_rows
        if not n_docs:
            return empty
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_pos = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_pandas()[keep].to_numpy()
        d = doc_pos[keep]
        if not len(d):
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = np.bincount(d, minlength=n_docs)  # tokens per doc
        # windows per doc (0 for empty docs)
        n_win = np.where(
            n_tok > 0,
            1 + np.ceil(np.maximum(n_tok - window, 0) / stride
                        ).astype(np.int64),
            0)
        tok_start = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        # one row per (doc, window): gather [win_start, win_end) token
        # index ranges, then repeat into a flat gather index
        wdoc = np.repeat(np.arange(n_docs), n_win)
        wstart_doc = np.concatenate(([0], np.cumsum(n_win)[:-1]))
        widx = np.arange(int(n_win.sum())) - wstart_doc[wdoc]
        ws = widx * stride
        we = np.minimum(ws + window, n_tok[wdoc])
        wlen = we - ws
        # flat token gather: for each window, tokens
        # [tok_start[doc]+ws, tok_start[doc]+we)
        total = int(wlen.sum())
        wrow = np.repeat(np.arange(len(wdoc)), wlen)
        out_start = np.concatenate(([0], np.cumsum(wlen)[:-1]))
        gather = (np.repeat(tok_start[wdoc] + ws, wlen)
                  + (np.arange(total) - out_start[wrow]))
        g = (pd.DataFrame({"row": wrow, "tok": words[gather]})
             .groupby("row", sort=False)["tok"].agg(" ".join))
        return pa.table({
            "doc_id": pa.array(ids[wdoc], pa.int64()),
            "win_idx": pa.array(widx, pa.int64()),
            "n_tokens": pa.array(wlen, pa.int64()),
            "win_text": pa.array(g.to_numpy(), pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HTML -> text extraction (crawler handoff to the training-data pipeline)
# ---------------------------------------------------------------------------

_HTML_STRIP = (
    (r"(?is)<script\b.*?</script>", " "),
    (r"(?is)<style\b.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
)
# order matters: &amp; LAST (single-pass decode; the SQL oracle uses
# the same order)
_HTML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)


def html_to_text_kernel(col):
    """Vectorized HTML -> plain-text kernel over an Arrow string
    column: strip script/style/comments/tags, decode the common
    entities, collapse whitespace.  Pure RE2 (`pc.replace_substring_
    regex`) — the same engine DuckDB's regexp_replace uses, so the SQL
    oracle is the WHOLE transform in SQL, byte-for-byte (no golden
    needed).  The boilerplate heuristics real extractors add (text
    density, link ratio) would layer on top of this kernel."""
    x = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    for pat, rep in _HTML_STRIP:
        x = pc.replace_substring_regex(x, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        x = pc.replace_substring(x, ent, ch)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def html_extract_text(ds):
    """HTML -> text over a crawled-page Dataset (url, body): the step
    that turns the reference's mirrored HTML (workflow.go:153-216
    writes raw bytes) into training-pipeline documents.  Per-batch RE2
    kernel chain, no shuffle, no state.  Output (url, text, n_chars);
    callers filter to HTML content types at the read (the
    content-type gate is AcceptedContentType's job, not this op's)."""
    def xb(batch: pa.Table) -> pa.Table:
        txt = html_to_text_kernel(batch["body"])
        return pa.table({
            "url": batch["url"],
            "text": txt,
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return ds.map_batches(xb, batch_format="pyarrow")


def inverted_index(ds):
    """Distributed inverted-index build: (token, df, postings) where
    postings is the doc_id-ascending list "doc:tf,doc:tf,..." — the
    retrieval-index layout behind BM25/tf-idf serving (token_df gives
    only the DF side; this materializes the posting payload).

    Shape: per-batch exact (token, doc_id, tf) partials — a document
    lives wholly in one row, so per-doc tf is final at batch level and
    the wide exchange moves one row per (token, doc), never per
    occurrence — then ONE vocabulary groupby assembles each token's
    postings.  Hot tokens ("the") make long posting rows, not hot
    shuffle keys: the exchange key is the token, one output row each.
    At serving scale the same rows would land in token-hash-partitioned
    parquet (the resumable-output layout); the query returns them
    inline."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        text = batch["text"].combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"token": flat.to_pandas()[keep],
                           "doc_id": doc_ids[keep]})
        g = (df.groupby(["token", "doc_id"], as_index=False)
             .size().rename(columns={"size": "tf"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        postings = ",".join(f"{d}:{t}" for d, t in
                            zip(g["doc_id"], g["tf"]))
        return pd.DataFrame({"token": [g["token"].iloc[0]],
                             "df": np.array([len(g)], dtype=np.int64),
                             "postings": [postings]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("token")
            .map_groups(assemble, batch_format="pandas"))


def vocab_encode(ds, vocab_size: int = 64):
    """Frequency-vocabulary build + corpus encode — the tokenizer-prep
    step of a pretraining pipeline: the ``vocab_size`` most frequent
    whitespace tokens get ids 0..V-1 (rank order: count DESC, token ASC
    — fully deterministic), every other token becomes OOV id -1, and
    each document encodes to its id sequence "i,i,i,...".

    Shape: pass 1 is the skew-free vocabulary combiner (per-batch token
    counts, ONE vocabulary-sized groupby) of which only the top-V rows
    — per-batch partial top-V, driver merge of V x batches rows — come
    back; the V-entry dict broadcasts via ``ray.put``; pass 2 encodes
    per batch with a vectorized pandas map.  Nothing driver-side scales
    with the vocabulary or the corpus.  Output: (doc_id, ids_csv)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        s = pd.Series(flat.to_pandas()[keep].to_numpy())
        g = s.value_counts()
        return pa.table({
            "token": pa.array(g.index.to_numpy(), pa.string()),
            "partial_n": pa.array(g.to_numpy().astype(np.int64),
                                  pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("partial_n", alias_name="n")))

    def topv(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True]).head(vocab_size)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = pa.concat_tables(
        counts.map_batches(topv, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")).to_pandas()
    cand = cand.sort_values(["n", "token"],
                            ascending=[False, True]).head(vocab_size)
    vocab = {t: i for i, t in enumerate(cand["token"])}
    ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        ids = (pd.Series(flat.to_pandas()).map(v).fillna(-1)
               .astype(np.int64).to_numpy())
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        ids, doc_idx = ids[keep], doc_idx[keep]
        csvs = []
        bounds = np.searchsorted(doc_idx, np.arange(batch.num_rows + 1))
        for r in range(batch.num_rows):
            seg = ids[bounds[r]:bounds[r + 1]]
            csvs.append(",".join(map(str, seg)))
        return pa.table({"doc_id": batch["doc_id"],
                         "ids_csv": pa.array(csvs, pa.string())})

    return ds.map_batches(encode, batch_format="pyarrow")


def pmi_collocations(ds, min_count: int = 5):
    """Collocation extraction — bigrams ranked by pointwise mutual
    information (Church & Hanks 1990, public), the classic corpus-
    analysis step for multiword-expression vocab and tokenizer merges.

    PMI = log(P(xy) / (P(x)P(y))); log is monotone, so ranking by the
    ARGUMENT keeps the order while staying integer-exact for the SQL
    twin (the pagerank/kmv precedent).  The statistic shipped is

        pmi_ratio_micros = ((c_xy * 1_000_000) // c_x) * n_tok // c_y

    with c_x/c_y unigram occurrence counts, n_tok the total token
    count, floor-division in that exact order on both sides.  The
    first factor is <= 1_000_000 (c_xy <= c_x), so the intermediate is
    bounded by 1e6 * n_tok — int64-safe to ~9e12 tokens; past that,
    drop SCALE to 1e3 (documented contract, same ordering).

    Shape: two skew-free combiner passes (per-batch value_counts, one
    vocabulary-sized groupby each) — unigrams broadcast once via
    ``ray.put`` (vocab outgrowing a broadcast swaps to the
    distinctive_terms join path), bigram counts stay a Dataset,
    filtered to c_xy >= min_count BEFORE the lookup map.  Only
    (w1, w2, int64) rows ever move."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        g = pd.Series(flat.to_pandas()[keep].to_numpy()).value_counts()
        return pa.table({
            "token": pa.array(g.index.to_numpy(), pa.string()),
            "partial_n": pa.array(g.to_numpy().astype(np.int64),
                                  pa.int64())})

    uni = (ds.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("partial_n", alias_name="n")).to_pandas())
    n_tok = int(uni["n"].sum())
    lut_ref = ray.put(pd.Series(uni["n"].to_numpy().astype(np.int64),
                                index=uni["token"].to_numpy()))

    def bi_partial(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        toks = pc.utf8_split_whitespace(batch["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.to_pandas()[keep].to_numpy()
        d = doc_idx[keep]
        if len(d) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        same = d[1:] == d[:-1]
        df = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
        g = df.groupby(["w1", "w2"], as_index=False).size()
        return pa.table({
            "w1": pa.array(g["w1"].to_numpy(), pa.string()),
            "w2": pa.array(g["w2"].to_numpy(), pa.string()),
            "partial_n": pa.array(g["size"].to_numpy().astype(np.int64),
                                  pa.int64())})

    bi = (ds.map_batches(bi_partial, batch_format="pyarrow")
          .groupby(["w1", "w2"])
          .aggregate(Sum("partial_n", alias_name="c_xy")))

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        c_xy = batch["c_xy"].to_numpy()
        m = c_xy >= min_count
        if not m.any():
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_xy": pa.array([], pa.int64()),
                             "c_x": pa.array([], pa.int64()),
                             "c_y": pa.array([], pa.int64()),
                             "pmi_ratio_micros": pa.array([],
                                                          pa.int64())})
        w1 = batch["w1"].to_pandas().to_numpy()[m]
        w2 = batch["w2"].to_pandas().to_numpy()[m]
        c_xy = c_xy[m]
        c_x = lut[w1].to_numpy()
        c_y = lut[w2].to_numpy()
        score = ((c_xy * 1_000_000) // c_x) * n_tok // c_y
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "c_xy": pa.array(c_xy, pa.int64()),
            "c_x": pa.array(c_x, pa.int64()),
            "c_y": pa.array(c_y, pa.int64()),
            "pmi_ratio_micros": pa.array(score, pa.int64()),
        })

    return bi.map_batches(score, batch_format="pyarrow")


def length_outliers(ds):
    """Tukey-fence length-outlier flagging — the distribution-aware
    companion to the fixed-threshold ``quality_filter``: a document is
    an outlier when its token count falls outside
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] over the WHOLE corpus (Q1/Q3 exact
    ``quantile_disc`` quantiles, the value_quantiles contract).

    Fences stay integer-exact by comparing in half-units
    (``2*n < 2*Q1 - 3*IQR``) instead of multiplying by 1.5.  Exact
    global quantiles of a discrete column do NOT need the values in
    one place: token counts have ~O(longest doc) distinct values, so
    the plan is a per-value count histogram (map-side Count partials),
    a driver-side cumulative scan over that tiny table, then ONE
    stateless flagging pass — no sort, no big shuffle."""
    from ray.data.aggregate import Count

    def narrow(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b["text"], TOKEN_RE),
                    pa.int64())
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "n_tokens": n})

    narrow_ds = ds.map_batches(narrow,
                               batch_format="pyarrow").materialize()
    hist = (narrow_ds.groupby("n_tokens")
            .aggregate(Count(alias_name="n"))
            .to_pandas().sort_values("n_tokens"))
    vals = hist["n_tokens"].to_numpy()
    cum = np.cumsum(hist["n"].to_numpy())
    n_total = int(cum[-1]) if len(cum) else 0

    def qdisc(q: float) -> int:
        # element at index ceil(q*n)-1 of the sorted column
        target = max(int(np.ceil(q * n_total)), 1)
        return int(vals[np.searchsorted(cum, target, side="left")])

    q1, q3 = qdisc(0.25), qdisc(0.75)
    iqr = q3 - q1
    lo2, hi2 = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr

    def flag(b: pa.Table) -> pa.Table:
        n2 = 2 * b["n_tokens"].to_numpy()
        return b.append_column(
            "is_outlier", pa.array((n2 < lo2) | (n2 > hi2), pa.bool_()))

    return narrow_ds.map_batches(flag, batch_format="pyarrow")
