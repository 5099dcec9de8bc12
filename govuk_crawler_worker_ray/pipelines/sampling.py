"""Deterministic sampling operators for training-data curation.

Sampling at 100 TB must be (a) reproducible across reruns and resumes
(a seeded RNG keyed by partition index breaks the moment blocks split
differently), and (b) expressible as a pure per-row predicate so it
composes with column pruning and predicate pushdown.  Both operators
therefore key on a cryptographic hash of the ROW KEY, not on an RNG
stream: ``md5(key)`` read as a fixed-point fraction in [0, 1) compared
against the stratum's rate.  The same predicate is one line of ANSI
SQL (lexicographic compare on the fixed-width lowercase hex digest),
which is what the DuckDB oracles run.

At real scale md5-per-row in Python is the honest cost of oracle
parity at test scale; the production swap is a vectorized 64-bit hash
(e.g. xxhash via pyarrow) behind the same [0,1) fraction contract.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

# power-of-two default rates so the hex thresholds are exact and tidy
DEFAULT_RATES = {"en": 1 / 8, "de": 1 / 4, "es": 1 / 4, "fr": 1 / 4,
                 "zh": 1 / 2}
DEFAULT_RATE = 1 / 2


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] -> 8-hex-digit threshold: keep iff the first 32
    bits of md5(key), read big-endian, are < rate * 2^32.  Comparing
    the 8-char lowercase hex prefix lexicographically is identical to
    the numeric compare (fixed width, ordered alphabet)."""
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def stratified_sample(ds, rates: dict[str, float] | None = None,
                      default_rate: float = DEFAULT_RATE):
    """Per-stratum deterministic sample of documents: keep each row
    with probability ``rates[lang]`` (``default_rate`` for unlisted
    strata), keyed on md5(doc_id) so the same rows survive any
    re-partitioning, resume, or rerun.  Output: (doc_id, lang).

    Pure per-row predicate -> plain ``map_batches`` filter, no shuffle,
    no state, no driver participation; the sampled stream stays lazy.
    """
    rates = DEFAULT_RATES if rates is None else rates
    thr = {lang: _hex_threshold(r) for lang, r in rates.items()}
    dthr = _hex_threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        mask = pa.array(
            [hashlib.md5(str(d).encode()).hexdigest()[:8]
             < thr.get(lang, dthr)
             for d, lang in zip(ids, langs)], pa.bool_())
        return batch.filter(mask).select(["doc_id", "lang"])

    return ds.map_batches(keep, batch_format="pyarrow")


# power-of-two split fractions so the hex boundaries are exact
DEFAULT_SPLITS = (("train", 7 / 8), ("val", 1 / 16), ("test", 1 / 16))


def split_bounds(splits=DEFAULT_SPLITS):
    """(names, hex upper bounds, residual name) of the cumulative
    split partition — the SINGLE source of the cut points; everything
    that assigns or oracles splits (dataset_split, the c4 recipe,
    their SQL twins) derives from this."""
    names, bounds, acc = [], [], 0.0
    for name, frac in splits[:-1]:
        acc += frac
        names.append(name)
        bounds.append(_hex_threshold(acc))
    return names, bounds, splits[-1][0]


def assign_split(doc_ids, splits=DEFAULT_SPLITS) -> list[str]:
    """Split name per id under the md5-prefix contract."""
    names, bounds, last = split_bounds(splits)
    out = []
    for d in doc_ids:
        h = hashlib.md5(str(d).encode()).hexdigest()[:8]
        for name, hi in zip(names, bounds):
            if h < hi:
                out.append(name)
                break
        else:
            out.append(last)
    return out


def dataset_split(ds, splits=DEFAULT_SPLITS):
    """Deterministic train/val/test assignment: every row lands in
    exactly one split by where md5(doc_id)'s leading 32 bits fall in
    the cumulative-fraction partition of [0, 1) — the assignment every
    training pipeline needs, stable across re-partitioning, resumes,
    reruns, and cluster size (same hash contract as
    ``stratified_sample``).  Output: (doc_id, split).

    Pure per-row map, no shuffle, no state; downstream consumers filter
    on the split column (or write partitioned by it)."""
    # strict `<` upper bounds for all but the last split (the residual
    # interval) — same compare convention as stratified_sample and the
    # SQL CASE chain; cut points come from the shared split_bounds
    def assign(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "split": pa.array(
                assign_split(batch["doc_id"].to_pylist(), splits),
                pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def _ranked_source_take(ds, cap_expr, num_partitions: int | None):
    """Shared md5-rank-within-source selection (the oracle-pinned hash
    contract of source_cap / domain_mix_sample / stratified_sample):
    hash-partition (doc_id, source, md5) by source — ONE narrow
    shuffle, text never moves — then one vectorized sort + cumcount
    per partition, keeping rank <= ``cap_expr(source_series)``.
    Output (doc_id, source, rank); per-source output is bounded by its
    cap."""
    import zlib

    import numpy as np
    import pandas as pd

    from .blocks import default_partitions

    P = default_partitions() if num_partitions is None \
        else num_partitions

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        h = [hashlib.md5(str(d).encode()).hexdigest() for d in ids]
        part = [zlib.crc32(s.encode("utf-8")) % P for s in srcs]
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "h": pa.array(h, pa.string()),
            "part": pa.array(part, pa.int64()),
        })

    def take_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "h", "doc_id"])
        g["rank"] = (g.groupby("source", sort=False).cumcount() + 1
                     ).astype(np.int64)
        g = g[g["rank"] <= cap_expr(g["source"]).astype(np.int64)]
        return g[["doc_id", "source", "rank"]]

    return (ds.select_columns(["doc_id", "source"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(take_part, batch_format="pandas"))


def source_cap(ds, cap: int = 10, num_partitions: int | None = None):
    """Per-source document cap (domain balancing): keep at most ``cap``
    documents per ``source``, chosen by deterministic hash rank — the
    "no domain may dominate the training mix" curation primitive
    (C4/RefinedWeb-style host capping).  Rank within a source is
    md5(doc_id) ascending (doc_id tiebreak), so the kept set is stable
    under any re-partitioning, resume, or cluster size — same hash
    contract as ``stratified_sample``.  Output (doc_id, source, rank).
    Plan shape and scale bounds: see ``_ranked_source_take``."""
    return _ranked_source_take(ds, lambda s: s.map(lambda _: cap),
                               num_partitions)


def domain_mix_sample(ds, budget_docs: int = 200,
                      num_partitions: int | None = None):
    """Materialize a sqrt-flattened domain blend: keep, per source,
    the ``quota_s = (isqrt(tokens_s) * budget_docs) // sum_s
    isqrt(tokens_s)`` documents with the lowest md5(doc_id) rank —
    ``domain_mix`` made actionable (the weights op computes the blend;
    this op samples it).  Output (doc_id, source, rank), the
    ``source_cap`` contract with a per-source quota instead of a
    constant cap.  All-integer quota arithmetic (isqrt + floor
    division) and hash-rank selection keep the kept set stable under
    re-partitioning, resume, and cluster size, and let the DuckDB
    twin reproduce it row-for-row.

    Plan shape: pass 1 is the shared domain_mix combiner
    (text_analysis.source_token_detail) and the quota dict broadcasts
    from the driver (registrable-domain cardinality, same bound as
    lang_mix); pass 2 is the shared md5-rank selection
    (_ranked_source_take) with a per-source quota instead of a
    constant cap.  Hot sources are bounded by their quota.  The input
    is read twice; that is the streaming-correct trade against
    materializing a scored 10^10-row dataset."""
    import math

    from .text_analysis import source_token_detail

    detail = source_token_detail(ds)
    sqrts: dict[str, int] = {}
    for b in detail.iter_batches(batch_format="pyarrow"):
        for s, t in zip(b["source"].to_pylist(),
                        b["n_tokens"].to_pylist()):
            sqrts[s] = sqrts.get(s, 0) + math.isqrt(int(t))
    tot_sqrt = max(sum(sqrts.values()), 1)
    quotas = {s: (sq * budget_docs) // tot_sqrt
              for s, sq in sqrts.items()}
    return _ranked_source_take(
        ds, lambda s: s.map(lambda k: quotas.get(k, 0)), num_partitions)


def priority_sample(ds, k: int = 25):
    """Deterministic weight-proportional priority sample (Duffield,
    Lund & Thorup, JACM 2007): each doc gets priority = w / u with
    weight w = n_chars + 1 and u a hash-uniform in (0, 1]; the k
    largest priorities form the sample.  Keyed on md5(doc_id) like
    ``stratified_sample``, so the sample is identical under any
    re-partitioning, resume, or cluster size — the reproducible
    "sample 1M docs weighted by length" primitive.

    Integer-exact contract so the DuckDB oracle hashes bit-for-bit:
    u is the top 43 bits of md5(doc_id) and priority is the int64
    (w << 43) // (1 + u)  (max ~2^50 for document-scale weights, no
    overflow).  Output (doc_id, priority), priority desc / doc_id asc.

    Plan shape: pure per-row scoring in ``map_batches`` + per-batch
    partial top-k + driver merge of k rows/batch — no Sort operator,
    no shuffle (the top_docs_by_length pattern)."""
    import numpy as np
    import pyarrow.compute as pc

    shift = np.int64(1 << 43)

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "priority": pa.array([], pa.int64())})
        # clamp so (w << 43) stays below 2^62 — same clamp in the SQL
        w = np.minimum(
            pc.cast(pc.utf8_length(b["text"]), pa.int64()).to_numpy() + 1,
            (1 << 19) - 1)
        u = np.array(
            [int(hashlib.md5(str(d).encode()).hexdigest()[:16], 16) >> 21
             for d in ids], dtype=np.int64)
        prio = (w * shift) // (1 + u)
        order = np.lexsort((ids, -prio))[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "priority": pa.array(prio[order], pa.int64())})

    parts = [b for b in (ds.map_batches(partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))
             if b.num_rows]
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "priority": pa.array([], pa.int64())})
    allp = pa.concat_tables(parts)
    ids = allp["doc_id"].to_numpy()
    prio = allp["priority"].to_numpy()
    order = np.lexsort((ids, -prio))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                     "priority": pa.array(prio[order], pa.int64())})
