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
    # interval) — the same compare convention as stratified_sample and
    # the SQL CASE chain
    names, bounds, acc = [], [], 0.0
    for name, frac in splits[:-1]:
        acc += frac
        names.append(name)
        bounds.append(_hex_threshold(acc))
    last = splits[-1][0]

    def assign(batch: pa.Table) -> pa.Table:
        out = []
        for d in batch["doc_id"].to_pylist():
            h = hashlib.md5(str(d).encode()).hexdigest()[:8]
            for name, hi in zip(names, bounds):
                if h < hi:
                    out.append(name)
                    break
            else:
                out.append(last)
        return pa.table({
            "doc_id": batch["doc_id"],
            "split": pa.array(out, pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")
