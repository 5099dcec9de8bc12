"""Product-level curation recipes: the multi-stage pipelines a user of
this engine actually runs, composed from the first-class operators as
ONE lazy Dataset chain (streaming end-to-end, no driver detours).

``c4_curation`` is the canonical C4/CCNet-style text recipe (Raffel et
al. 2020; Wenzek et al. 2020): PII scrub -> quality gate -> exact
dedup (keep-first) -> deterministic split assignment.  Every stage
reuses the exact kernel its standalone operator uses (imported, not
re-typed), so the whole composite still hash-matches one composed SQL
twin.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def c4_curation(ds, min_quality: int = 6,
                num_partitions: int | None = None):
    """documents (doc_id, text, lang) -> curated examples
    (doc_id, lang, quality_points, split).

    Plan shape: one fused map pass does scrub + quality + gate + the
    dedup key (text is DROPPED there — only the 32-hex key and three
    narrow columns reach the exchange); ONE groupby(content hash)
    keeps the min-doc_id winner per distinct scrubbed text; the split
    tag is a stateless per-row map.  Stages share the standalone
    operators' kernels and cut points (imported), so drift between the
    recipe and its parts is impossible."""
    from .blocks import default_partitions
    from .sampling import assign_split
    from .text_analysis import pii_scrub_batch, quality_score_batch

    P = default_partitions() if num_partitions is None \
        else num_partitions

    def scrub_gate_key(b: pa.Table) -> pa.Table:
        s = pii_scrub_batch(b)
        q = quality_score_batch(pa.table({
            "doc_id": b["doc_id"], "text": s["scrubbed_text"]}))
        t = pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "quality_points": q["quality_points"],
            "scrubbed_text": s["scrubbed_text"],
        }).filter(pc.greater_equal(q["quality_points"],
                                   pa.scalar(min_quality, pa.int64())))
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in t["scrubbed_text"].to_pylist()]
        part = np.fromiter((int(x[:8], 16) % P for x in h),
                           dtype=np.int64, count=len(h))
        return (t.drop_columns(["scrubbed_text"])
                .append_column("h", pa.array(h, pa.string()))
                .append_column("part", pa.array(part, pa.int64())))

    # keys hash to ~2x-CPU partitions; ONE vectorized keep-first per
    # partition, not one dispatch per distinct text (the
    # distinctive_terms per-group-dispatch lesson)
    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return g.groupby("h", sort=False).head(1)[
            ["doc_id", "lang", "quality_points"]]

    def tag_split(b: pa.Table) -> pa.Table:
        # cut points come from sampling.assign_split — the recipe and
        # the standalone dataset_split cannot drift
        return b.append_column(
            "split", pa.array(assign_split(b["doc_id"].to_pylist()),
                              pa.string()))

    return (ds.map_batches(scrub_gate_key, batch_format="pyarrow")
            .groupby("part")
            .map_groups(keep_first, batch_format="pandas")
            .map_batches(tag_split, batch_format="pyarrow"))
