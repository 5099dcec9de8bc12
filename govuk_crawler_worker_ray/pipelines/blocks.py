"""Block-level hygiene shared by the join-heavy pipelines.

Ray Data's groupby/aggregate (and repartition) emit their key-less
hash partitions as ZERO-SCHEMA empty blocks.  When such a dataset
feeds a hash join and at least one block is nonempty, the join
aggregator's per-partition concat can pick up the schema-less block
and pyarrow raises ``ArrowInvalid: No match or multiple matches for
key field reference FieldRef.Name(...)``.  This only bites when a
join side is SMALLER than its partition count — tiny dup graphs,
seed frontiers, sparse hot-bucket sets — which is exactly the regime
small-input correctness tests and degenerate corpora hit.

``nonempty_blocks`` materializes the dataset and drops empty blocks
by METADATA ONLY (refs never move, nothing reaches the driver), which
both normalizes the schema and cuts lineage — the guarded sites all
wanted a materialize anyway (iterative joins) or are tiny by
construction (hot-bucket / dup-gram sides).
"""

from __future__ import annotations


def default_partitions() -> int:
    """~2x-CPU hash-partition count for key-local map_groups stages —
    the shared heuristic (enough partitions that one straggler key
    set doesn't serialize a round, few enough that per-partition
    fixed cost stays amortized); fallback 8 off-cluster."""
    try:
        import ray

        return 2 * int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 8


# the metadata-only fast path rides two Ray private APIs
# (iter_internal_ref_bundles / from_arrow_refs, present 2.40-2.49);
# if a Ray upgrade removes either, every guarded join site falls back
# through the public path below instead of breaking at once
_SMALL_NORMALIZE_ROWS = 1_000_000


def nonempty_blocks(ds):
    """Materialize ``ds`` and drop empty blocks (metadata-only filter).
    Returns None when every block is empty — callers treat that as an
    empty relation and short-circuit the join."""
    import ray.data as rd

    mat = ds.materialize()
    try:
        bundles = mat.iter_internal_ref_bundles()
        keep = [ref for bd in bundles for ref, meta in bd.blocks
                if meta.num_rows]
        if not keep:
            return None
        return rd.from_arrow_refs(keep)
    except (AttributeError, ImportError, TypeError):
        # public-API fallback: count() decides the None short-circuit;
        # small relations (the only regime where zero-schema empty
        # blocks actually poison a join — a side smaller than its
        # partition count) are normalized through one driver-side
        # Arrow round-trip; large relations pass through unchanged
        n = mat.count()
        if n == 0:
            return None
        if n <= _SMALL_NORMALIZE_ROWS:
            import pyarrow as pa

            tables = [b for b in
                      mat.iter_batches(batch_format="pyarrow")
                      if b.num_rows]
            return rd.from_arrow(pa.concat_tables(tables))
        return mat


# Ceiling for groupby outputs the driver pulls as in-memory histograms
# (global_rank's per-n_tokens counts, winsorize's distinct-value
# histogram): ~10M (key, count) rows = a few hundred MB of pandas.
# Legitimate uses are orders of magnitude below it — hitting the bound
# means the key domain isn't histogram-compressible and the operator
# needs its documented sketch/mergeable swap instead.
DRIVER_HISTOGRAM_MAX = 10_000_000


def driver_histogram(agg_ds, what: str, bound: int = DRIVER_HISTOGRAM_MAX):
    """Materialize a groupby-aggregate output that an operator is about
    to pull to the DRIVER as a small histogram, failing loudly (instead
    of OOMing the driver) when the distinct-key count exceeds
    ``bound``.  Returns the pandas frame."""
    mat = agg_ds.materialize()
    n = mat.count()
    if n > bound:
        raise ValueError(
            f"{what}: driver-side histogram has {n:,} distinct keys "
            f"(> {bound:,}) — the key domain is not "
            "histogram-compressible at this scale; use the operator's "
            "documented sketch-based variant instead")
    return mat.to_pandas()
