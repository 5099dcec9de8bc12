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


# the metadata-only fast path rides one Ray private API
# (iter_internal_ref_bundles, present 2.40-2.49); if a Ray upgrade
# removes it, every guarded join site falls back through the
# to_arrow_refs path below.  NOTE the fallback is best-effort, not
# API-free: to_arrow_refs and from_arrow_refs are DeveloperAPIs (and
# to_arrow_refs delegates to the same bundle internals in 2.49), so a
# Ray that drops ALL of them fails loudly here — which is preferable
# to the pre-round-5 pass-through that silently leaked zero-schema
# empty blocks into join sides
_block_rows_task = None


def _block_rows_remote():
    """Lazily-built zero-CPU Ray task that reads one block's row count
    block-local (locality-scheduled, zero-copy deserialize) — the
    public-API twin of the bundle metadata read."""
    global _block_rows_task
    if _block_rows_task is None:
        import ray

        _block_rows_task = ray.remote(num_cpus=0)(
            lambda t: t.num_rows)
    return _block_rows_task


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
    except (AttributeError, ImportError, TypeError):
        # public-API fallback: ``to_arrow_refs`` exposes the same block
        # refs without moving data; row counts are read by tiny
        # locality-scheduled tasks, so relations of ANY size are
        # normalized — no driver round-trip, and no pass-through that
        # could leak a zero-schema empty block into a join side
        import ray

        refs = mat.to_arrow_refs()
        task = _block_rows_remote()
        nrows = ray.get([task.remote(r) for r in refs])
        keep = [r for r, n in zip(refs, nrows) if n]
    if not keep:
        return None
    return rd.from_arrow_refs(keep)


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
