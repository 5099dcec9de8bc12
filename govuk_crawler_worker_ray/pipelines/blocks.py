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


def nonempty_blocks(ds):
    """Materialize ``ds`` and drop empty blocks (metadata-only filter).
    Returns None when every block is empty — callers treat that as an
    empty relation and short-circuit the join."""
    import ray.data as rd

    bundles = ds.materialize().iter_internal_ref_bundles()
    keep = [ref for bd in bundles for ref, meta in bd.blocks
            if meta.num_rows]
    if not keep:
        return None
    return rd.from_arrow_refs(keep)
