"""Mirror materialization: turn the engine's per-round fetched parquet
into the reference's on-disk mirror tree
(MIRROR_ROOT/<host>/<cleaned-path>, workflow.go:173-183) — dirs 0755,
files 0644, last write wins.

The parquet partitions are the durable, resumable representation; the
tree export is a terminal sink for users who want byte-identical static
mirrors.
"""

from __future__ import annotations

import os

from .crawl import CrawlResult


def export_mirror_tree(result: CrawlResult, mirror_root: str) -> int:
    """Write every mirrored body to ``mirror_root``; returns file count.
    Reproduces the permission bits of workflow.go:175,183."""
    t = result.mirror_table()
    n = 0
    for path, body in zip(t["mirror_path"].to_pylist(),
                          t["body"].to_pylist()):
        full = os.path.join(mirror_root, path)
        d = os.path.dirname(full)
        os.makedirs(d, mode=0o755, exist_ok=True)
        with open(full, "w", encoding="utf-8") as f:
            f.write(body or "")
        os.chmod(full, 0o644)
        n += 1
    return n


def engine_health(engine) -> str:
    """Worst-status-wins health aggregation
    (healthcheck/healthcheck.go:143-150): checks seen shards and the
    fetch pool; returns "ok" / "critical"."""
    try:
        statuses = engine.seen.health()
        if any(s != "ok" for s in statuses):
            return "critical"
        if engine.pool is not None:
            import ray

            ray.get([w.ping.remote() for w in engine.pool.workers],
                    timeout=10)
        return "ok"
    except Exception:
        return "critical"
