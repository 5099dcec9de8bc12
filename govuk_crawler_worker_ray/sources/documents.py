"""Interleaved-document table IO.

The north rule mandates Lance-backed interleaved documents; this
container ships no ``lance``/``pylance`` wheel, so the Lance path is
import-gated and the parquet path (bit-identical schema) is the working
fallback.  Callers never branch: ``read_documents``/``write_documents``
pick the best available format.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - lance absent in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, columns: list[str] | None = None):
    """-> ray.data.Dataset of DOCUMENTS_SCHEMA rows.  ``path`` may be a
    ``.lance`` dataset dir or a parquet file/dir."""
    import ray.data as rd

    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns)
    size = (os.path.getsize(path) if os.path.isfile(path)
            else sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(path) for f in fs))
    blocks = max(1, min(64, size // (32 << 20)))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=int(blocks))


def write_documents(ds, path: str) -> str:
    """Write a documents Dataset; Lance when available, else parquet
    directory.  Returns the path actually written."""
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path)
        return path
    if path.endswith(".lance"):
        path = path[:-6] + ".parquet"
    ds.write_parquet(path)
    return path
