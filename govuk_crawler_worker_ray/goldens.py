"""Scalar golden producers for the non-SQL-expressible deterministic
per-row operators (simhash, fingerprint).

These are INDEPENDENT re-implementations of the operators' contracts in
pure Python int arithmetic (no numpy, no shared kernel code with the
engine's vectorized batch functions in ``pipelines/dedup.py`` /
``pipelines/text_analysis.py``).  ``__ray_entry__.oracle_sql`` persists
their output as parquet and hands DuckDB a ``read_parquet`` of it, so
the driver's rows+schema+hash comparison verifies the vectorized path
against this scalar path — the same two-implementations pattern the
crawl goldens use (reference_oracle.py vs the engine).

Simhash: Charikar (STOC 2002) 64-bit, whitespace tokens, per-token
64-bit blake2b, majority vote per bit with ties -> 0.
Fingerprint: degree-n polynomial rolling hash over utf-8 bytes in
uint64 wraparound arithmetic (Horner form), xor-folded with an offset.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

_MASK64 = (1 << 64) - 1
_FP_MUL = 1099511628211
_FP_OFF = 14695981039346656037


def simhash_scalar(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for w in toks:
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
            "big")
        for i in range(64):
            if (h >> i) & 1:
                votes[i] += 1
            else:
                votes[i] -= 1
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig


def fingerprint_scalar(text: str) -> int:
    data = text.encode("utf-8")
    if not data:
        return 0
    h = 0
    for byte in data:
        h = (h * _FP_MUL + byte) & _MASK64  # Horner == powers-sum mod 2^64
    return h ^ _FP_OFF


def write_scalar_goldens(documents_path: str, out_dir: str) -> dict:
    """Compute both goldens over a documents parquet; idempotent via a
    source-mtime marker.  Returns {query_name: golden_parquet_path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {"simhash": os.path.join(out_dir, "golden_simhash.parquet"),
             "fingerprint": os.path.join(out_dir,
                                         "golden_fingerprint.parquet")}
    marker = os.path.join(out_dir, "golden_src_mtime")
    mtime = str(os.path.getmtime(documents_path))
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == mtime and all(os.path.exists(p)
                                         for p in paths.values()):
                return paths
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([f"{simhash_scalar(x):016x}" for x in texts],
                            pa.string()),
    }), paths["simhash"])
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array(
            [f"{fingerprint_scalar(x):016x}" for x in texts], pa.string()),
    }), paths["fingerprint"])
    with open(marker, "w") as f:
        f.write(mtime)
    return paths
