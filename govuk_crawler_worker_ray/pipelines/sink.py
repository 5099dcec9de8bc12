"""Resumable partitioned parquet sink.

The output contract a 100-TB run needs (and the reference's
WriteItemToDisk only provides per-item, workflow.go:153-216): the
corpus lands as ONE directory per deterministic key bucket, each
bucket written atomically (tmp + ``os.replace``), so a failed run
re-executed with ``resume=True`` skips every finished bucket and
rewrites only the missing ones.  No giant single file, no partial
files visible to readers.

Bucketing is the first ``hex_chars`` of ``md5(key)`` — stable across
runs, processes and machines (no PYTHONHASHSEED, no Arrow hash
version), and the same expression is one ``substr(md5(...))`` in SQL,
so the layout is oracle-checkable.  ``hex_chars=1`` -> 16 buckets
(test scale); at 100 TB use 3-4 hex chars (4096-65536 buckets) so a
bucket ~ a few GB — the resume granularity AND the map_groups task
size.  Each bucket is collected by exactly one task; only that
bucket's rows move to it (one hash exchange).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def write_partitioned(ds, dest_dir: str, key: str = "doc_id",
                      hex_chars: int = 1, resume: bool = True):
    """Write ``ds`` to ``dest_dir/bucket=<h>/part-0.parquet``, one
    atomically-committed file per md5-prefix bucket of ``key``.
    Returns a Dataset of per-bucket receipts (bucket, n_rows,
    skipped) — ``skipped=True`` means the bucket already existed and
    ``resume`` left it untouched.  Rows carry their ``bucket`` column
    in-file too, so a plain ``read_parquet(dest_dir)`` needs no hive
    inference."""
    os.makedirs(dest_dir, exist_ok=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ks = batch[key].to_pylist()
        bs = [hashlib.md5(str(k).encode()).hexdigest()[:hex_chars]
              for k in ks]
        return batch.append_column("bucket", pa.array(bs, pa.string()))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        b = g["bucket"].iloc[0]
        bdir = os.path.join(dest_dir, f"bucket={b}")
        final = os.path.join(bdir, "part-0.parquet")
        if resume and os.path.exists(final):
            return pd.DataFrame({"bucket": [b],
                                 "n_rows": np.array([len(g)], np.int64),
                                 "skipped": [True]})
        os.makedirs(bdir, exist_ok=True)
        # deterministic in-file order -> byte-identical reruns
        g = g.sort_values(key).reset_index(drop=True)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       tmp)
        os.replace(tmp, final)
        return pd.DataFrame({"bucket": [b],
                             "n_rows": np.array([len(g)], np.int64),
                             "skipped": [False]})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(write_group, batch_format="pandas"))


def read_partitioned(dest_dir: str, **kwargs):
    """Read a ``write_partitioned`` layout back as a Dataset (the
    bucket column is stored in-file)."""
    import ray.data as rd

    return rd.read_parquet(dest_dir, **kwargs)


def compact_files(src_path: str, dest_dir: str,
                  rows_per_file: int = 1 << 18,
                  columns: list[str] | None = None):
    """Small-file compaction: re-lay a parquet source out as files of
    ~``rows_per_file`` rows each — the table-maintenance pass every
    long-lived lake needs (a crawl's per-round parts and a sink's
    per-bucket files accumulate into thousands of KB-scale files whose
    open/footer cost eventually dominates readers).

    Ray-native: one streaming ``read_parquet`` -> ``repartition`` (no
    shuffle — contiguous block coalescing) -> ``write_parquet``; rows
    are never decoded beyond Arrow, nothing reaches the driver.
    Lossless by contract: returns the read-back Dataset so callers
    (and the oracle, which reads the ORIGINAL table) can verify
    content equality row-for-row."""
    import shutil

    import ray.data as rd

    # refuse in-place compaction: dest is wiped BEFORE the first read,
    # so any overlap with the source would destroy the table
    src_real = os.path.realpath(src_path)
    dst_real = os.path.realpath(dest_dir)
    if (src_real == dst_real
            or src_real.startswith(dst_real + os.sep)
            or dst_real.startswith(src_real + os.sep)):
        raise ValueError(
            "compact_files: dest_dir overlaps src_path "
            f"({dest_dir!r} vs {src_path!r}); compact to a fresh "
            "directory and swap afterwards")
    shutil.rmtree(dest_dir, ignore_errors=True)
    os.makedirs(dest_dir, exist_ok=True)
    src = rd.read_parquet(src_path, columns=columns)
    n = src.count()
    files = max(1, -(-n // rows_per_file))
    src.repartition(files).write_parquet(dest_dir)
    return rd.read_parquet(dest_dir)


def recover_fetched_dir(fdir: str) -> None:
    """Self-heal ``_compact_part_dir``'s rename swap after a crash.
    Safe (and cheap — two isdir probes) to call before ANY reader
    enumerates a round's parts; also the compaction preamble."""
    import shutil

    old = fdir + ".old"
    if os.path.isdir(old):
        if not os.path.isdir(fdir):
            # crash between the two renames: .old holds the intact
            # PRE-compaction original parts (the compacted copy lived
            # under .compact and is discarded) — restore the live name;
            # the directory is simply re-compacted on the next pass
            os.rename(old, fdir)
        else:
            # crash after the live rename but before cleanup: the live
            # dir is authoritative, the stale .old must not block the
            # rename below on a re-run
            shutil.rmtree(old)


def restore_crashed_rounds(out_dir: str) -> None:
    """Restore any ``round=k/fetched.old``-only directories left by a
    compaction crash BEFORE a reader (resume order assembly,
    mirror_table/mirror_dataset) enumerates rounds — otherwise a
    reader that skips missing ``fetched`` dirs would silently drop
    that round's rows until the next compaction pass self-heals."""
    try:
        names = os.listdir(out_dir)
    except FileNotFoundError:
        return
    for d in names:
        if d.startswith("round="):
            recover_fetched_dir(os.path.join(out_dir, d, "fetched"))


def _compact_part_dir(fdir: str, rows_per_file: int) -> int:
    """Coalesce one directory's parquet parts into ~rows_per_file
    files, PRESERVING row order across parts in sorted-name order (the
    order that defines the mirror's last-write-wins and the crawl
    order read-back).  Streams part-by-part — peak memory is one
    output file's rows.  Swap is rename-based: a crash can leave the
    data in ``<fdir>.old`` but never half-compacted under the live
    name.  Returns the file count after compaction."""
    import shutil

    recover_fetched_dir(fdir)
    old = fdir + ".old"
    files = sorted(f for f in os.listdir(fdir) if f.endswith(".parquet"))
    if len(files) <= 1:
        return len(files)
    tmp = fdir + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    buf: list[pa.Table] = []
    nbuf = 0
    out_i = 0

    def flush():
        nonlocal buf, nbuf, out_i
        if not buf:
            return
        pq.write_table(pa.concat_tables(buf),
                       os.path.join(tmp, f"part-{out_i:05d}.parquet"))
        out_i += 1
        buf, nbuf = [], 0

    for f in files:
        t = pq.read_table(os.path.join(fdir, f), use_threads=False)
        buf.append(t)
        nbuf += t.num_rows
        if nbuf >= rows_per_file:
            flush()
    flush()
    os.rename(fdir, old)
    os.rename(tmp, fdir)
    shutil.rmtree(old)
    return out_i


def compact_crawl_rounds(out_dir: str, rows_per_file: int = 1 << 18,
                         use_ray: bool = True) -> dict[int, int]:
    """Table maintenance for a finished (or checkpointed) crawl: each
    ``round=k/fetched`` directory's per-chunk parts — one per fetch
    chunk per shard, thousands over a long crawl — are coalesced into
    ~``rows_per_file``-row files, order-preserving per round (see
    ``_compact_part_dir``; the mirror's last-write-wins and the crawl
    order both read files in (round, name) order, which compaction
    keeps).  Rounds compact in parallel as Ray tasks when ``use_ray``.
    Opt-in from the engine via ``CrawlConfig.compact_fetched_rows``.
    Returns {round: n_files_after}."""
    rounds = []
    for d in os.listdir(out_dir):
        fdir = os.path.join(out_dir, d, "fetched")
        # a crash between _compact_part_dir's two renames leaves the
        # round's data under fetched.old only — still enumerated, the
        # worker restores it before compacting
        if d.startswith("round=") and (os.path.isdir(fdir)
                                       or os.path.isdir(fdir + ".old")):
            rounds.append((int(d.split("=")[1]), fdir))
    if not rounds:
        return {}
    if use_ray:
        import ray

        task = ray.remote(num_cpus=0.5)(_compact_part_dir)
        outs = ray.get([task.remote(fdir, rows_per_file)
                        for _, fdir in rounds])
    else:
        outs = [_compact_part_dir(fdir, rows_per_file)
                for _, fdir in rounds]
    return {k: n for (k, _), n in zip(rounds, outs)}
