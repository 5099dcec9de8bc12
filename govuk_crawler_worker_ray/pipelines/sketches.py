"""Mergeable sketch operators.

KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002:
keep the k smallest values of a uniform hash of the key; the k-th
smallest value's position in [0, 1) estimates the distinct count as
(k-1)/frac.  The sketch is MERGEABLE (union the candidate sets, re-take
the k smallest), which is exactly what a distributed pre-aggregation
needs: each batch ships at most k rows per group regardless of batch
size, so the shuffle volume is O(groups x k x batches) instead of
O(distinct keys) — the point of a sketch at 10^10 keys where
``distinct_users_daily``'s exact pair shuffle would dominate.

Determinism contract (what lets DuckDB oracle an *approximate*
operator): the hash is md5 of the key's string form, the fraction is
the first 14 hex digits (56 bits) read as an integer, and the estimate
is the floor-division ``(k-1) * 16^14 // v`` — pure integer arithmetic
with no float rounding, so engine and SQL agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

KMV_HEX_DIGITS = 14            # 56 bits: (k-1) * 16^14 fits in int64
KMV_SCALE = 1 << (4 * KMV_HEX_DIGITS)


def kmv_distinct(ds, key_col: str = "user_id",
                 group_col: str = "event_type", k: int = 64):
    """Approximate COUNT(DISTINCT key) per group via a KMV sketch:
    (group, est_distinct).  Exact when a group has fewer than k
    distinct keys (the candidate union then IS the distinct set).

    Shape: per-batch partial sketch (<= k rows per group leave each
    batch) -> ONE groupby(group) merge.  Groups are few, candidate sets
    are <= k x batches rows — the merge groups stay tiny even when the
    key cardinality is 10^10."""
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[group_col].to_pylist(),
            "key": batch[key_col].to_pylist(),
        }).drop_duplicates()
        df["hv"] = [hashlib.md5(str(x).encode()).hexdigest()
                    for x in df["key"]]
        df = (df.sort_values(["g", "hv"])
              .groupby("g", as_index=False).head(k))
        return pa.table({group_col: pa.array(df["g"], pa.string()),
                         "hv": pa.array(df["hv"], pa.string())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(g["hv"].to_numpy())  # sorted distinct candidates
        n = len(hv)
        if n >= k:
            v = max(int(hv[k - 1][:KMV_HEX_DIGITS], 16), 1)
            est = (k - 1) * KMV_SCALE // v
        else:
            est = n
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "est_distinct": [est]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(merge, batch_format="pandas"))


def kmv_oracle_sql(key_col: str = "user_id",
                   group_col: str = "event_type", k: int = 64,
                   table: str = "events") -> str:
    """The ANSI-SQL twin of kmv_distinct — same hash, same integer
    estimate, so the driver's value-hash compare is exact."""
    return (
        f"WITH h AS (SELECT DISTINCT {group_col}, "
        f"md5(CAST({key_col} AS VARCHAR)) AS hv FROM {table}), "
        f"r AS (SELECT {group_col}, hv, row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY hv) AS rn, "
        f"count(*) OVER (PARTITION BY {group_col}) AS n FROM h) "
        f"SELECT {group_col}, CAST(CASE WHEN n >= {k} THEN "
        f"{(k - 1) * KMV_SCALE} // GREATEST(('0x' || "
        f"substr(hv, 1, {KMV_HEX_DIGITS}))::BIGINT, 1) "
        f"ELSE n END AS BIGINT) AS est_distinct FROM r "
        f"WHERE rn = CASE WHEN n >= {k} THEN {k} ELSE 1 END")
