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


HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 56                     # rho read from 56 post-bucket hash bits
HLL_RMAX = HLL_W + 1           # all-zero suffix
# alpha_64 = 0.7213 / (1 + 1.079/64) as the exact rational 70936/100000
HLL_ALPHA_NUM = 70936
HLL_ALPHA_DEN = 100000


def _hll_rho(hex56: str) -> int:
    """Position of the first 1-bit in the 56-bit value spelled by 14
    hex digits (1-based); 57 when all zero.  Pure string/integer math so
    the SQL twin (ltrim + digit CASE) reproduces it exactly."""
    t = hex56.lstrip("0")
    if not t:
        return HLL_RMAX
    z = len(hex56) - len(t)                  # leading zero hex digits
    d = int(t[0], 16)
    inbit = 0 if d >= 8 else (1 if d >= 4 else (2 if d >= 2 else 3))
    return 4 * z + inbit + 1


def hll_distinct(ds, key_col: str = "user_id",
                 group_col: str = "event_type"):
    """Approximate COUNT(DISTINCT key) per group via a HyperLogLog
    sketch (Flajolet et al. 2007) — the register-array counterpart of
    ``kmv_distinct``: md5(key) supplies 8 bits of bucket index (mod 64)
    and 56 bits whose first-1-bit position is the register value; a
    group's estimate is alpha_m * m^2 / sum_b 2^-rho_b.

    Shape: per-batch partial registers (<= 64 rows per group leave each
    batch regardless of batch size) -> ONE groupby(group) merge taking
    the per-bucket MAX and folding the estimate — shuffle volume is
    O(groups x 64 x batches) at any key cardinality, the whole point at
    10^10 keys.

    Determinism contract (the kmv_distinct precedent): rho and the
    denominator are pure integers (sum of 2^(57-rho) with empty buckets
    contributing 2^57), and the estimate is the floor division
    (70936 * 64^2 * 2^57) // (100000 * D) — alpha as an exact rational,
    no float anywhere, so DuckDB HUGEINT arithmetic agrees
    bit-for-bit.  RAW estimator only: the linear-counting small-range
    correction needs a float log, and the regime this sketch exists for
    (key cardinality >> 2.5m = 160) never takes it; below that range
    use the exact ``distinct_users_daily`` / KMV instead."""
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[group_col].to_pylist(),
            "key": batch[key_col].to_pylist(),
        }).drop_duplicates()
        hv = [hashlib.md5(str(x).encode()).hexdigest()
              for x in df["key"]]
        df["bucket"] = np.array([int(h[:2], 16) % HLL_M for h in hv],
                                dtype=np.int32)
        df["rho"] = np.array([_hll_rho(h[2:2 + 14]) for h in hv],
                             dtype=np.int32)
        g = df.groupby(["g", "bucket"], as_index=False)["rho"].max()
        return pa.table({group_col: pa.array(g["g"], pa.string()),
                         "bucket": pa.array(g["bucket"], pa.int32()),
                         "rho": pa.array(g["rho"], pa.int32())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = g.groupby("bucket")["rho"].max()
        top = 1 << HLL_RMAX
        d = int(sum(top >> int(r) for r in regs))        # present
        d += (HLL_M - len(regs)) * top                   # empty: 2^57
        est = (HLL_ALPHA_NUM * HLL_M * HLL_M * top) // (HLL_ALPHA_DEN
                                                        * d)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "est_distinct": [est]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(merge, batch_format="pandas"))


def hll_oracle_sql(key_col: str = "user_id",
                   group_col: str = "event_type",
                   table: str = "events") -> str:
    """ANSI-SQL twin of hll_distinct — same md5 bucket/rho extraction
    (ltrim leading-zero count + first-digit CASE), same HUGEINT
    denominator and floor-divided estimate."""
    top = f"(CAST(1 AS HUGEINT) << {HLL_RMAX})"
    num = (f"(CAST({HLL_ALPHA_NUM} AS HUGEINT) * {HLL_M * HLL_M} "
           f"* {top})")
    return (
        f"WITH h AS (SELECT DISTINCT {group_col} AS g, "
        f"md5(CAST({key_col} AS VARCHAR)) AS hv FROM {table}), "
        f"d AS (SELECT g, ('0x' || substr(hv, 1, 2))::INTEGER "
        f"% {HLL_M} AS bucket, substr(hv, 3, 14) AS s FROM h), "
        f"r AS (SELECT g, bucket, CASE WHEN ltrim(s, '0') = '' "
        f"THEN {HLL_RMAX} ELSE 4 * (14 - length(ltrim(s, '0'))) "
        f"+ CASE WHEN ('0x' || substr(ltrim(s, '0'), 1, 1))::INTEGER "
        f">= 8 THEN 0 WHEN ('0x' || substr(ltrim(s, '0'), 1, "
        f"1))::INTEGER >= 4 THEN 1 WHEN ('0x' || substr(ltrim(s, "
        f"'0'), 1, 1))::INTEGER >= 2 THEN 2 ELSE 3 END + 1 END "
        f"AS rho FROM d), "
        f"regs AS (SELECT g, bucket, MAX(rho) AS rho FROM r "
        f"GROUP BY g, bucket), "
        f"den AS (SELECT g, SUM({top} >> rho) "
        f"+ ({HLL_M} - COUNT(*)) * {top} AS dd FROM regs GROUP BY g) "
        f"SELECT g AS {group_col}, CAST({num} // "
        f"({HLL_ALPHA_DEN} * dd) AS BIGINT) AS est_distinct FROM den")


CMS_D = 4                      # hash rows (salts "0".."3")
CMS_W = 512                    # buckets per row
CMS_SALTS = tuple(str(i) for i in range(CMS_D))


def _cms_bucket(salt: str, token: str) -> int:
    return int(hashlib.md5((salt + token).encode()
                           ).hexdigest()[:4], 16) % CMS_W


def cms_heavy_hitters(ds, pct: int = 1, text_col: str = "text"):
    """Count-min-sketch frequent tokens (Cormode & Muthukrishnan
    2005): every token whose CMS-ESTIMATED count exceeds ``pct``
    percent of all tokens, with that estimate — a guaranteed SUPERSET
    of the exact ``heavy_hitters`` output (CMS error is one-sided:
    est >= true always), which is the property a curation pipeline
    needs when the sketch gates an expensive exact second pass.

    Same whitespace tokenization as heavy_hitters
    (``pc.utf8_split_whitespace`` == regexp ``\\S+``).

    Shape: pass 1 builds the sketch — per-batch (salt, bucket) partial
    counts (<= d*w = 2048 rows per batch at ANY vocabulary size) ->
    one tiny groupby sum -> the 2048-cell table broadcast via
    ``ray.put``; the corpus token total is exactly the sum of one salt
    row.  Pass 2 re-scans, estimates each batch's distinct tokens
    against the broadcast cells (min over salts), and a final
    vocabulary groupby collapses cross-batch repeats (the estimate is
    global, so MIN==MAX==the value).  Nothing driver-side scales with
    the vocabulary.

    Determinism contract: buckets from md5 hex (the kmv precedent),
    counts and the 100*est > pct*total gate all integers, so the
    DuckDB twin hashes bit-for-bit."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min

    def cells_partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            batch[text_col].combine_chunks())
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        s = pd.Series(flat.to_pandas()[keep].to_numpy())
        vc = s.value_counts()
        toks_u = vc.index.to_numpy()
        cnts = vc.to_numpy().astype(np.int64)
        out_s, out_b, out_c = [], [], []
        for salt in CMS_SALTS:
            bucket = np.array([_cms_bucket(salt, t) for t in toks_u],
                              dtype=np.int32)
            agg = pd.DataFrame({"b": bucket, "c": cnts}).groupby(
                "b", as_index=False)["c"].sum()
            out_s.extend([salt] * len(agg))
            out_b.extend(agg["b"].tolist())
            out_c.extend(agg["c"].tolist())
        return pa.table({"salt": pa.array(out_s, pa.string()),
                         "bucket": pa.array(out_b, pa.int32()),
                         "c": pa.array(out_c, pa.int64())})

    from ray.data.aggregate import Sum

    cells_tbl = pa.concat_tables(
        b for b in (ds.map_batches(cells_partial, batch_format="pyarrow")
                    .groupby(["salt", "bucket"])
                    .aggregate(Sum("c", alias_name="n"))
                    .iter_batches(batch_format="pyarrow")))
    sketch = {}
    for salt, bucket, n in zip(cells_tbl["salt"].to_pylist(),
                               cells_tbl["bucket"].to_pylist(),
                               cells_tbl["n"].to_pylist()):
        sketch[(salt, bucket)] = n
    total = sum(v for (s, _), v in sketch.items() if s == CMS_SALTS[0])
    ref = ray.put(sketch)

    def estimate(batch: pa.Table) -> pa.Table:
        sk = ray.get(ref)
        toks = pc.utf8_split_whitespace(
            batch[text_col].combine_chunks())
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        uniq = np.unique(flat.to_pandas()[keep].to_numpy())
        out_t, out_e = [], []
        for t in uniq:
            est = min(sk[(salt, _cms_bucket(salt, t))]
                      for salt in CMS_SALTS)
            if 100 * est > pct * total:
                out_t.append(t)
                out_e.append(est)
        return pa.table({"token": pa.array(out_t, pa.string()),
                         "est_count": pa.array(out_e, pa.int64())})

    # cross-batch repeats carry the identical global estimate; one
    # candidate-sized groupby collapses them
    return (ds.map_batches(estimate, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Min("est_count", alias_name="est_count")))


def cms_oracle_sql(pct: int = 1, table: str = "documents",
                   text_col: str = "text") -> str:
    """ANSI-SQL twin of cms_heavy_hitters — same md5 buckets, same
    min-over-salts estimate, same integer threshold gate."""
    salts = ", ".join(f"'{s}'" for s in CMS_SALTS)
    bexpr = ("('0x' || substr(md5(salt || token), 1, 4))::INTEGER "
             f"% {CMS_W}")
    return (
        f"WITH toks AS (SELECT unnest(regexp_extract_all({text_col}, "
        f"'\\S+')) AS token FROM {table}), "
        f"tot AS (SELECT count(*) AS n FROM toks), "
        f"salts AS (SELECT unnest([{salts}]) AS salt), "
        f"cells AS (SELECT salt, {bexpr} AS bucket, count(*) AS c "
        f"FROM toks CROSS JOIN salts GROUP BY salt, bucket), "
        f"cand AS (SELECT DISTINCT token FROM toks), "
        f"tb AS (SELECT token, salt, {bexpr} AS bucket "
        f"FROM cand CROSS JOIN salts), "
        f"est AS (SELECT token, MIN(c) AS est_count FROM tb "
        f"JOIN cells USING (salt, bucket) GROUP BY token) "
        f"SELECT token, CAST(est_count AS BIGINT) AS est_count "
        f"FROM est, tot WHERE 100 * est_count > {pct} * tot.n")


def sampled_quantiles(ds, rate: float = 1 / 4,
                      qs=(0.25, 0.5, 0.75, 0.95)):
    """Hash-sampled per-group quantiles — the bounded-shuffle tier
    ``value_quantiles`` names for groups too large to sort in one
    worker: estimate the quantiles of event value per event_type from
    a DETERMINISTIC uniform sample (keep a row iff the first 32 bits
    of md5(event_id) fall below ``rate`` * 2^32 — the
    ``stratified_sample`` predicate, so the same rows survive any
    re-partitioning, resume, or rerun, and the DuckDB twin replays the
    identical sample).  ``rate`` is the scale knob: at 10^10 rows per
    group, rate=1e-5 bounds the per-group sort at ~10^5 values while
    the rank error concentrates at O(1/sqrt(rate * n)).

    Output (one row per event_type): exact ``quantile_disc`` quantiles
    OF THE SAMPLE as int64 micros (element ceil(q*n)-1 of the sorted
    sample) — computed by DELEGATING the survivors to
    ``relational.value_quantiles``, so the micros rounding and the
    quantile convention live in exactly one place and cannot drift
    from the oracle.  Shape: per-row hash predicate inside
    ``map_batches`` (only survivors leave the scan) -> the
    value_quantiles groupby, whose per-group work is a numpy sort of
    the sample."""
    from .relational import value_quantiles
    from .sampling import _hex_threshold

    thr = _hex_threshold(rate)

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_pylist()
        mask = pa.array(
            [hashlib.md5(str(d).encode()).hexdigest()[:8] < thr
             for d in ids], pa.bool_())
        return batch.filter(mask)

    return value_quantiles(
        ds.map_batches(sample, batch_format="pyarrow"), qs)


def sampled_quantiles_oracle_sql(rate: float = 1 / 4,
                                 qs=(0.25, 0.5, 0.75, 0.95),
                                 table: str = "events") -> str:
    """ANSI-SQL twin of sampled_quantiles — same md5 sample predicate,
    same micros rounding, same quantile_disc convention."""
    from .sampling import _hex_threshold

    thr = _hex_threshold(rate)
    cols = ", ".join(
        f"quantile_disc(v, {q}) AS q{int(q * 100)}_micros" for q in qs)
    return (
        f"WITH s AS (SELECT event_type, "
        f"CAST(round(value * 1000000) AS BIGINT) AS v FROM {table} "
        f"WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < "
        f"'{thr}') "
        f"SELECT event_type, {cols} FROM s GROUP BY event_type")
