"""Relational demonstration pipelines over the TPC-H-ish testdata tables:
windowed/sessionized event aggregation and a broadcast-dimension join —
the Ray Data shapes behind SURVEY.md §2.7 ("broadcast small-side
semi-join", pre-aggregated groupbys, stream-window semantics).

Float sums travel as integer micro-units so the DuckDB oracles hash
identically (double accumulation order is not associative).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def events_hourly(ds):
    """Tumbling 1-hour windows per event_type: (event_type, bucket,
    n_events, sum_value_micros).  Per-batch partial aggregation first —
    the groupby shuffles one row per (type, bucket) per batch, not one
    per event."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # us since epoch
        bucket = ts // (3600 * 1_000_000)
        etype = batch["event_type"].to_pylist()
        micros = np.rint(batch["value"].to_numpy() * 1_000_000
                         ).astype(np.int64)
        df = pd.DataFrame({"event_type": etype, "bucket": bucket,
                           "n": 1, "v": micros})
        g = df.groupby(["event_type", "bucket"], as_index=False).agg(
            partial_n=("n", "sum"), partial_v=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "bucket"])
            .aggregate(Sum("partial_n", alias_name="n_events"),
                       Sum("partial_v", alias_name="sum_value_micros")))


def sessionize(ds, gap_seconds: int = 1800):
    """Session windows per user (gap > ``gap_seconds`` starts a new
    session): (user_id, n_sessions, n_events).

    Partition-vectorized stream-window shape: users hash to ~2x CPU
    partitions (ONE shuffle), and each partition computes EVERY user's
    session count with one sort + one diff + a boundary mask — no
    per-user dispatch (Ray's map_groups costs ~1 ms per group; at 10^8
    users that is the whole job)."""
    from .blocks import default_partitions

    n_parts = default_partitions()

    def narrow(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(batch["ts"].cast(pa.int64()).to_numpy(),
                           pa.int64()),
            "part": pa.array(u % n_parts, pa.int64()),
        })

    gap_us = gap_seconds * 1_000_000

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = new_user.copy()
        starts[1:] |= (ts[1:] - ts[:-1]) > gap_us
        uu, idx, cnt = np.unique(u, return_index=True,
                                 return_counts=True)
        sess = np.add.reduceat(starts.astype(np.int64), idx)
        return pd.DataFrame({
            "user_id": uu,
            "n_sessions": sess,
            "n_events": cnt.astype(np.int64),
        })

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("part").map_groups(per_part,
                                        batch_format="pandas"))


def revenue_by_nation(orders_ds, customer_tbl: pa.Table,
                      nation_tbl: pa.Table):
    """Broadcast join: orders (fact) x customer x nation (dims).

    The dims are joined driver-side into one custkey -> nation_name map,
    ``ray.put`` once, then every orders batch does a numpy gather — no
    shuffle join.  Revenue as micro-units for oracle-exact sums."""
    import ray
    from ray.data.aggregate import Sum

    cust = customer_tbl.select(["c_custkey", "c_nationkey"]).to_pandas()
    nat = nation_tbl.select(["n_nationkey", "n_name"]).to_pandas()
    merged = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    # custkeys are dense-ish ints: direct-address array lookup
    max_key = int(merged["c_custkey"].max())
    names = np.array(sorted(set(merged["n_name"])), dtype=object)
    name_idx = {n: i for i, n in enumerate(names)}
    lut = np.full(max_key + 1, -1, dtype=np.int32)
    lut[merged["c_custkey"].to_numpy()] = [
        name_idx[n] for n in merged["n_name"]]
    ref = ray.put((lut, names))

    def partial(batch: pa.Table) -> pa.Table:
        lut_, names_ = ray.get(ref)
        keys = batch["o_custkey"].to_numpy()
        valid = (keys >= 0) & (keys < len(lut_))
        nid = np.where(valid, lut_[np.clip(keys, 0, len(lut_) - 1)], -1)
        micros = np.rint(batch["o_totalprice"].to_numpy() * 100
                         ).astype(np.int64)  # cents
        df = pd.DataFrame({"nid": nid, "cents": micros})
        df = df[df["nid"] >= 0]
        g = df.groupby("nid", as_index=False).agg(
            partial_n=("cents", "size"), partial_c=("cents", "sum"))
        g["n_name"] = names_[g["nid"].to_numpy()]
        return pa.Table.from_pandas(g[["n_name", "partial_n", "partial_c"]],
                                    preserve_index=False)

    return (orders_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("partial_n", alias_name="n_orders"),
                       Sum("partial_c", alias_name="revenue_cents")))


PRICING_CUTOFF_US = 904694400000000  # 1998-09-02 00:00:00 UTC in micros


def pricing_summary(lineitem_ds):
    """TPC-H Q1-shape pricing summary report over lineitem: filter on
    ship date, group by (returnflag, linestatus), and produce the
    classic sum/avg/count battery.  The canonical combiner showcase:
    each batch pre-aggregates to at most |RF x LS| (~6) rows in exact
    integer cents/micros, the groupby shuffles only those partials, and
    the averages are derived from the integer sums in a final tiny map
    — so the result is bit-identical to the DuckDB oracle regardless of
    summation order (float sums would not be)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        m = us <= PRICING_CUTOFF_US
        qty = batch["l_quantity"].to_numpy()[m]
        ext = batch["l_extendedprice"].to_numpy()[m]
        disc = batch["l_discount"].to_numpy()[m]
        tax = batch["l_tax"].to_numpy()[m]
        df = pd.DataFrame({
            "l_returnflag": np.asarray(
                batch["l_returnflag"].to_pandas())[m],
            "l_linestatus": np.asarray(
                batch["l_linestatus"].to_pandas())[m],
            # floor(x+0.5), NOT np.rint: DuckDB round() is
            # half-away-from-zero, rint is half-to-even, and exact .5
            # products occur; floor(x+0.5) is the same doubles on both
            # sides (all values positive here)
            "qty_c": np.floor(qty * 100 + 0.5).astype(np.int64),
            "base_c": np.floor(ext * 100 + 0.5).astype(np.int64),
            "disc_price_c": np.floor(
                ext * (1 - disc) * 100 + 0.5).astype(np.int64),
            "charge_c": np.floor(
                ext * (1 - disc) * (1 + tax) * 100 + 0.5
            ).astype(np.int64),
            "disc_u": np.floor(disc * 1000000 + 0.5).astype(np.int64),
        })
        g = df.groupby(["l_returnflag", "l_linestatus"],
                       as_index=False).agg(
            p_qty=("qty_c", "sum"), p_base=("base_c", "sum"),
            p_disc_price=("disc_price_c", "sum"),
            p_charge=("charge_c", "sum"), p_disc=("disc_u", "sum"),
            p_n=("qty_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("p_qty", alias_name="sum_qty_cents"),
                      Sum("p_base", alias_name="sum_base_cents"),
                      Sum("p_disc_price",
                          alias_name="sum_disc_price_cents"),
                      Sum("p_charge", alias_name="sum_charge_cents"),
                      Sum("p_disc", alias_name="sum_disc_micros"),
                      Sum("p_n", alias_name="count_order")))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["count_order"].to_numpy().astype(np.float64)
        return batch.append_column(
            "avg_qty", pa.array(
                batch["sum_qty_cents"].to_numpy() / 100.0 / n,
                pa.float64())).append_column(
            "avg_price", pa.array(
                batch["sum_base_cents"].to_numpy() / 100.0 / n,
                pa.float64())).append_column(
            "avg_disc", pa.array(
                batch["sum_disc_micros"].to_numpy() / 1000000.0 / n,
                pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation_hashjoin(orders_ds, customer_ds, nation_tbl,
                               num_partitions: int = 8):
    """Distributed HASH JOIN variant of ``revenue_by_nation``: orders
    (fact) joins customer (dim) via ``Dataset.join`` — Ray Data's
    hash-shuffle join operator — the shape for when the dim side is too
    large to broadcast (the broadcast variant stays the right choice
    for small dims).  nation (25 rows) remains a broadcast lookup.
    Output schema matches revenue_by_nation exactly so both verify
    against the same DuckDB oracle."""
    import ray
    from ray.data.aggregate import Sum

    nat = nation_tbl.select(["n_nationkey", "n_name"])
    lut = dict(zip(nat["n_nationkey"].to_pylist(),
                   nat["n_name"].to_pylist()))
    ref = ray.put(lut)

    joined = orders_ds.join(customer_ds, "inner",
                            num_partitions=num_partitions,
                            on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        nk = batch["c_nationkey"].to_pylist()
        micros = np.rint(batch["o_totalprice"].to_numpy() * 100
                         ).astype(np.int64)  # cents
        names = [lut_.get(k) for k in nk]
        df = pd.DataFrame({"n_name": names, "cents": micros})
        df = df[df["n_name"].notna()]
        g = df.groupby("n_name", as_index=False).agg(
            partial_n=("cents", "size"), partial_c=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("partial_n", alias_name="n_orders"),
                       Sum("partial_c", alias_name="revenue_cents")))


def count_by_host_salted(ds, num_salts: int = 8):
    """Per-host row counts over a HOST-SKEWED table (www.gov.uk holds
    ~80% of the corpus) with salted-key two-phase aggregation: phase 1
    groups on (host, salt) so the mega-host's rows spread across
    ``num_salts`` reducers, phase 2 merges the per-salt partials — the
    north rule's skew treatment, demonstrated on the one host-keyed
    aggregate the engine exposes.  Output: (host, n_pages)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import zlib

        hosts = batch["host"].to_pylist()
        urls = batch["url"].to_pylist()
        # stable seeded hash: builtin hash() is PYTHONHASHSEED-dependent,
        # which made the salt partitioning nondeterministic run-to-run
        salt = np.array([zlib.crc32(u.encode("utf-8")) % num_salts
                         for u in urls], dtype=np.int32)
        df = pd.DataFrame({"host": hosts, "salt": salt, "n": 1})
        g = df.groupby(["host", "salt"], as_index=False).agg(
            partial_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    salted = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["host", "salt"])
              .aggregate(Sum("partial_n", alias_name="salt_n")))
    return (salted.groupby("host")
            .aggregate(Sum("salt_n", alias_name="n_pages")))


def top_docs_by_length(ds, k: int = 25) -> pa.Table:
    """Top-k longest documents with deterministic doc_id tiebreak:
    (doc_id, n_chars).  Per-batch partial top-k + driver merge of
    k rows/batch — no all-to-all Sort operator in the plan (the
    knn_bruteforce pattern)."""
    def partial(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(b["text"]), pa.int64()).to_numpy()
        ids = b["doc_id"].to_numpy()
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        # full ordering (n_chars desc, doc_id asc) so boundary ties pick
        # the right members even within a batch
        order = np.lexsort((ids, -n))[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "n_chars": pa.array(n[order], pa.int64())})

    parts = [b for b in (ds.map_batches(partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))]
    allp = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_chars": pa.array([], pa.int64())})
    ids = allp["doc_id"].to_numpy()
    n = allp["n_chars"].to_numpy()
    order = np.lexsort((ids, -n))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                     "n_chars": pa.array(n[order], pa.int64())})


def global_rank(ds, num_partitions: int | None = None):
    """Distributed global sort-rank: every document gets its dense
    1-based position in (n_tokens DESC, doc_id ASC) order —
    ``ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)`` as a
    distributed operator.  Output (doc_id, n_tokens, rank).

    Ray Data's native ``Dataset.sort`` range-partitions and orders the
    blocks but exposes no global offsets, so rank is the same
    two-phase scan as ``packing.pack_offsets`` (output column ``pos``):
    the FIRST sort key is its own order-preserving bucket —

      1. narrow (doc_id, n_tokens) projection;
      2. per-n_tokens counts (map-side Count partials), driver
         exclusive-scans them in DESC key order (distinct token counts
         ~O(longest doc) — thousands, not corpus-sized) and broadcasts
         the base-offset table once via ``ray.put``;
      3. ONE shuffle hash-partitioned on n_tokens (whole keys
         co-locate), vectorized in-partition lexsort + per-key
         cumcount — no per-key map_groups dispatch (the chunk_dedup
         lesson).

    Only int64 triples shuffle; text never moves."""
    import ray
    from ray.data.aggregate import Count

    def narrow(b: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.count_substring_regex(b["text"], r"\S+"),
                        pa.int64())
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "n_tokens": n_tok})

    narrow_ds = ds.map_batches(narrow,
                               batch_format="pyarrow").materialize()

    # DRIVER-SIDE CARDINALITY ASSUMPTION: the histogram has one row per
    # DISTINCT n_tokens value — O(longest document in tokens), not
    # O(corpus) — so the driver scan is bounded; driver_histogram fails
    # loudly if a pathological domain breaks that
    from .blocks import driver_histogram

    counts = driver_histogram(
        narrow_ds.groupby("n_tokens").aggregate(Count(alias_name="n")),
        "global_rank").sort_values("n_tokens", ascending=False)
    keys = counts["n_tokens"].to_numpy()
    base = dict(zip(keys, np.concatenate(
        ([0], np.cumsum(counts["n"].to_numpy())[:-1])).astype(np.int64)))
    bref = ray.put(base)

    if num_partitions is None:
        try:
            num_partitions = max(2, min(narrow_ds.num_blocks(), 32))
        except Exception:
            num_partitions = 8

    n_parts = num_partitions

    def tag(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].to_numpy()
        return b.append_column(
            "part", pa.array(nt % n_parts, pa.int64()))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        base_ = ray.get(bref)
        g = g.sort_values(["n_tokens", "doc_id"])
        within = g.groupby("n_tokens", sort=False).cumcount().to_numpy()
        offs = g["n_tokens"].map(base_).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy(),
            "pos": offs + within + 1,
        })

    return (narrow_ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part").map_groups(rank_part,
                                        batch_format="pandas"))


def percent_rank_docs(ds):
    """Relative corpus position per document: pct_ppm =
    ((rank - 1) * 10^6) // (n - 1) over the same (n_tokens DESC,
    doc_id) order as ``global_rank`` — SQL's PERCENT_RANK, kept in
    exact integer ppm (the double formula rounds unpredictably at
    boundaries).  Output (doc_id, n_tokens, pos, pct_ppm).

    One extra stateless map over the (already materialized)
    global_rank output; n comes from the materialized count, so
    nothing re-executes."""
    ranked = global_rank(ds).materialize()
    n = ranked.count()
    denom = max(n - 1, 1)

    def pct(b: pa.Table) -> pa.Table:
        r = b["pos"].to_numpy()
        return b.append_column(
            "pct_ppm", pa.array((r - 1) * 1_000_000 // denom,
                                pa.int64()))

    return ranked.map_batches(pct, batch_format="pyarrow")


def asof_join_events(ds, left_type: str = "purchase",
                     right_type: str = "click"):
    """AS-OF join over the events stream: for each LEFT-type event, the
    most recent RIGHT-type event by the same user with right.ts <=
    left.ts (DuckDB ``ASOF LEFT JOIN`` semantics; unmatched rows carry
    -1).  Ray Data lacks an as-of join operator, so this is the
    documented composition: narrow per-batch projection/filter -> ONE
    hash shuffle on user_id -> sorted-merge (``np.searchsorted``)
    inside each group.

    Partitioning assumption: one user's events fit in one group — true
    for user-keyed event streams; a hot user would be salted by time
    range and merged with a second as-of pass over the boundary rows.

    Right-side ties on (user_id, ts) are pre-aggregated to max(value)
    so the match is deterministic.  Timestamps/values travel as int64
    micros for oracle-exact comparison.

    Partition-vectorized: users hash to ~2x CPU partitions and each
    partition runs ONE ``pd.merge_asof(by=user_id)`` over all of its
    users — no per-user map_groups dispatch."""
    from .blocks import default_partitions

    n_parts = default_partitions()

    def narrow(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        b = batch.filter(mask)
        side = pc.cast(pc.equal(b["event_type"], right_type), pa.int8())
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_micros": b["ts"].cast(pa.int64()),
            "value_micros": pa.array(
                np.rint(b["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64), pa.int64()),
            "side": side,
            "part": pa.array(u % n_parts, pa.int64()),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        a = (g[g["side"] == 0]
             .sort_values(["ts_micros", "event_id"], kind="stable")
             .reset_index(drop=True))
        n = len(a)
        if n == 0:
            # typed empty: object-dtype empties poison the block schema
            # when concatenated with int64 blocks from other groups
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"event_id": z, "user_id": z,
                                 "ts_micros": z, "right_ts_micros": z,
                                 "right_value_micros": z})
        b = g[g["side"] == 1]
        right_ts = np.full(n, -1, dtype=np.int64)
        right_val = np.full(n, -1, dtype=np.int64)
        if len(b):
            bb = (b.groupby(["user_id", "ts_micros"],
                            as_index=False)["value_micros"].max()
                  .sort_values("ts_micros", kind="stable")
                  .reset_index(drop=True))
            bb["right_ts_micros"] = bb["ts_micros"]
            m = pd.merge_asof(
                a[["user_id", "ts_micros"]], bb,
                on="ts_micros", by="user_id", direction="backward")
            hit = m["right_ts_micros"].notna().to_numpy()
            right_ts[hit] = m["right_ts_micros"].to_numpy()[
                hit].astype(np.int64)
            right_val[hit] = m["value_micros"].to_numpy()[
                hit].astype(np.int64)
        return pd.DataFrame({
            "event_id": a["event_id"].to_numpy(),
            "user_id": a["user_id"].to_numpy(),
            "ts_micros": a["ts_micros"].to_numpy(),
            "right_ts_micros": right_ts,
            "right_value_micros": right_val,
        })

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_part, batch_format="pandas"))


# deterministic maintenance-window intervals for range_join_events:
# window i covers [BASE + i*PERIOD, BASE + i*PERIOD + SPAN) — gaps of
# PERIOD-SPAN between windows, so containment is a real range predicate,
# not a partition of the axis.
RANGE_BASE_US = 1_704_067_200 * 1_000_000  # 2024-01-01T00:00:00Z
RANGE_PERIOD_US = 12 * 3600 * 1_000_000
RANGE_SPAN_US = 5 * 3600 * 1_000_000


def range_join_events(ds, n_ranges: int = 60):
    """Range (interval-containment) join: events x a small table of
    non-contiguous time windows, aggregated per window: (range_id,
    n_events, sum_value_micros).  The window table is tiny and SORTED,
    so the join is a broadcast + per-batch ``np.searchsorted`` on the
    window starts with an upper-bound check — no shuffle at all; the
    only exchange is the final pre-aggregated groupby (one row per
    window per batch).  For an UNSORTED/overlapping interval table the
    same shape holds with an interval tree built once per actor."""
    from ray.data.aggregate import Sum

    los = RANGE_BASE_US + np.arange(n_ranges, dtype=np.int64) \
        * RANGE_PERIOD_US
    his = los + RANGE_SPAN_US

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        idx = np.searchsorted(los, ts, side="right") - 1
        ok = (idx >= 0) & (ts < his[np.clip(idx, 0, None)])
        v = np.rint(batch["value"].to_numpy(zero_copy_only=False)
                    * 1_000_000).astype(np.int64)
        df = pd.DataFrame({"range_id": idx[ok], "n": 1, "v": v[ok]})
        g = df.groupby("range_id", as_index=False).agg(
            partial_n=("n", "sum"), partial_v=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("range_id")
            .aggregate(Sum("partial_n", alias_name="n_events"),
                       Sum("partial_v", alias_name="sum_value_micros")))


def sliding_window_hourly(ds, window_buckets: int = 24):
    """Sliding (RANGE-frame) windowed aggregate: per event_type, the
    trailing-24-hour sum/count at each hour bucket — SQL's ``SUM(v)
    OVER (PARTITION BY type ORDER BY bucket RANGE BETWEEN 23 PRECEDING
    AND CURRENT ROW)``.  Composition: the tumbling hourly pre-aggregate
    (events_hourly — one row per (type, bucket) leaves each batch),
    then ONE groupby(event_type) whose groups are tiny (one row per
    hour), windowed inside via prefix sums + ``searchsorted`` (RANGE
    frames over sparse buckets, so gaps are honored — a rolling() over
    rows would be wrong)."""
    hourly = events_hourly(ds)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        b = g["bucket"].to_numpy()
        v = g["sum_value_micros"].to_numpy()
        n = g["n_events"].to_numpy()
        cv = np.concatenate([[0], np.cumsum(v)])
        cn = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(b, b - window_buckets + 1, side="left")
        hi = np.arange(len(b), dtype=np.int64) + 1
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket": b,
            "w24_events": cn[hi] - cn[lo],
            "w24_micros": cv[hi] - cv[lo],
        })

    return (hourly.groupby("event_type")
            .map_groups(per_type, batch_format="pandas"))


def distinct_users_daily(ds):
    """Exact COUNT(DISTINCT) per group at scale: (day, n_users,
    n_events) over the events stream.  Two-phase: per-batch dedup of
    (day, user_id) pairs (the combiner — repeat events collapse before
    anything moves), ONE hash shuffle on the pair to finish the dedup,
    then a second pre-aggregated groupby(day) that only moves one row
    per (day, batch).  No driver-side sets, no global sort; the pair
    shuffle is the information-theoretic floor for exact distinct."""
    from ray.data.aggregate import Sum

    day_us = 86_400 * 1_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"day": ts // day_us,
                           "user_id": batch["user_id"].to_numpy(),
                           "n": 1})
        g = df.groupby(["day", "user_id"], as_index=False).agg(
            partial_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_pair = (ds.map_batches(pairs, batch_format="pyarrow")
                .groupby(["day", "user_id"])
                .aggregate(Sum("partial_n", alias_name="pair_n")))

    def fold(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": batch["day"].to_numpy(), "u": 1,
                           "e": batch["pair_n"].to_numpy()})
        g = df.groupby("day", as_index=False).agg(
            partial_u=("u", "sum"), partial_e=("e", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (per_pair.map_batches(fold, batch_format="pyarrow")
            .groupby("day")
            .aggregate(Sum("partial_u", alias_name="n_users"),
                       Sum("partial_e", alias_name="n_events")))


def value_quantiles(ds, qs=(0.25, 0.5, 0.75, 0.95)):
    """Exact discrete quantiles of event value per event_type —
    ``quantile_disc`` semantics (element at index ceil(q*n)-1 of the
    sorted group).  Values travel as int64 micros; ONE groupby whose
    per-group work is a numpy sort.  Exact group-wise quantiles
    inherently need the group's values in one place; at 10^10 rows per
    group the swap is a mergeable t-digest/KLL sketch behind the same
    output schema (the kmv_distinct precedent for sketch-backed
    oracles)."""
    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "v": pa.array(
                np.rint(batch["value"].to_numpy(zero_copy_only=False)
                        * 1_000_000).astype(np.int64), pa.int64()),
        })

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        row = {"event_type": g["event_type"].iloc[0]}
        for q in qs:
            row[f"q{int(q * 100)}_micros"] = int(
                v[max(int(np.ceil(q * n)) - 1, 0)])
        return pd.DataFrame([row])

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(per_type, batch_format="pandas"))


def orders_without_recent_lineitem(orders_ds, lineitem_ds,
                                   cutoff_us: int,
                                   num_partitions: int = 8):
    """ANTI join: orders with NO lineitem shipped at/after ``cutoff_us``
    — SQL's NOT EXISTS.  The probe side is filtered + projected to the
    single join key inside ``map_batches`` BEFORE the exchange (only
    int64 keys shuffle), then Ray Data's native ``join_type=
    "left_anti"`` hash-shuffles both sides.  Broadcast is the wrong
    shape here: the probe side is fact-sized, so the anti join must
    partition — the complement of the broadcast semi-join the curation
    pipeline uses for its small winner set.  Output: (o_orderkey)."""
    def probe_keys(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64())
        keep = pc.greater_equal(ts, pa.scalar(cutoff_us, pa.int64()))
        return pa.table({"l_orderkey": batch.filter(keep)["l_orderkey"]})

    keys = lineitem_ds.map_batches(probe_keys, batch_format="pyarrow")
    left = orders_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"]}),
        batch_format="pyarrow")
    return left.join(keys, "left_anti", num_partitions=num_partitions,
                     on=("o_orderkey",), right_on=("l_orderkey",))


def top_docs_per_group(ds, k: int = 3):
    """Per-group top-k: the k longest documents per lang, deterministic
    (n_chars desc, doc_id asc) tiebreak — SQL's row_number() OVER
    (PARTITION BY lang ORDER BY ...) <= k.  Per-batch partial top-k per
    group first (at most k rows per (group, batch) reach the shuffle),
    then one tiny groupby(lang) finishes.  Output: (lang, doc_id,
    n_chars)."""
    def partial(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(b["text"]), pa.int64()).to_numpy()
        ids = b["doc_id"].to_numpy()
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        df = pd.DataFrame({"lang": langs, "doc_id": ids, "n_chars": n})
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        df = df.groupby("lang", as_index=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(k)
        return g[["lang", "doc_id", "n_chars"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(finish, batch_format="pandas"))


def conversion_funnel(ds, first_type: str = "signup",
                      then_type: str = "purchase",
                      within_us: int = 86_400 * 1_000_000):
    """Event-sequence funnel: per user, did a ``then_type`` event occur
    within ``within_us`` AFTER the user's FIRST ``first_type`` event —
    (user_id, first_ts_micros, converted int64).  The sessionize /
    as-of family's third shape: per-batch narrow projection + filter,
    ONE user_id hash shuffle, numpy searchsorted inside each group.
    Users with no ``first_type`` event are absent (SQL inner-select
    semantics)."""
    def narrow(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array([first_type, then_type]))
        b = batch.filter(mask)
        return pa.table({
            "user_id": b["user_id"],
            "ts_micros": b["ts"].cast(pa.int64()),
            "is_first": pc.cast(pc.equal(b["event_type"], first_type),
                                pa.int8()),
        })

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["is_first"] == 1]["ts_micros"]
        if not len(a):
            z = np.empty(0, dtype=np.int64)  # typed empty (see as-of)
            return pd.DataFrame({"user_id": z, "first_ts_micros": z,
                                 "converted": z})
        t0 = int(a.min())
        b = np.sort(g[g["is_first"] == 0]["ts_micros"].to_numpy())
        lo = np.searchsorted(b, t0, side="left")
        conv = int(lo < len(b) and b[lo] <= t0 + within_us)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "first_ts_micros": [t0],
                             "converted": [conv]})

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))


def event_gaps(ds):
    """LAG-window family: per user, the number of inter-event gaps and
    the LARGEST gap in micros (idle-time detection) — SQL's
    ``max(ts - lag(ts) OVER (PARTITION BY user ORDER BY ts))``.
    One user_id shuffle; ``np.diff`` over the sorted group.  Users with
    a single event report -1 (SQL NULL coalesced identically)."""
    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"],
                         "ts_micros": batch["ts"].cast(pa.int64())})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts_micros"].to_numpy())
        gaps = np.diff(ts)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_gaps": [len(gaps)],
            "max_gap_micros": [int(gaps.max()) if len(gaps) else -1],
        })

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))


def doc_length_quartiles(ds, n_tiles: int = 4):
    """NTILE-window family: each document's length quartile within its
    lang — SQL's ``ntile(4) OVER (PARTITION BY lang ORDER BY
    length(text), doc_id)`` with its exact remainder rule (the first
    ``m % n`` tiles get the extra row).  One lang shuffle, ranking and
    the ntile formula vectorized per group.  Output: (lang, doc_id,
    quartile 1-based)."""
    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"],
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        m = len(g)
        base, rem = divmod(m, n_tiles)
        r = np.arange(m, dtype=np.int64)
        big = rem * (base + 1)
        tile = np.where(r < big, r // max(base + 1, 1),
                        rem + (r - big) // max(base, 1))
        return pd.DataFrame({
            "lang": g["lang"],
            "doc_id": g["doc_id"],
            "quartile": tile.astype(np.int64) + 1,
        })

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(per_lang, batch_format="pandas"))


def events_rollup(ds):
    """ROLLUP family: (event_type, day) counts plus per-type subtotals
    plus the grand total in ONE output table, sentinel-coded (day = -1,
    event_type = 'ALL') so the SQL twin is a plain UNION of groupbys
    with no NULL-semantics ambiguity.  The detail level is the only
    wide shuffle; both total levels re-aggregate its (tiny)
    pre-aggregated output."""
    from ray.data.aggregate import Sum

    day_us = 86_400 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist(),
                           "day": ts // day_us, "n": 1})
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            partial_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    detail = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Sum("partial_n", alias_name="n_events"))
              .materialize())

    def to_type_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "n": b["n_events"].to_numpy()})
        g = df.groupby("event_type", as_index=False).agg(
            partial_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    by_type = (detail.map_batches(to_type_partial, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Sum("partial_n", alias_name="n_events")))

    def tag_type(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pa.array(np.full(b.num_rows, -1, np.int64),
                            pa.int64()),
            "n_events": b["n_events"],
        })

    def to_total(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": pa.array(["ALL"] * min(b.num_rows, 1)
                                   if b.num_rows else [], pa.string()),
            "day": pa.array([-1] * min(b.num_rows, 1)
                            if b.num_rows else [], pa.int64()),
            "n_events": pa.array(
                [int(b["n_events"].to_numpy().sum())]
                if b.num_rows else [], pa.int64()),
        })

    type_rows = by_type.map_batches(tag_type, batch_format="pyarrow")
    # grand total: ONE block and batch_size=None (whole-block batches) —
    # the 1024-row default would split a wide detail table and emit
    # several 'ALL' rows
    total_rows = (type_rows.repartition(1)
                  .map_batches(to_total, batch_format="pyarrow",
                               batch_size=None))
    return detail.union(type_rows).union(total_rows)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(ds):
    """PIVOT family: one row per day with a count column per event
    type — SQL's conditional aggregation (``sum(CASE WHEN type = x
    THEN 1 END)``).  The detail (type, day) aggregate shuffles once
    (pre-aggregated); the pivot itself is a per-batch reshape of that
    tiny output, no second shuffle.  Unknown types are dropped (the
    column set is the schema contract).  Output: (day, n_click,
    n_error, n_purchase, n_signup, n_view)."""
    from ray.data.aggregate import Sum

    day_us = 86_400 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist(),
                           "day": ts // day_us, "n": 1})
        df = df[df["event_type"].isin(EVENT_TYPES)]
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            partial_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    detail = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Sum("partial_n", alias_name="n")))

    def widen(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        wide = (df.pivot_table(index="day", columns="event_type",
                               values="n", aggfunc="sum", fill_value=0)
                .reindex(columns=list(EVENT_TYPES), fill_value=0)
                .reset_index())
        out = {"day": pa.array(wide["day"].to_numpy(np.int64),
                               pa.int64())}
        for t in EVENT_TYPES:
            out[f"n_{t}"] = pa.array(wide[t].to_numpy(np.int64),
                                     pa.int64())
        return pa.table(out)

    # one partition AND batch_size=None (whole-block batches): the
    # detail output is (types x days) rows — tiny, but the 1024-row
    # default batch split would emit duplicate day rows once the
    # detail outgrows one batch
    return detail.repartition(1).map_batches(
        widen, batch_format="pyarrow", batch_size=None)


HIGH_VALUE_ORDER = 450000.0


def customers_with_orders(customer_ds, orders_ds,
                          min_total: float = HIGH_VALUE_ORDER,
                          num_partitions: int = 8):
    """SEMI join: customers having at least one high-value order —
    SQL's EXISTS, via Ray Data's native ``join_type="left_semi"``.
    The probe side is predicate-filtered AND projected to the single
    int64 key column inside ``map_batches`` BEFORE the exchange (only
    qualifying keys shuffle), the partitioned complement of the
    broadcast semi-join used when the probe set is small enough to
    ``ray.put``.  Output: (c_custkey, c_name)."""
    left = customer_ds.map_batches(
        lambda b: b.select(["c_custkey", "c_name"]),
        batch_format="pyarrow")

    def keys(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["o_totalprice"], min_total)
        return pa.table({"o_custkey": b.filter(keep)["o_custkey"]})

    return left.join(orders_ds.map_batches(keys, batch_format="pyarrow"),
                     "left_semi", num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))


def customer_order_details(customer_ds, orders_ds,
                           min_total: float = HIGH_VALUE_ORDER,
                           num_partitions: int = 8):
    """LEFT OUTER join: every customer with each of their high-value
    orders, NULL order columns for customers with none — the
    null-preserving enrichment join (native ``join_type="left_outer"``
    hash exchange; the filter runs pre-shuffle and the non-key columns
    pass through untouched, so value parity is exact with no
    arithmetic involved).  Output: (c_custkey, c_name, o_orderkey,
    o_totalprice)."""
    left = customer_ds.map_batches(
        lambda b: b.select(["c_custkey", "c_name"]),
        batch_format="pyarrow")

    def right_side(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["o_totalprice"], min_total)
        return b.filter(keep).select(["o_custkey", "o_orderkey",
                                      "o_totalprice"])

    right = orders_ds.map_batches(right_side, batch_format="pyarrow")
    joined = left.join(right, "left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))
    return joined.map_batches(
        lambda b: b.select(["c_custkey", "c_name", "o_orderkey",
                            "o_totalprice"]),
        batch_format="pyarrow")


def upsert_latest(ds, num_partitions: int | None = None):
    """Latest record per key — the recrawl-merge / snapshot-upsert
    primitive (a 100 TB recrawl is "new fetch of the same URL wins";
    the reference gets this for free from filesystem overwrite,
    workflow.go:183 — here it is a first-class distributed operator).
    Over ``events``: the newest event per user_id, ordered by
    (ts, event_id) so ties break deterministically.

    Plan (one narrow shuffle):
      1. per-batch COMBINER: keep only each key's latest row within
         the batch (vectorized pandas sort + tail(1)), so at most
         |distinct keys in batch| rows leave the map stage;
      2. hash-partition by key (key % P, P ~ 2x CPUs) and run ONE
         vectorized reduce per partition — not one map_groups dispatch
         per key (~1 ms x n_keys, the distinctive_terms lesson).
    Non-key columns ride along untouched, so value parity with the
    SQL row_number() oracle is exact (no arithmetic).
    Output (user_id, event_id, ts, event_type, value)."""
    cols = ["user_id", "event_id", "ts", "event_type", "value"]

    if num_partitions is None:
        from .blocks import default_partitions

        num_partitions = default_partitions()

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        return df.groupby("user_id", sort=False).tail(1)

    def partial(b: pa.Table) -> pa.Table:
        df = latest(b.select(cols).to_pandas())
        df["part"] = (df["user_id"].to_numpy().astype(np.int64)
                      % num_partitions)
        return pa.Table.from_pandas(df, preserve_index=False)

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        return latest(g)[cols]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(reduce_part, batch_format="pandas"))


def customer_activity(orders_ds, events_ds, num_partitions: int = 8):
    """FULL OUTER join of two independently pre-aggregated fact
    tables: per-customer order spend vs per-customer event counts —
    the coverage-reconciliation shape ("which keys exist on only one
    side?") that completes the join family (inner / broadcast /
    left_semi / left_anti / left_outer / full_outer all first-class).

    Both sides collapse to one row per key BEFORE the exchange
    (per-batch pandas combiner -> groupby Sum), so the full_outer hash
    join moves |keys| rows, not |facts|.  Spend travels as integer
    cents (floor(x*100 + 0.5), positive prices) because double sums
    are order-dependent and would never hash-match the oracle.
    Output (o_custkey, order_cnt, spend_cents, user_id, event_cnt)
    with NULLs marking the side a key is missing from."""
    from ray.data.aggregate import Sum

    def o_partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["o_totalprice"].to_numpy() * 100.0
                         + 0.5).astype(np.int64)
        df = (pd.DataFrame({"o_custkey": k, "p_n": 1, "p_c": cents})
              .groupby("o_custkey", as_index=False)
              .agg(p_n=("p_n", "sum"), p_c=("p_c", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    def e_partial(b: pa.Table) -> pa.Table:
        k = b["user_id"].to_numpy(zero_copy_only=False)
        df = (pd.DataFrame({"user_id": k, "p_n": 1})
              .groupby("user_id", as_index=False)
              .agg(p_n=("p_n", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    # both sides are groupby outputs: compact away zero-schema empty
    # partitions before the hash join (see blocks.nonempty_blocks).
    # An ALL-EMPTY side cannot go through Dataset.join at all — the
    # JoinOperator's internal hash shuffle re-manufactures zero-schema
    # partitions from a 0-row input and pyarrow's acero join raises
    # KeyError on the missing key column — so full-outer semantics for
    # an empty side are synthesized directly: pass the other side
    # through with NULLs for the absent columns.
    from .blocks import nonempty_blocks

    import ray.data as rd

    left = nonempty_blocks(
        orders_ds.map_batches(o_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("p_n", alias_name="order_cnt"),
                   Sum("p_c", alias_name="spend_cents")))
    right = nonempty_blocks(
        events_ds.map_batches(e_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("p_n", alias_name="event_cnt")))
    if left is None and right is None:
        return rd.from_arrow(pa.table({
            "o_custkey": pa.array([], pa.int64()),
            "order_cnt": pa.array([], pa.int64()),
            "spend_cents": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_cnt": pa.array([], pa.int64())}))
    if right is None:
        def _left_only(b: pa.Table) -> pa.Table:
            null = pa.nulls(b.num_rows, pa.int64())
            return b.append_column("user_id", null).append_column(
                "event_cnt", null)

        return left.map_batches(_left_only, batch_format="pyarrow")
    if left is None:
        def _right_only(b: pa.Table) -> pa.Table:
            null = pa.nulls(b.num_rows, pa.int64())
            t = pa.table({"o_custkey": null,
                          "order_cnt": null,
                          "spend_cents": null})
            return t.append_column(
                "user_id", b["user_id"]).append_column(
                "event_cnt", b["event_cnt"])

        return right.map_batches(_right_only, batch_format="pyarrow")
    return left.join(right, "full_outer",
                     num_partitions=num_partitions,
                     on=("o_custkey",), right_on=("user_id",))


def running_total(ds, num_partitions: int | None = None):
    """Per-key cumulative sum over time — the running-balance /
    tokens-so-far window (SQL's ``SUM() OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)``), completing the
    window family next to LAG-gap / NTILE / RANGE-frame sliding.

    Values travel as integer micros (the events_hourly convention) so
    the running sums are order-independent integers and hash-match the
    oracle.  Keys hash to ~2x-CPU partitions; each partition does ONE
    vectorized pandas sort + groupby.cumsum — a cumulative sum needs
    every row of its key in one place, so the shuffle is inherent, but
    nothing else moves and no per-key dispatch happens.
    Output (user_id, event_id, ts, cum_value_micros)."""
    if num_partitions is None:
        from .blocks import default_partitions

        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        micros = np.rint(b["value"].to_numpy() * 1_000_000
                         ).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts": b["ts"],
            "micros": pa.array(micros, pa.int64()),
            "part": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False)
                % num_partitions, pa.int64()),
        })

    def cum_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["cum_value_micros"] = (g.groupby("user_id", sort=False)
                                 ["micros"].cumsum())
        return g[["user_id", "event_id", "ts", "cum_value_micros"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(cum_part, batch_format="pandas"))


def assemble_features(docs_ds, emb_ds, num_partitions: int = 8):
    """Training-example assembly — the last step of a curation
    pipeline: per-document text features (token count, integer quality
    points, language) joined 1:1 with the embedding table's label into
    the flat examples table a trainer consumes.  Output
    (doc_id, lang, n_tokens, quality_points, label).

    Features compute inline in the SAME map pass that projects the
    join key (text never reaches the exchange); the embedding side
    ships only (vec_id, label) — the list<float> column must be pruned
    AT THE READ by the caller.  One hash join on the shared id."""
    from .text_analysis import quality_score_batch, token_count_batch

    def feats(b: pa.Table) -> pa.Table:
        tk = token_count_batch(b)
        q = quality_score_batch(b)
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "n_tokens": tk["n_tokens"],
            "quality_points": q["quality_points"],
        })

    left = docs_ds.map_batches(feats, batch_format="pyarrow")

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": b["vec_id"],
            "label": pc.cast(b["label"], pa.int64()),
        })

    right = emb_ds.map_batches(narrow, batch_format="pyarrow")
    return (left.join(right, "inner", num_partitions=num_partitions,
                      on=("doc_id",), right_on=("vec_id",))
            .select_columns(["doc_id", "lang", "n_tokens",
                             "quality_points", "label"]))


def winsorize(ds, lo: float = 0.05, hi: float = 0.95):
    """Global quantile clipping (winsorization) of event values — the
    "cap outliers before they dominate a mean/loss" curation step.
    Output (event_id, value_micros, clipped_micros) with clipping at
    the corpus's EXACT discrete lo/hi quantiles (quantile_disc
    semantics: element ceil(q*n)-1 of the sorted multiset, the
    value_quantiles convention).

    Two-pass global statistic, never a global sort (the quality_filter
    pattern): pass 1 aggregates the DISTINCT-VALUE histogram (one
    combiner row per distinct micro-value per batch); the driver reads
    that tiny table and derives both thresholds; pass 2 re-streams and
    clips with two vectorized compares.  Exactness rests on the value
    domain being compressible (here ~5*10^4 distinct cent-precision
    values); for truly continuous domains the swap is a mergeable KLL
    sketch behind the same output schema."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def narrow(b: pa.Table) -> pa.Table:
        v = np.rint(b["value"].to_numpy(zero_copy_only=False)
                    * 1_000_000).astype(np.int64)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "p_n": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    # DRIVER-SIDE CARDINALITY ASSUMPTION: one histogram row per distinct
    # micro-value — exactness rests on the value domain being
    # compressible (see docstring); driver_histogram fails loudly at
    # truly continuous domains instead of OOMing the driver
    from .blocks import driver_histogram

    h = driver_histogram(
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("p_n", alias_name="n")),
        "winsorize")
    if h.empty or "v" not in h.columns:
        # empty input: typed empty relation (an empty groupby output
        # loses even its column names on the pandas round-trip)
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "event_id": pa.array([], pa.int64()),
            "value_micros": pa.array([], pa.int64()),
            "clipped_micros": pa.array([], pa.int64())}))
    h = h.sort_values("v")
    counts = h["n"].to_numpy()
    vals = h["v"].to_numpy()
    cum = np.cumsum(counts)
    n_total = int(cum[-1])

    def q_disc(q: float) -> int:
        target = max(int(np.ceil(q * n_total)) - 1, 0)
        return int(vals[np.searchsorted(cum - 1, target)])

    t_lo, t_hi = q_disc(lo), q_disc(hi)

    def clip(b: pa.Table) -> pa.Table:
        v = np.rint(b["value"].to_numpy(zero_copy_only=False)
                    * 1_000_000).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "value_micros": pa.array(v, pa.int64()),
            "clipped_micros": pa.array(np.clip(v, t_lo, t_hi),
                                       pa.int64()),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


def table_profile(ds, int_cols=("doc_id", "n_chars"),
                  str_cols=("text", "lang", "source")):
    """Schema-profiling / data-validation sweep: one row per column
    with (n_rows, n_nulls, min/max) — the "did this ingest batch look
    sane?" gate every production pipeline runs before heavier work.
    Numeric and string extrema keep their native comparison semantics
    (a zero-padding string trick would mis-order negatives), riding in
    typed side-by-side columns with NULLs marking the inapplicable
    side.

    One per-batch Arrow combiner row per column (pc.min_max is a
    C-level scan) -> a |columns|-row groupby.  Output (column, n_rows,
    n_nulls, min_int, max_int, min_str, max_str)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []
        for c in int_cols:
            mm = pc.min_max(b[c])
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(b[c].null_count)
            mins_i.append(mm["min"].as_py())
            maxs_i.append(mm["max"].as_py())
            mins_s.append(None)
            maxs_s.append(None)
        for c in str_cols:
            mm = pc.min_max(b[c])
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(b[c].null_count)
            mins_i.append(None)
            maxs_i.append(None)
            mins_s.append(mm["min"].as_py())
            maxs_s.append(mm["max"].as_py())
        return pa.table({
            "column": pa.array(names, pa.string()),
            "p_n": pa.array(ns, pa.int64()),
            "p_nulls": pa.array(nulls, pa.int64()),
            "p_min_i": pa.array(mins_i, pa.int64()),
            "p_max_i": pa.array(maxs_i, pa.int64()),
            "p_min_s": pa.array(mins_s, pa.string()),
            "p_max_s": pa.array(maxs_s, pa.string()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("column")
           .aggregate(Sum("p_n", alias_name="n_rows"),
                      Sum("p_nulls", alias_name="n_nulls"),
                      Min("p_min_i", alias_name="min_int"),
                      Max("p_max_i", alias_name="max_int"),
                      Min("p_min_s", alias_name="min_str"),
                      Max("p_max_s", alias_name="max_str")))

    # extrema become strings AFTER numeric aggregation (so 9 < 10, not
    # '10' < '9'); '' marks the inapplicable side — a uniform nullable-
    # free schema that survives pandas round-trips on both compare
    # sides
    def stringify(b: pa.Table) -> pa.Table:
        def s(col, cast_int):
            # always cast: an all-null partition degrades the column to
            # Arrow's null type, which fill_null can't scalar-type
            return pc.fill_null(pc.cast(b[col], pa.string()), "")

        return pa.table({
            "column": b["column"],
            "n_rows": b["n_rows"],
            "n_nulls": b["n_nulls"],
            "min_int": s("min_int", True),
            "max_int": s("max_int", True),
            "min_str": s("min_str", False),
            "max_str": s("max_str", False),
        })

    return agg.map_batches(stringify, batch_format="pyarrow")


def gap_fill_hourly(ds):
    """Dense hourly event-count series: (event_type, bucket, n_events)
    for EVERY hour between the corpus's global min and max bucket, 0
    where nothing happened — the time-series regularization every
    monitoring / training-on-activity pipeline needs before windowed
    models (missing buckets silently skew moving stats).

    The sparse detail is one combiner-pre-aggregated groupby (rows =
    observed (type, hour) pairs); the dense grid is |types| x |hours|
    rows synthesized from three scalar pulls (min, max, type list) and
    LEFT-joined against the detail distributed — the fill itself never
    ships the raw events anywhere."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .blocks import nonempty_blocks

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        bucket = ts // (3600 * 1_000_000)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist(),
                           "bucket": bucket, "n": 1})
        g = df.groupby(["event_type", "bucket"], as_index=False).agg(
            p_n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    detail = nonempty_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("p_n", alias_name="n")))
    if detail is None:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64())}))
    lo = int(detail.min("bucket"))
    hi = int(detail.max("bucket"))
    types = sorted({t for b in detail.select_columns(["event_type"])
                    .iter_batches(batch_format="pyarrow")
                    for t in b["event_type"].to_pylist()})
    # the grid synthesizes DISTRIBUTED (rd.range -> decode), never as
    # one driver-side table: a single outlier timestamp can stretch
    # the bucket range by orders of magnitude and |types| x |hours|
    # rows on the driver would be the exact hotspot this op exists to
    # avoid
    n_hours = hi - lo + 1
    tarr = np.asarray(types, dtype=object)
    total = len(types) * n_hours

    def decode(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        return pa.table({
            "event_type": pa.array(list(tarr[i // n_hours]),
                                   pa.string()),
            "bucket": pa.array(lo + i % n_hours, pa.int64()),
        })

    grid = (rd.range(total, override_num_blocks=max(
        2, min(16, total // 65536 + 1)))
            .map_batches(decode, batch_format="pyarrow"))

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_type": b["event_type"],
            "bucket": b["bucket"],
            "n_events": pc.fill_null(pc.cast(b["n"], pa.int64()), 0),
        })

    P = max(2, min(8, total // 65536 + 1))
    return (grid.join(detail, "left_outer", num_partitions=P,
                      on=("event_type", "bucket"))
            .map_batches(fill, batch_format="pyarrow"))


def moving_avg(ds, k: int = 3, num_partitions: int | None = None):
    """Bounded ROWS-frame moving window per user: for each event (in
    (ts, event_id) order) the sum, count and integer average of the
    last ``k`` values — SQL's ``ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW`` frame, completing the window family next to the unbounded
    running_total and the RANGE-frame sliding_window.

    Integer-exact: values travel as micros (the events_hourly
    convention); the windowed sum is a grouped cumsum minus its
    k-shifted self (pure int64 — no pandas rolling, which would round-
    trip through float64), and avg_micros = win_sum // win_n (floor;
    assumes non-negative values — DuckDB's ``//`` truncates instead of
    flooring on negatives).  One user-hash shuffle, one vectorized
    pandas pass per partition.
    Output (user_id, event_id, ts, win_sum_micros, win_n, avg_micros).
    """
    from .blocks import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        micros = np.rint(b["value"].to_numpy() * 1_000_000
                         ).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts": b["ts"],
            "micros": pa.array(micros, pa.int64()),
            "part": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False)
                % num_partitions, pa.int64()),
        })

    def win_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        grp = g.groupby("user_id", sort=False)
        cum = grp["micros"].cumsum()
        lagged = (cum.groupby(g["user_id"], sort=False)
                  .shift(k, fill_value=0))
        rank = grp.cumcount() + 1
        g["win_sum_micros"] = cum - lagged
        g["win_n"] = np.minimum(rank, k).astype(np.int64)
        g["avg_micros"] = g["win_sum_micros"] // g["win_n"]
        return g[["user_id", "event_id", "ts", "win_sum_micros",
                  "win_n", "avg_micros"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(win_part, batch_format="pandas"))


def event_transitions(ds, num_partitions: int | None = None):
    """Markov transition counts between consecutive event types per
    user (ordered by ts, event_id): (src_type, dst_type, n_trans) —
    the behavior-model / session-flow primitive (SQL's LEAD window +
    GROUP BY).

    A transition needs every row of its user in one place, so keys
    hash to ~2x-CPU partitions (ONE narrow shuffle of
    (user_id, ts, event_id, event_type)); each partition does one
    vectorized pandas sort + groupby.shift and collapses to its LOCAL
    (src, dst) counts before the tiny global |types|^2-row groupby —
    the combiner discipline that keeps the second exchange O(25) rows
    per partition regardless of corpus size."""
    from ray.data.aggregate import Sum

    from .blocks import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts": b["ts"],
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "part": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False)
                % num_partitions, pa.int64()),
        })

    def local_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["dst_type"] = (g.groupby("user_id", sort=False)
                         ["event_type"].shift(-1))
        g = g.dropna(subset=["dst_type"])
        # dropna=False: a NULL src event_type is a legal group (the
        # SQL twin's GROUP BY keeps NULL src_type; its WHERE filters
        # only dst) — pandas' default would silently drop those rows
        out = (g.groupby(["event_type", "dst_type"], as_index=False,
                         dropna=False)
               .size().rename(columns={"event_type": "src_type",
                                       "size": "p_n"}))
        # a NULL src group must survive, but Ray 2.49's sort-based
        # groupby partitioner cannot ORDER a null string key ('<'
        # between None and str inside find_partition_index) — encode
        # it as the reserved \x00 sentinel for the exchange and decode
        # after the aggregate (the span_transitions lesson; left as a
        # pandas NaN it would reach the groupby as a float key)
        from .multimodal import _NULL_KEY

        src = out["src_type"].where(out["src_type"].notna(), _NULL_KEY)
        return pa.table({
            "src_type": pa.array(src.tolist(), pa.string()),
            "dst_type": pa.array(out["dst_type"].tolist(), pa.string()),
            "p_n": pa.array(out["p_n"].to_numpy().astype(np.int64),
                            pa.int64()),
        })

    def decode(b: pa.Table) -> pa.Table:
        from .multimodal import _NULL_KEY

        c = b["src_type"].combine_chunks()
        return pa.table({
            "src_type": pc.if_else(pc.equal(c, _NULL_KEY),
                                   pa.scalar(None, pa.string()), c),
            "dst_type": b["dst_type"],
            "n_trans": b["n_trans"],
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(local_counts, batch_format="pandas")
            .groupby(["src_type", "dst_type"])
            .aggregate(Sum("p_n", alias_name="n_trans"))
            .map_batches(decode, batch_format="pyarrow"))


def orders_cube(ds):
    """CUBE family: order count + revenue for every grouping set of
    (o_orderstatus, o_orderpriority) — detail, each one-dimension
    subtotal, and the grand total in ONE sentinel-coded table
    ('ALL' marks the collapsed dimension), completing the
    grouping-set family next to ROLLUP / PIVOT.  Revenue travels as
    integer cents (floor(x*100 + 0.5)) so sums are order-independent
    and hash-match the oracle.

    The detail level is the only wide shuffle (pre-aggregated by a
    per-batch pandas combiner); all three coarser levels re-aggregate
    the detail's tiny (|status| x |priority|) output."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(b["o_totalprice"].to_numpy() * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_orderstatus": b["o_orderstatus"].to_pylist(),
            "o_orderpriority": b["o_orderpriority"].to_pylist(),
            "p_n": 1, "p_c": cents})
        g = df.groupby(["o_orderstatus", "o_orderpriority"],
                       as_index=False).agg(p_n=("p_n", "sum"),
                                           p_c=("p_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    detail = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["o_orderstatus", "o_orderpriority"])
              .aggregate(Sum("p_n", alias_name="n_orders"),
                         Sum("p_c", alias_name="revenue_cents"))
              .materialize())

    def collapse(key_col: str):
        def part(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({key_col: b[key_col].to_pylist(),
                               "p_n": b["n_orders"].to_numpy(),
                               "p_c": b["revenue_cents"].to_numpy()})
            g = df.groupby(key_col, as_index=False).agg(
                p_n=("p_n", "sum"), p_c=("p_c", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        def tag(b: pa.Table) -> pa.Table:
            cols = {
                "o_orderstatus": b[key_col]
                if key_col == "o_orderstatus"
                else pa.array(["ALL"] * b.num_rows, pa.string()),
                "o_orderpriority": b[key_col]
                if key_col == "o_orderpriority"
                else pa.array(["ALL"] * b.num_rows, pa.string()),
                "n_orders": b["p_n"],
                "revenue_cents": b["p_c"],
            }
            return pa.table(cols)

        return (detail.map_batches(part, batch_format="pyarrow")
                .groupby(key_col)
                .aggregate(Sum("p_n", alias_name="p_n"),
                           Sum("p_c", alias_name="p_c"))
                .map_batches(tag, batch_format="pyarrow"))

    by_status = collapse("o_orderstatus")
    by_priority = collapse("o_orderpriority")

    def to_total(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.table({
                "o_orderstatus": pa.array([], pa.string()),
                "o_orderpriority": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64())})
        return pa.table({
            "o_orderstatus": pa.array(["ALL"], pa.string()),
            "o_orderpriority": pa.array(["ALL"], pa.string()),
            "n_orders": pa.array(
                [int(b["n_orders"].to_numpy().sum())], pa.int64()),
            "revenue_cents": pa.array(
                [int(b["revenue_cents"].to_numpy().sum())], pa.int64()),
        })

    # grand total: ONE block, whole-block batches (the events_rollup
    # convention) so exactly one 'ALL','ALL' row is emitted
    total = (detail.repartition(1)
             .map_batches(to_total, batch_format="pyarrow",
                          batch_size=None))
    return detail.union(by_status).union(by_priority).union(total)


def corr_stats(ds):
    """Integer-exact Pearson/covariance COMPONENTS of (quantity,
    discount-pct) per l_returnflag: n and the five moment sums a
    correlation or OLS slope needs — the distributed-statistics
    primitive done the only way that hash-matches at any parallelism
    (float accumulation is order-dependent; these are pure int64 sums
    of small integers, overflow-free at 10^12 rows).

    One per-batch numpy combiner collapses each block to <=|flags|
    rows; the global groupby moves almost nothing.  The driver-side
    finish (corr = (n*Sxy - Sx*Sy) / sqrt(...)) is one row of math the
    caller does on the tiny output."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        q = np.floor(b["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        d = np.floor(b["l_discount"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pylist(),
            "p_n": 1, "p_q": q, "p_d": d, "p_qd": q * d,
            "p_q2": q * q, "p_d2": d * d})
        g = df.groupby("l_returnflag", as_index=False).agg(
            p_n=("p_n", "sum"), p_q=("p_q", "sum"), p_d=("p_d", "sum"),
            p_qd=("p_qd", "sum"), p_q2=("p_q2", "sum"),
            p_d2=("p_d2", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("p_n", alias_name="n_rows"),
                       Sum("p_q", alias_name="sum_qty"),
                       Sum("p_d", alias_name="sum_disc"),
                       Sum("p_qd", alias_name="sum_qty_disc"),
                       Sum("p_q2", alias_name="sum_qty_sq"),
                       Sum("p_d2", alias_name="sum_disc_sq")))


def json_field_agg(ds, key: str = "k"):
    """JSON field extraction + aggregation over the ``props`` payload
    column: (event_type, n_events, sum_k) with k pulled out of each
    row's JSON string — the "typed column out of a semi-structured
    payload" primitive every event pipeline needs.

    Hot path is a single vectorized RE2 ``pc.extract_regex`` for the
    flat integer field (``"key": N`` — exactly what the testdata and
    most telemetry payloads carry), NOT a per-row json.loads loop; the
    DuckDB oracle uses real ``json_extract`` so parity proves the fast
    path agrees with a full parser on this shape.  Nested/escaped
    payloads need the full parse — run ``json.loads`` inside a
    map_batches actor stage instead; this kernel documents that
    boundary rather than hiding it.  Missing keys count as 0 in the
    sum (COALESCE on the SQL side).  Combiner partials per batch, one
    tiny groupby — no row-level shuffle."""
    import re as _re

    from ray.data.aggregate import Sum

    pat = '"' + _re.escape(key) + r'"\s*:\s*(?P<v>-?\d+)'

    def partial(b: pa.Table) -> pa.Table:
        ext = pc.extract_regex(b["props"], pat)
        # named capture 'v'; the struct row is null when no match
        vals = pc.struct_field(ext, "v")
        k = pc.coalesce(pc.cast(vals, pa.int64()),
                        pa.scalar(0, pa.int64())).to_numpy(
                            zero_copy_only=False)
        df = (pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                            "p_n": 1, "p_k": k})
              .groupby("event_type", as_index=False)
              .agg(p_n=("p_n", "sum"), p_k=("p_k", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("p_n", alias_name="n_events"),
                       Sum("p_k", alias_name="sum_k")))


def bloom_semi_join(customer_ds, orders_ds,
                    min_total: float = HIGH_VALUE_ORDER,
                    bloom_bits: int = 1 << 20,
                    num_partitions: int = 8):
    """Bloom-prefiltered semi join — the 100 TB shape for "probe side
    too big to broadcast exactly, build side too big to shuffle whole":
    identical OUTPUT to ``customers_with_orders`` (the exact join
    removes bloom false positives; blooms have no false negatives), but
    the all-to-all exchange only ever sees left rows that PASS the
    bloom, and driver memory is the CONSTANT filter size (128 KiB at
    the default 2^20 bits), never the key set.

      1. build: per-batch partial Bloom over the qualifying right keys
         (one fixed-size binary row per batch); segments OR-merge
         DISTRIBUTED down to <= 32 rows, then the driver ORs those —
         bytes held = one filter, bytes pulled = bounded, never keys;
      2. prefilter: ``ray.put`` the merged bits once; left batches
         drop non-members before the exchange;
      3. verify: native left_semi on the survivors gives exactness.
    At 10 bits/key the filter prunes ~99% of non-matching left rows
    from the shuffle; sizing follows state/bloom.py's arithmetic."""
    import ray

    from govuk_crawler_worker_ray.state.bloom import BloomFilter

    # k tuned for ~10 bits/key occupancy (state/bloom.py arithmetic)
    num_hashes = BloomFilter(expected_keys=max(bloom_bits // 10, 1)
                             ).num_hashes

    def build_partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter.empty(bloom_bits, num_hashes)
        keep = pc.greater_equal(b["o_totalprice"], min_total)
        keys = (b.filter(keep)["o_custkey"]
                .to_numpy(zero_copy_only=False).astype(np.uint64))
        bf.add_many(keys)
        return pa.table({"bloom": pa.array([bf.bits.tobytes()],
                                           pa.binary())})

    # two-level OR-merge: partial segments first combine DISTRIBUTED
    # (content-hashed into <= 32 groups, one OR per group inside
    # map_groups), so the driver pulls a bounded ~32 x 128 KiB no
    # matter how many build batches ran — at 10^6 batches a flat
    # driver merge would stream ~128 GB through one socket
    def tag(b: pa.Table) -> pa.Table:
        part = [zlib.crc32(x) % 32 for x in b["bloom"].to_pylist()]
        return b.append_column("part", pa.array(part, pa.int64()))

    def or_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(bloom_bits // 64, dtype=np.uint64)
        for row in g["bloom"]:
            acc |= np.frombuffer(row, dtype=np.uint64)
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    merged = np.zeros(bloom_bits // 64, dtype=np.uint64)
    for seg in (orders_ds.map_batches(build_partial,
                                      batch_format="pyarrow")
                .map_batches(tag, batch_format="pyarrow")
                .groupby("part")
                .map_groups(or_group, batch_format="pandas")
                .iter_batches(batch_format="pyarrow")):
        for row in seg["bloom"].to_pylist():
            merged |= np.frombuffer(row, dtype=np.uint64)
    bits_ref = ray.put(merged)

    def prefilter(b: pa.Table) -> pa.Table:
        bf = BloomFilter.from_bits(ray.get(bits_ref), num_hashes)
        keys = (b["c_custkey"].to_numpy(zero_copy_only=False)
                .astype(np.uint64))
        mask = bf.contains_many(keys)
        return b.filter(pa.array(mask)).select(["c_custkey", "c_name"])

    survivors = customer_ds.map_batches(prefilter,
                                        batch_format="pyarrow")
    return customers_with_orders(survivors, orders_ds,
                                 min_total=min_total,
                                 num_partitions=num_partitions)


def user_retention(ds, num_partitions: int | None = None):
    """Daily retention ladder over the events table: per day,
    (n_active, n_new, n_retained, n_churned) — active = distinct users
    that day, new = first-ever active day, retained = also active the
    previous calendar day, churned = previous PRESENT day's actives
    minus that day's retained (days with zero activity don't emit
    rows, so churn is relative to the previous day that exists — both
    sides compute it identically over the same present days).

    Plan: per-batch partial distinct (user, day) -> ONE hash exchange
    on user (each user's full day history must co-locate; first/prev
    are per-user sequences) -> per-partition vectorized pandas
    dedup + min/shift -> per-day integer partials -> tiny groupby(day)
    -> single-batch final pass derives churn from the lagged active
    counts (the events_pivot repartition(1) shape: |days| rows).
    All-integer output, so parity with the SQL window oracle is
    exact."""
    from ray.data.aggregate import Sum

    if num_partitions is None:
        from .blocks import default_partitions

        num_partitions = default_partitions()

    def partial(b: pa.Table) -> pa.Table:
        days = (b["ts"].cast(pa.int64()).to_numpy()
                // (86400 * 1_000_000))
        users = b["user_id"].to_numpy(zero_copy_only=False)
        df = (pd.DataFrame({"user_id": users, "day": days})
              .drop_duplicates())
        df["part"] = (df["user_id"].to_numpy().astype(np.int64)
                      % num_partitions)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["user_id", "day"])
             .sort_values(["user_id", "day"]))
        grp = g.groupby("user_id", sort=False)
        first = grp["day"].transform("min")
        prev = grp["day"].shift()
        out = pd.DataFrame({
            "day": g["day"],
            "p_active": 1,
            "p_new": (g["day"] == first).astype(np.int64),
            "p_retained": (g["day"] == prev + 1).astype(np.int64),
        })
        return (out.groupby("day", as_index=False)
                .agg(p_active=("p_active", "sum"),
                     p_new=("p_new", "sum"),
                     p_retained=("p_retained", "sum")))

    daily = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("part")
             .map_groups(per_user, batch_format="pandas")
             .groupby("day")
             .aggregate(Sum("p_active", alias_name="n_active"),
                        Sum("p_new", alias_name="n_new"),
                        Sum("p_retained", alias_name="n_retained")))

    def churn(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b["day"])
        b = b.take(order)
        act = b["n_active"].to_numpy()
        ret = b["n_retained"].to_numpy()
        prev_act = np.concatenate(([0], act[:-1]))
        return pa.table({
            "day": b["day"], "n_active": b["n_active"],
            "n_new": b["n_new"], "n_retained": b["n_retained"],
            "n_churned": pa.array(prev_act - ret, pa.int64()),
        })

    # |distinct days| rows — single batch is the right final shape
    return daily.repartition(1).map_batches(churn,
                                            batch_format="pyarrow",
                                            batch_size=None)


def salted_skew_join(fact_ds, dim_ds, on: str, spread_col: str,
                     right_on: str | None = None, num_salts: int = 8,
                     hot_frac: float = 0.05, num_partitions: int = 8):
    """Skew-aware INNER equi-join of a hot-keyed fact table against a
    dimension: the salted-key split the north rule names for mega-hosts
    like www.gov.uk (reference: the worker fleet shares one queue, so
    one hot host serializes it — workflow.go:57-151's per-item loop has
    no skew story at all; here the skew treatment is explicit).

    Mechanism (classic salted skew join, one pass over the fact side):
      1. HOT-KEY CENSUS — exact per-key fact counts via a narrow
         projected ``map_batches`` partial + one tiny ``groupby`` merge;
         only keys holding >= ``hot_frac`` of the fact rows come back
         to the driver (bounded by 1/hot_frac keys, NOT key
         cardinality).
      2. FACT SALT — hot-key fact rows get ``__gcw_salt`` =
         crc32(spread_col) % num_salts (stable row-content hash, the
         ``count_by_host_salted`` precedent), cold rows salt 0, so one
         hot key fans across ``num_salts`` join partitions instead of
         one.
      3. DIM REPLICATE — hot-key dim rows are repeated once per salt
         (|hot| x num_salts extra rows — tiny), cold dim rows salt 0.
      4. ONE hash-shuffle ``Dataset.join`` on (key, salt); the salt
         columns are dropped from the output.

    Versus the hot/cold broadcast split, this keeps a SINGLE pass over
    the fact lineage and a single exchange, and needs no driver copy of
    any dim payload.  Output schema: fact columns ++ dim payload
    columns (suffix "_r" on collisions)."""
    import ray
    from ray.data.aggregate import Sum

    right_on = right_on or on

    def key_partial(b: pa.Table) -> pa.Table:
        ks, cnt = np.unique(np.asarray(b[on].to_pylist(), dtype=object),
                            return_counts=True)
        return pa.table({"k": pa.array(list(ks)),
                         "pn": pa.array(cnt, pa.int64())})

    counts = (fact_ds.map_batches(key_partial, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("pn", alias_name="n")))
    ct = pa.concat_tables(
        b for b in counts.iter_batches(batch_format="pyarrow"))
    total = pc.sum(ct["n"]).as_py() or 0
    cut = max(1, int(hot_frac * total))
    hot = set(ct.filter(pc.greater_equal(ct["n"], cut))["k"].to_pylist())
    hot_ref = ray.put(hot)

    def fact_salt(b: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = np.array([k in hs for k in b[on].to_pylist()], dtype=bool)
        salt = np.zeros(len(b), dtype=np.int32)
        if mask.any():
            sp = b[spread_col].to_pylist()
            salt[mask] = [zlib.crc32(str(sp[i]).encode()) % num_salts
                          for i in np.flatnonzero(mask)]
        return b.append_column("__gcw_salt",
                               pa.array(salt, pa.int32()))

    def dim_salt(b: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = np.array([k in hs for k in b[right_on].to_pylist()],
                        dtype=bool)
        reps = np.where(mask, num_salts, 1)
        idx = np.repeat(np.arange(len(b)), reps)
        # within each replicated run, salts 0..num_salts-1
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        salt = (np.arange(len(idx))
                - np.repeat(starts, reps)).astype(np.int32)
        out = b.take(pa.array(idx, pa.int64()))
        return out.append_column("__gcw_salt_r",
                                 pa.array(salt, pa.int32()))

    fact = fact_ds.map_batches(fact_salt, batch_format="pyarrow")
    dim = dim_ds.map_batches(dim_salt, batch_format="pyarrow")
    joined = fact.join(dim, "inner", num_partitions=num_partitions,
                       on=(on, "__gcw_salt"),
                       right_on=(right_on, "__gcw_salt_r"),
                       left_suffix="", right_suffix="_r")

    def strip(b: pa.Table) -> pa.Table:
        drop = [c for c in b.column_names
                if c.startswith("__gcw_salt") or c == right_on + "_r"
                or (right_on != on and c == right_on)]
        return b.drop_columns(drop)

    return joined.map_batches(strip, batch_format="pyarrow")
