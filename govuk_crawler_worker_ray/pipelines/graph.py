"""Link-graph analytics over the crawl's own output.

PageRank (Brin & Page 1998) over the extracted-link edge list — the
classic crawl-curation quality signal (link centrality weights docs
for training-data selection).  The implementation is Dataset-resident
and iterative, the same shape as
``dedup.connected_components_distributed``: per iteration ONE hash
join (edges x ranks on src) and ONE pre-aggregated groupby(dst); only
narrow (url, int64) rows move, and ranks materialize once per
iteration to cut lineage.

Arithmetic is INTEGER-EXACT so the approximate-looking operator still
hash-matches an ANSI-SQL twin (the kmv_distinct precedent): ranks are
micro-units, each edge contributes ``rank // out_degree`` (floor), and
the damping update is ``0.15 * SCALE + (85 * in_sum) // 100`` — all
int64/int128-safe floor ops with identical semantics in numpy and
DuckDB.  Dangling-node mass leaks (the standard simplification),
identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PR_SCALE = 1_000_000
PR_DAMP_NUM = 85     # damping 0.85 as an exact integer ratio
PR_BASE = PR_SCALE * (100 - PR_DAMP_NUM) // 100


def _join_parts(ds) -> int:
    try:
        return max(2, min(ds.num_blocks(), 16))
    except Exception:
        return 8


from .blocks import nonempty_blocks as _nonempty_blocks


def pagerank(edges_ds, iterations: int = 5,
             broadcast_limit: int = 500_000,
             distributed: bool | None = None):
    """edges (src: string, dst: string) -> (url, rank_micros) after
    ``iterations`` damped update rounds from a uniform PR_SCALE start.

    Auto-switches plans on edge count (the distinctive_terms
    precedent): below ``broadcast_limit`` edges the whole iteration
    runs as one vectorized numpy kernel on the driver — the iterative
    join plan pays ~2 fixed-cost hash joins PER ITERATION, which
    dominates wall time on small graphs (measured 19.7 s for a
    367-node graph at 32 CPUs vs <0.1 s broadcast) — while the
    Dataset-resident join path remains for graphs that can't sit in
    one heap.  Both paths are integer-exact and bit-identical
    (np.add.at accumulation, never float bincount weights)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if distributed is None:
        # materialize before the switch: count() would otherwise
        # execute the lazy lineage once and the chosen path a second
        # time (the distinctive_terms auto-switch lesson)
        edges_ds = edges_ds.materialize()
        distributed = edges_ds.count() > broadcast_limit
    if not distributed:
        df = edges_ds.select_columns(["src", "dst"]).to_pandas()
        if not len(df):
            return rd.from_arrow(pa.table({
                "url": pa.array([], pa.string()),
                "rank_micros": pa.array([], pa.int64())}))
        both = np.concatenate([df["src"].to_numpy(),
                               df["dst"].to_numpy()])
        urls, codes = np.unique(both, return_inverse=True)
        m = len(df)
        src_c, dst_c = codes[:m], codes[m:]
        n = len(urls)
        od = np.bincount(src_c, minlength=n).astype(np.int64)
        r = np.full(n, PR_SCALE, np.int64)
        for _ in range(iterations):
            contrib = r[src_c] // od[src_c]
            insum = np.zeros(n, np.int64)
            np.add.at(insum, dst_c, contrib)
            r = PR_BASE + (PR_DAMP_NUM * insum) // 100
        # Dataset from BOTH paths (callers chain the Dataset API)
        return rd.from_arrow(pa.table({
            "url": pa.array(urls, pa.string()),
            "rank_micros": pa.array(r, pa.int64())}))

    P = _join_parts(edges_ds)
    # deg/insum are groupby outputs: compact away zero-schema empty
    # partitions before each join (see blocks.nonempty_blocks)
    deg = _nonempty_blocks(
        edges_ds.groupby("src").aggregate(Count(alias_name="od")))
    if deg is None:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "rank_micros": pa.array([], pa.int64())}))
    # the JOIN OUTPUT also carries zero-schema blocks for partitions
    # no row hashed to — compact it too before it feeds the iteration
    # joins (it wanted a materialize anyway)
    edges = _nonempty_blocks(edges_ds.join(deg, "inner",
                                           num_partitions=P,
                                           on=("src",)))
    if edges is None:
        # unreachable today (deg non-empty implies a non-empty inner
        # join with its own source), but guard the invariant so a
        # future edit can't turn it into an AttributeError mid-loop
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "rank_micros": pa.array([], pa.int64())}))

    def explode_nodes(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["src"].combine_chunks(),
                              b["dst"].combine_chunks()])
        return pa.table({"url": u})

    nodes = _nonempty_blocks(
        edges_ds.map_batches(explode_nodes, batch_format="pyarrow")
        .groupby("url").aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"]))

    ranks = nodes.map_batches(
        lambda b: pa.table({
            "url": b["url"],
            "rank_micros": pa.array(
                np.full(b.num_rows, PR_SCALE, np.int64), pa.int64()),
        }), batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = edges.join(ranks, "inner", num_partitions=P,
                            on=("src",), right_on=("url",))

        def contrib(b: pa.Table) -> pa.Table:
            r = b["rank_micros"].to_numpy()
            od = b["od"].to_numpy()
            return pa.table({
                "dst": b["dst"],
                "c": pa.array(r // od, pa.int64()),
            })

        insum = _nonempty_blocks(
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst").aggregate(Sum("c", alias_name="inp")))
        if insum is None:
            # no in-contributions anywhere: every rank decays to base
            ranks = nodes.map_batches(
                lambda b: pa.table({
                    "url": b["url"],
                    "rank_micros": pa.array(
                        np.full(b.num_rows, PR_BASE, np.int64),
                        pa.int64())}),
                batch_format="pyarrow").materialize()
            continue
        merged = nodes.join(insum, "left_outer", num_partitions=P,
                            on=("url",), right_on=("dst",))

        def update(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # fill nulls in Arrow, not pandas: the pandas round-trip
            # goes through float64 and loses int64 exactness past 2^53
            # (reachable at 10^10-node in-sums)
            inp = pc.fill_null(pc.cast(b["inp"], pa.int64()),
                               0).to_numpy(zero_copy_only=False)
            return pa.table({
                "url": b["url"],
                "rank_micros": pa.array(
                    PR_BASE + (PR_DAMP_NUM * inp) // 100, pa.int64()),
            })

        ranks = _nonempty_blocks(
            merged.map_batches(update, batch_format="pyarrow"))
    return ranks


def degree_stats(edges_ds):
    """edges (src: string, dst: string) -> (url, out_degree, in_degree)
    for every node in the link graph (missing side = 0) — the standard
    crawl-graph health signal (dangling pages have out_degree 0, orphan
    pages in_degree 0; both feed curation filters alongside
    ``pagerank``).

    Shape for 10^10 edges: each edge explodes to two (url, out?, in?)
    indicator rows — pre-aggregated per batch so the exchange is
    node-sized, then ONE groupby(url) with two Sum partials.  No joins
    at all (the first version paid two fixed-cost hash joins; an
    indicator-sum over the exploded union is strictly narrower)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def explode_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        u = pa.concat_arrays([b["src"].combine_chunks(),
                              b["dst"].combine_chunks()])
        o = np.concatenate([np.ones(n, np.int64),
                            np.zeros(n, np.int64)])
        df = pd.DataFrame({"url": u.to_pandas().to_numpy(), "o": o})
        g = df.groupby("url", as_index=False).agg(
            po=("o", "sum"), pn=("o", "size"))
        return pa.table({
            "url": pa.array(g["url"].to_numpy(), pa.string()),
            "po": pa.array(g["po"].to_numpy().astype(np.int64),
                           pa.int64()),
            "pi": pa.array((g["pn"] - g["po"]).to_numpy()
                           .astype(np.int64), pa.int64()),
        })

    return (edges_ds.map_batches(explode_partial, batch_format="pyarrow")
            .groupby("url")
            .aggregate(Sum("po", alias_name="out_degree"),
                       Sum("pi", alias_name="in_degree")))


def _triangle_broadcast(edges_ds, wedge_budget: int):
    """Driver-side numpy kernel for small graphs: same census as the
    join plan (canonical distinct undirected edges, true wedge total
    from degrees, node-ordered wedge enumeration + closure check),
    computed in one heap.  Returns None when the ORIENTED wedge
    fan-out (sum over nodes of C(out_deg, 2) under id orientation)
    exceeds ``wedge_budget`` — the enumeration array wouldn't fit, so
    the caller falls through to the streaming join plan."""
    df = edges_ds.select_columns(["src", "dst"]).to_pandas()
    empty = pa.table({
        "n_wedges": pa.array([0], pa.int64()),
        "n_triangles": pa.array([0], pa.int64()),
        "gcc_ppm": pa.array([0], pa.int64()),
    })
    if not len(df):
        return empty
    both = np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
    _, codes = np.unique(both, return_inverse=True)
    m = len(df)
    s, d = codes[:m], codes[m:]
    n = int(codes.max()) + 1
    # canonical distinct undirected edges: lo < hi, no self loops
    lo = np.minimum(s, d).astype(np.int64)
    hi = np.maximum(s, d).astype(np.int64)
    keep = lo != hi
    key = np.unique(lo[keep] * n + hi[keep])  # sorted: by lo, then hi
    if not len(key):
        return empty
    lo, hi = key // n, key % n
    # true wedge total from undirected degrees
    deg = (np.bincount(lo, minlength=n)
           + np.bincount(hi, minlength=n)).astype(np.int64)
    n_wedges = int((deg * (deg - 1) // 2).sum())
    # CSR oriented lo -> hi (neighbors above each node, sorted)
    starts = np.searchsorted(lo, np.arange(n + 1))
    k = starts[1:] - starts[:-1]
    # each oriented edge e (node x's i-th neighbor) opens wedges
    # (hi[e], z) for every LATER neighbor z of x — b < c for free
    pos = np.arange(len(lo)) - starts[lo]
    rep = k[lo] - 1 - pos
    if int(rep.sum()) > wedge_budget:
        return None
    bcol = np.repeat(hi, rep)
    if len(bcol):
        first = np.cumsum(rep) - rep
        idx = (np.arange(len(bcol)) - np.repeat(first, rep)
               + np.repeat(np.arange(len(lo)) + 1, rep))
        ccol = hi[idx]
        wkey = bcol * n + ccol
        p = np.searchsorted(key, wkey)
        p_cl = np.minimum(p, len(key) - 1)
        n_tri = int(((p < len(key)) & (key[p_cl] == wkey)).sum())
    else:
        n_tri = 0
    gcc_ppm = (3_000_000 * n_tri) // n_wedges if n_wedges else 0
    return pa.table({
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "gcc_ppm": pa.array([gcc_ppm], pa.int64()),
    })


def triangle_count(edges_ds, broadcast_limit: int = 500_000,
                   wedge_budget: int = 20_000_000,
                   distributed: bool | None = None):
    """Global triangle census of the link graph (undirected): ONE row
    (n_wedges, n_triangles, gcc_ppm) — wedge count, triangle count, and
    the global clustering coefficient 3*T/W in exact parts-per-million
    (integer floor division, so the approximate-looking ratio still
    hash-matches the SQL twin).  Triangle density is the standard
    link-farm / template-cluster signal for crawl curation.

    Plan (node-ordered wedge enumeration, Schank & Wagner 2005):
      1. canonicalize to distinct undirected edges (a < b, no self
         loops) — per-batch Arrow dedup combiner, then ONE
         groupby(a, b);
      2. wedges centered at each edge's smaller endpoint via ONE
         self-join on ``a`` (each triangle x<y<z enumerated exactly
         once as wedge (y, z) centered at x), filtered to b < c;
      3. closure check = ONE inner join of wedges against the edge
         list on the composite (b, c) key, counted — never collected;
      4. true wedge total from the degree table (degree_stats shape:
         exploded indicator combiner + ONE groupby), summed per batch.
    At 10^10 edges the id-orientation of step 2 inherits hub skew
    (sum of out-deg^2); the documented fix is degree-orientation
    (orient each edge toward the higher-(degree, id) endpoint), which
    bounds wedge fan-out by O(m^1.5) at the price of one extra
    degree join — same count either way.

    Auto-switches on edge count (the pagerank/bfs_depth precedent):
    below ``broadcast_limit`` edges the census runs as one numpy
    kernel on the driver — the join plan pays 2 fixed-cost hash joins
    + 3 groupbys that dominate on small graphs (measured 5.7 s for
    the 300-page fixture graph at 32 CPUs vs <0.1 s broadcast) —
    unless the oriented wedge fan-out exceeds ``wedge_budget`` (hub
    skew), in which case it falls through to the streaming join plan.
    Both paths are integer-exact and count-identical."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    if distributed is None:
        # materialize before the switch (see pagerank): avoid double
        # execution of the lazy edge lineage
        edges_ds = edges_ds.materialize()
        distributed = edges_ds.count() > broadcast_limit
    if not distributed:
        out = _triangle_broadcast(edges_ds, wedge_budget)
        if out is not None:
            return out
        # wedge fan-out over budget: stream it instead

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks()
        d = b["dst"].combine_chunks()
        lt = pc.less(s, d)
        t = pa.table({
            "a": pc.if_else(lt, s, d),
            "b": pc.if_else(lt, d, s),
        }).filter(pc.invert(pc.equal(s, d)))
        return t.group_by(["a", "b"]).aggregate([])

    edges = (edges_ds.map_batches(canon, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    P = _join_parts(edges)

    # wedge total from degrees: sum over nodes of deg*(deg-1)//2
    def explode_deg(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["a"].combine_chunks(),
                              b["b"].combine_chunks()])
        df = pd.DataFrame({"url": u.to_pandas().to_numpy()})
        g = df.groupby("url", as_index=False).agg(c=("url", "size"))
        return pa.table({
            "url": pa.array(g["url"].to_numpy(), pa.string()),
            "c": pa.array(g["c"].to_numpy().astype(np.int64),
                          pa.int64()),
        })

    deg = (edges.map_batches(explode_deg, batch_format="pyarrow")
           .groupby("url").aggregate(Sum("c", alias_name="deg")))

    def wedge_partial(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy()
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    wrows = deg.map_batches(wedge_partial,
                            batch_format="pyarrow").aggregate(Sum("w"))
    n_wedges = int(wrows["sum(w)"] or 0)

    # wedges centered at the smaller endpoint: self-join on a, b < c
    right = edges.map_batches(
        lambda t: t.rename_columns(["a2", "c"]), batch_format="pyarrow")
    wedges = (edges.join(right, "inner", num_partitions=P,
                         on=("a",), right_on=("a2",))
              .map_batches(
                  lambda t: t.filter(pc.less(t["b"], t["c"]))
                  .select(["b", "c"]),
                  batch_format="pyarrow")
              .materialize())
    n_w = wedges.count()
    if n_w == 0:
        n_tri = 0
    else:
        # same ray 2.49 hash_shuffle quirk dup_spans documents: a
        # join side whose FIRST dispatched block is empty never
        # broadcasts its schema and the aggregator crashes — compact
        # both sides to provably non-empty blocks (one extra narrow
        # (b, c)-pair exchange; rows are 2 short strings)
        wedges = wedges.repartition(
            max(1, min(P, (n_w + 65535) // 65536)))
        closure = (edges.map_batches(
            lambda t: t.rename_columns(["x", "y"]),
            batch_format="pyarrow")
            .repartition(max(1, min(P, (edges.count() + 65535)
                                    // 65536))))
        closed = wedges.join(closure, "inner", num_partitions=P,
                             on=("b", "c"), right_on=("x", "y"))
        n_tri = closed.count()

    gcc_ppm = (3_000_000 * n_tri) // n_wedges if n_wedges else 0
    return pa.table({
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "gcc_ppm": pa.array([gcc_ppm], pa.int64()),
    })


def bfs_depth(edges_ds, seeds_ds, max_depth: int = 64,
              broadcast_limit: int = 500_000,
              distributed: bool | None = None):
    """edges (src, dst) + seeds (url) -> (url, depth): the minimum
    number of link hops from any seed — the crawl TIER of every
    reachable page (reference semantics: pages enter the frontier the
    round their first parent is fetched, workflow.go:254-296;
    ``depth`` is exactly that round index under unlimited budget).
    Unreachable pages are absent.

    Level-synchronous distributed BFS: per level ONE hash join
    (edges x frontier on src, so only the frontier's out-edges move),
    one distinct-dst groupby, one native ``left_anti`` against the
    visited set.  All exchanged rows are narrow (url, int64); visited
    materializes once per level to cut lineage.  Levels = graph
    diameter, each level's cost proportional to its frontier — the
    textbook Pregel/BSP shape, no all-to-all over the full graph.

    Auto-switches on edge count (the pagerank precedent): the join
    plan pays ~2 fixed-cost hash joins PER LEVEL, which dominates on
    small graphs (measured 21.9 s for a 367-node / 15-level graph at
    32 CPUs vs <0.1 s broadcast); below ``broadcast_limit`` edges the
    BFS runs as one CSR-array frontier sweep on the driver —
    bit-identical depths either way."""
    import ray.data as rd
    from ray.data.aggregate import Count

    if distributed is None:
        # materialize before the switch (see pagerank): avoid double
        # execution of the lazy edge lineage
        edges_ds = edges_ds.materialize()
        distributed = edges_ds.count() > broadcast_limit
    if not distributed:
        df = edges_ds.select_columns(["src", "dst"]).to_pandas()
        seeds = seeds_ds.select_columns(["url"]).to_pandas()
        if not len(seeds):
            raise ValueError("bfs_depth: empty seed set")
        both = np.concatenate([df["src"].to_numpy(),
                               df["dst"].to_numpy(),
                               seeds["url"].to_numpy()])
        urls, codes = np.unique(both, return_inverse=True)
        m = len(df)
        src_c, dst_c = codes[:m], codes[m:2 * m]
        seed_c = np.unique(codes[2 * m:])
        n = len(urls)
        # CSR adjacency: out-edges sorted by src
        order = np.argsort(src_c, kind="stable")
        dst_sorted = dst_c[order]
        starts = np.searchsorted(src_c[order], np.arange(n + 1))
        depth = np.full(n, -1, np.int64)
        depth[seed_c] = 0
        frontier = seed_c
        for d in range(1, max_depth + 1):
            if not len(frontier):
                break
            nxt_parts = [dst_sorted[starts[u]:starts[u + 1]]
                         for u in frontier]
            nxt = np.unique(np.concatenate(nxt_parts)) if nxt_parts \
                else np.array([], np.int64)
            nxt = nxt[depth[nxt] < 0]
            if not len(nxt):
                break
            depth[nxt] = d
            frontier = nxt
        keep = depth >= 0
        # Dataset from BOTH paths (callers chain the Dataset API)
        return rd.from_arrow(pa.table({
            "url": pa.array(urls[keep], pa.string()),
            "depth": pa.array(depth[keep], pa.int64()),
        }))

    P = _join_parts(edges_ds)

    def tag(depth: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "url": b["url"],
                "depth": pa.array(
                    np.full(b.num_rows, depth, np.int64), pa.int64()),
            })
        return fn

    def distinct(ds, col: str):
        return (ds.groupby(col).aggregate(Count(alias_name="_n"))
                .drop_columns(["_n"]))

    frontier = _nonempty_blocks(
        distinct(seeds_ds.select_columns(["url"]), "url")
        .map_batches(tag(0), batch_format="pyarrow"))
    if frontier is None:
        raise ValueError("bfs_depth: empty seed set")
    visited = frontier
    for d in range(1, max_depth + 1):
        nxt = edges_ds.join(frontier.drop_columns(["depth"]), "inner",
                            num_partitions=P, on=("src",),
                            right_on=("url",))
        cand = _nonempty_blocks(distinct(
            nxt.map_batches(
                lambda b: pa.table({"url": b["dst"]}),
                batch_format="pyarrow"), "url"))
        if cand is None:
            break
        frontier = _nonempty_blocks(
            cand.join(visited.drop_columns(["depth"]), "left_anti",
                      num_partitions=P, on=("url",))
            .map_batches(tag(d), batch_format="pyarrow"))
        if frontier is None:
            break
        visited = visited.union(frontier).materialize()
    return visited


def bfs_depth_oracle_sql(edges_sql: str, seeds_sql: str,
                         max_depth: int = 64) -> str:
    """ANSI-SQL twin: recursive CTE enumerating every (url, depth)
    reachable within ``max_depth`` hops, then min per url."""
    return (
        f"WITH RECURSIVE r(url, depth) AS ("
        f"SELECT url, CAST(0 AS BIGINT) AS depth FROM ({seeds_sql}) "
        f"UNION "
        f"SELECT e.dst, r.depth + 1 FROM r "
        f"JOIN ({edges_sql}) e ON e.src = r.url "
        f"WHERE r.depth < {max_depth}) "
        f"SELECT url, CAST(min(depth) AS BIGINT) AS depth "
        f"FROM r GROUP BY url")


def pagerank_oracle_sql(edges_sql: str, iterations: int = 5) -> str:
    """ANSI-SQL twin: the same integer update unrolled as chained CTEs
    over ``edges_sql`` (a SELECT yielding (src, dst))."""
    parts = [
        f"WITH e AS ({edges_sql}), ",
        "d AS (SELECT src, count(*) AS od FROM e GROUP BY src), ",
        "n AS (SELECT DISTINCT url FROM (SELECT src AS url FROM e "
        "UNION ALL SELECT dst FROM e)), ",
        f"r0 AS (SELECT url, CAST({PR_SCALE} AS BIGINT) AS r FROM n)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f", r{i} AS (SELECT n.url, CAST({PR_BASE} + "
            f"({PR_DAMP_NUM} * COALESCE(s.inp, 0)) // 100 AS BIGINT) "
            f"AS r FROM n LEFT JOIN (SELECT e.dst, "
            f"sum(r{i - 1}.r // d.od) AS inp FROM e "
            f"JOIN d ON e.src = d.src JOIN r{i - 1} "
            f"ON r{i - 1}.url = e.src GROUP BY e.dst) s "
            "ON s.dst = n.url)")
    parts.append(f" SELECT url, r AS rank_micros FROM r{iterations}")
    return "".join(parts)
