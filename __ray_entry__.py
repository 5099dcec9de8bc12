"""Driver contract for the Ray-Data crawl/data-processing engine.

``entry()`` runs the flagship round-based crawl over the deterministic
synthetic corpus fixture through the distributed fetch pool;
``queries()`` exposes each operator from SURVEY.md §2 (+ the north-rule
training-data ops) as a callable over ``sf_dir``; ``oracle_sql()`` gives
the DuckDB-equivalent SQL (crawl goldens come from the sequential
pure-Python oracle, persisted as parquet the SQL reads back).

Ray is initialised by the caller BEFORE import; nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FIXTURE_DIR = "/tmp/gcw_fixtures/small"
FIXTURE_PAGES = 300
FIXTURE_SEED = 42

_crawl_cache: dict[str, Any] = {}


def _fixture() -> str:
    from govuk_crawler_worker_ray.corpusgen import write_fixture

    return write_fixture(FIXTURE_DIR, n_pages=FIXTURE_PAGES,
                         seed=FIXTURE_SEED)


def _run_fixture_crawl(threshold: int = 1000):
    """Run the engine over the fixture once; memoize (order/seen/mirror
    served from the same run)."""
    key = f"crawl_{threshold}"
    if key in _crawl_cache:
        return _crawl_cache[key]
    import pyarrow.parquet as pq

    from govuk_crawler_worker_ray.config import CrawlConfig
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS
    from govuk_crawler_worker_ray.pipelines.crawl import CrawlEngine

    d = _fixture()
    corpus = pq.read_table(os.path.join(d, "corpus.parquet"))
    seeds = pq.read_table(os.path.join(d, "seeds.parquet"))[
        "url"].to_pylist()
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    out = f"/tmp/gcw_entry_out/t{threshold}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    eng = CrawlEngine(corpus, cfg, out, use_ray=True,
                      small_round_threshold=threshold)
    try:
        res = eng.run(seeds)
        seen_tbl = res.seen.to_table()
        mirror = res.mirror_table()
        _crawl_cache[key] = (res.crawl_order, seen_tbl, mirror)
    finally:
        eng.shutdown()
    return _crawl_cache[key]


def entry() -> Any:
    """Flagship: the distributed crawl (fetch pool + seen shards) over the
    synthetic fixture; returns the crawl-order table."""
    order, _, _ = _run_fixture_crawl(threshold=0)
    return order.to_pandas()


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _read_sized(path: str, columns: list[str] | None = None):
    """read_parquet with a size-scaled block count.  Three measured
    failure modes bracket this choice: Ray's default splitting shatters
    small files into ~100-row blocks (groupby becomes a tiny-task
    shuffle matrix — 31s for 5000 rows at 32 CPUs); a 1-block read
    serializes every downstream map stage; and a CPU-width split of a
    SMALL file makes every sort-aggregate pay per-partition fixed cost
    (measured at sf0.1/32 CPUs: dedup_exact 3.6s at 32 blocks vs 0.5s
    at 8; minhash 11.4s vs 3.5s — the vectorized kernels no longer need
    machine-width parallelism on small inputs, but the shuffle matrix
    still charges blocks^2).  Policy: floor 8, grow one block per 8 MiB
    so big inputs still fan out to (and past) CPU width, cap at
    4x CPUs."""
    import ray
    import ray.data as rd

    try:
        ncpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpus = 4
    size = os.path.getsize(path)
    blocks = min(max(8, size // (8 << 20)), max(4 * ncpus, 8))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=int(blocks))


def _docs(sf_dir: str):
    # prune at the read: no pipeline consumes source/n_chars (verified);
    # queries needing narrower slices do their own _read_sized
    return _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang"])


def _events(sf_dir: str):
    # props (a wide JSON string) is consumed by no pipeline — never
    # read it
    return _read_sized(os.path.join(sf_dir, "events.parquet"),
                       columns=["event_id", "ts", "user_id",
                                "event_type", "value"])


def _q_dedup_exact(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_token_count(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import token_counts

    return token_counts(_docs(sf_dir))


def _q_text_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import text_stats

    return text_stats(_docs(sf_dir))


def _q_quality(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        quality_scores,
    )

    return quality_scores(_docs(sf_dir))


def _q_lang_hist(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        lang_histogram,
    )

    return lang_histogram(_docs(sf_dir))


def _q_lang_id(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import lang_id

    return lang_id(_docs(sf_dir))


def _q_fingerprint(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_events_hourly(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import events_hourly

    return events_hourly(_events(sf_dir))


def _q_sessionize(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import sessionize

    return sessionize(_read_sized(os.path.join(sf_dir, "events.parquet"),
                                  columns=["user_id", "ts"]))


def _q_asof_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        asof_join_events,
    )

    return asof_join_events(_events(sf_dir))


def _q_range_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        range_join_events,
    )

    return range_join_events(_events(sf_dir))


def _q_sliding_window(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        sliding_window_hourly,
    )

    return sliding_window_hourly(_events(sf_dir))


def _q_distinct_users_daily(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        distinct_users_daily,
    )

    return distinct_users_daily(_events(sf_dir))


def _q_stratified_sample(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sampling import (
        stratified_sample,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])
    return stratified_sample(docs)


def _q_bpe_token_count(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        bpe_token_counts,
    )

    return bpe_token_counts(_docs(sf_dir))


def _q_conversion_funnel(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        conversion_funnel,
    )

    return conversion_funnel(_events(sf_dir))


def _q_event_gaps(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import event_gaps

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return event_gaps(events)


def _q_doc_quartiles(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        doc_length_quartiles,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["lang", "doc_id", "text"])
    return doc_length_quartiles(docs)


def _q_events_rollup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import events_rollup

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"])
    return events_rollup(events)


def _q_normalized_dedup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import normalized_dedup

    return normalized_dedup(_docs(sf_dir))


def _q_length_histogram(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        length_histogram,
    )

    return length_histogram(_docs(sf_dir))


def _q_events_pivot(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import events_pivot

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"])
    return events_pivot(events)


def _q_text_normalize(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        normalize_texts,
    )

    return normalize_texts(_docs(sf_dir))


def _q_repetition_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        repetition_stats,
    )

    return repetition_stats(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_decontaminate(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        decontaminate,
    )

    return decontaminate(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_pricing_summary(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        pricing_summary,
    )

    return pricing_summary(_read_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_returnflag", "l_linestatus"]))


def _q_deterministic_shuffle(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.packing import (
        deterministic_shuffle,
    )

    return deterministic_shuffle(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]))


def _q_pack_offsets(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.packing import pack_offsets

    return pack_offsets(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_incremental_dedup(sf_dir: str):
    """Prior run = docs with doc_id % 3 == 0; new arrivals = the rest
    (deterministic simulated increment over the same table)."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.pipelines.dedup import (
        incremental_dedup,
    )

    def part(is_prior):
        def f(b):
            m = b["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0
            return b.filter(pa.array(m if is_prior else ~m))
        return f

    docs = lambda: _read_sized(  # noqa: E731
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    prior = docs().map_batches(part(True), batch_format="pyarrow")
    new = docs().map_batches(part(False), batch_format="pyarrow")
    return incremental_dedup(new, prior)


def _q_chunk_dedup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import chunk_dedup

    return chunk_dedup(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_distinctive_terms(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        distinctive_terms,
    )

    return distinctive_terms(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_quality_filter(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        quality_filter,
    )

    return quality_filter(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_pii_scrub(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import pii_scrub

    return pii_scrub(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_bigram_fluency(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        bigram_fluency,
    )

    return bigram_fluency(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_heavy_hitters(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        heavy_hitters,
    )

    return heavy_hitters(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_dataset_split(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sampling import dataset_split

    return dataset_split(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]))


def _q_token_df(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import token_df

    return token_df(_docs(sf_dir))


def _q_value_quantiles(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        value_quantiles,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    return value_quantiles(events)


def _q_sampled_quantiles(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sketches import (
        sampled_quantiles,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type", "value"])
    return sampled_quantiles(events)


_ANTI_CUTOFF_US = 852076800 * 1_000_000  # 1997-01-01T00:00:00Z

# imported so the oracle can never drift from the engine's filter
from govuk_crawler_worker_ray.pipelines.relational import (  # noqa: E402
    PRICING_CUTOFF_US,
)


def _q_anti_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        orders_without_recent_lineitem,
    )

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey"])
    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_orderkey", "l_shipdate"])
    return orders_without_recent_lineitem(orders, li, _ANTI_CUTOFF_US)


def _q_group_topk(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        top_docs_per_group,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang", "text"])
    return top_docs_per_group(docs)


def _q_kmv_distinct(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sketches import kmv_distinct

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    return kmv_distinct(events)


def _q_hll_distinct(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sketches import hll_distinct

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    return hll_distinct(events)


def _q_inverted_index(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        inverted_index,
    )

    return inverted_index(_docs(sf_dir))


def _q_hard_negatives(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import (
        hard_negatives,
    )

    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"))
    return hard_negatives(emb)


def _q_vocab_encode(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        vocab_encode,
    )

    return vocab_encode(_docs(sf_dir))


def _q_cms_heavy_hitters(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sketches import (
        cms_heavy_hitters,
    )

    return cms_heavy_hitters(_docs(sf_dir))


def _q_media_features(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import media_features

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    return media_features(docs, decoder="fake")


def _q_video_frames(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import video_frames

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    return video_frames(docs)


def _q_revenue_by_nation(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        revenue_by_nation,
    )

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"))
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    return revenue_by_nation(orders, cust, nat)


def _q_revenue_by_nation_join(sf_dir: str):
    import pyarrow.parquet as pq

    from govuk_crawler_worker_ray.pipelines.relational import (
        revenue_by_nation_hashjoin,
    )

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    return revenue_by_nation_hashjoin(orders, cust, nat)


def _q_top_docs(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        top_docs_by_length,
    )

    return top_docs_by_length(_docs(sf_dir))


def _query_vec(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vid = t["vec_id"].to_numpy()
    first = int(vid.argmin())
    return np.asarray(t["embedding"][first].as_py(), dtype=np.float64)


def _q_ann_bruteforce(sf_dir: str):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import knn_bruteforce

    ds = _read_sized(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_bruteforce(ds, _query_vec(sf_dir), k=10).select(
        ["vec_id", "rank"])


def _q_ann_lsh(sf_dir: str):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import lsh_knn

    ds = _read_sized(os.path.join(sf_dir, "embeddings.parquet"))
    # (vec_id, rank) only: the float cosine column would make the
    # driver's value-hash sensitive to last-ulp summation-order noise
    # between the engine and the scalar-twin golden
    return lsh_knn(ds, _query_vec(sf_dir), k=10).select(
        ["vec_id", "rank"])


def _q_ann_ivf(sf_dir: str):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import ivf_knn

    ds = _read_sized(os.path.join(sf_dir, "embeddings.parquet"))
    # (vec_id, rank) only, as ann_lsh: float cosines would make the
    # value-hash sensitive to last-ulp summation-order noise vs the twin
    return ivf_knn(ds, _query_vec(sf_dir), k=10).select(
        ["vec_id", "rank"])


def _q_semantic_dedup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import (
        semantic_dedup,
    )

    ds = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                     columns=["vec_id", "embedding"])
    return semantic_dedup(ds, threshold=0.95)


def _q_embedding_neardup(sf_dir: str):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        embedding_neardup_pairs,
    )

    ds = _read_sized(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_neardup_pairs(ds, threshold=0.95).select(
        ["vec_a", "vec_b"])


def _q_minhash_neardup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(_docs(sf_dir), threshold=0.8)


def _q_ngram_jaccard(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import ngram_jaccard_dedup

    # 0.8: the sf docs are template-generated and heavily similar — at
    # 0.5 the TRUE pair set is ~38% of all pairs (47k rows at sf0.01)
    # and the exact join degenerates toward its all-pairs worst case
    return ngram_jaccard_dedup(_docs(sf_dir), threshold=0.8, n=3)


def _q_ngram_jaccard_bucketed(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import ngram_jaccard_dedup

    # the MIDDLE-regime shape (length-bucketed exact all-pairs with the
    # block-level PPJoin size filter) — exact, so it shares
    # ngram_jaccard's first-principles SQL oracle verbatim
    return ngram_jaccard_dedup(_docs(sf_dir), threshold=0.8, n=3,
                               mode="bucketed")


def _q_neardup_components(sf_dir: str):
    """End-to-end near-dup clustering: minhash-LSH verified pairs ->
    distributed min-label-propagation connected components (rows-only:
    hash-family dependent)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        connected_components_distributed,
        minhash_lsh_dedup,
    )

    pairs = minhash_lsh_dedup(_docs(sf_dir), threshold=0.8)
    if pairs.num_rows == 0:
        import pyarrow as pa

        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    return connected_components_distributed(rd.from_arrow(pairs))


def _q_simhash(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import simhash_signatures

    return simhash_signatures(_docs(sf_dir))


def _q_quantize_embeddings(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import (
        quantize_embeddings,
    )

    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    return quantize_embeddings(emb)


def _q_simhash_neardup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import simhash_neardup

    return simhash_neardup(_docs(sf_dir))


def _q_pagerank(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import pagerank

    d = _fixture()
    links = rd.read_parquet(os.path.join(d, "golden_links.parquet"),
                            columns=["doc_id", "link_url"])
    edges = links.map_batches(
        lambda b: pa.table({"src": b["doc_id"], "dst": b["link_url"]}),
        batch_format="pyarrow")
    return pagerank(edges)


def _q_crawl_order(sf_dir: str):
    order, _, _ = _run_fixture_crawl()
    return order


def _q_crawl_seen(sf_dir: str):
    import pyarrow.compute as pc

    _, seen, _ = _run_fixture_crawl()
    return seen.select(["digest", "status"]).take(
        pc.sort_indices(seen, sort_keys=[("digest", "ascending")]))


def _q_crawl_mirror(sf_dir: str):
    _, _, mirror = _run_fixture_crawl()
    return mirror.select(["mirror_path", "url", "body"])


def _q_mirror_path_fn(sf_dir: str):
    """The RelativeFilePath scalar distributed over a Dataset of the
    fixture's golden mirror URLs: content types come from a broadcast
    url -> mime map built from the corpus (redirects serve text/html —
    crawler.go:91-109)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from govuk_crawler_worker_ray.functions.content_types import (
        parse_content_type,
    )
    from govuk_crawler_worker_ray.functions.redirects import is_redirect

    d = _fixture()
    corpus = pq.read_table(os.path.join(d, "corpus.parquet"),
                           columns=["url", "status_code", "content_type"])
    mimes = {}
    for u, sc, ct in zip(corpus["url"].to_pylist(),
                         corpus["status_code"].to_pylist(),
                         corpus["content_type"].to_pylist()):
        mimes[u] = "text/html" if is_redirect(sc) else parse_content_type(ct)
    mime_ref = ray.put(mimes)

    def mp(batch):
        import pyarrow as pa

        from govuk_crawler_worker_ray.functions.urls import (
            relative_file_path,
        )

        mm = ray.get(mime_ref)
        urls = batch["url"].to_pylist()
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "mirror_path": pa.array(
                [relative_file_path(u, mm.get(u, "text/html"))
                 for u in urls], pa.string()),
        })

    ds = _read_sized(os.path.join(d, "golden_mirror.parquet"),
                     columns=["url"])
    return ds.map_batches(mp, batch_format="pyarrow")


def _q_extract_links(sf_dir: str):
    """Span-path link extraction over the fixture corpus, hash-compared
    against the HTML-path golden (two independent parsers — the
    span-sequence invariant from BASELINE.json input_hint)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from govuk_crawler_worker_ray.config import CrawlConfig
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS
    from govuk_crawler_worker_ray.functions.extract import (
        extract_links_spans_batch,
    )
    from govuk_crawler_worker_ray.functions.urls import netloc_host, parse_url

    d = _fixture()
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    allowed = [netloc_host(parse_url(r).netloc) for r in cfg.root_urls]
    ds = _read_sized(os.path.join(d, "corpus.parquet"),
                     columns=["url", "status_code", "content_type",
                              "spans"])

    def ex(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(batch["status_code"], 200),
                    pc.match_substring_regex(batch["content_type"],
                                             "^text/html")),
            pc.greater(pc.list_value_length(batch["spans"]), 0))
        sub = batch.filter(pc.fill_null(mask, False))
        links = extract_links_spans_batch(sub, allowed,
                                          cfg.blacklist_paths)
        links = links.filter(pc.greater_equal(links["link_seq"], 0))
        return pa.table({"doc_id": links["src_url"],
                         "link_seq": links["link_seq"],
                         "link_url": links["link_url"]})

    return ds.map_batches(ex, batch_format="pyarrow")


def _q_content_type_gate(sf_dir: str):
    """The AcceptedContentType allowlist gate
    (crawler_response.go:35-48) vectorized over the fixture corpus."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.functions.content_types import (
        accepted_mask,
    )

    d = _fixture()
    ds = _read_sized(os.path.join(d, "corpus.parquet"),
                     columns=["url", "content_type"])

    def gate(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "accepted": accepted_mask(
                batch["content_type"].combine_chunks()),
        })

    return ds.map_batches(gate, batch_format="pyarrow")


def _q_curate(sf_dir: str):
    """Crawl -> curated-training-data handoff over the fixture crawl's
    own output (rows-only: span-to-text + quality + lang + exact dedup
    are not SQL-expressible end to end)."""
    import pyarrow.dataset as pads

    from govuk_crawler_worker_ray.pipelines.curate import (
        curate_crawl_output,
    )

    import shutil

    _run_fixture_crawl()  # ensures /tmp/gcw_entry_out/t1000 exists
    shutil.rmtree("/tmp/gcw_entry_out/curated", ignore_errors=True)
    dest, _ = curate_crawl_output("/tmp/gcw_entry_out/t1000",
                                  "/tmp/gcw_entry_out/curated",
                                  min_quality_points=0)
    t = pads.dataset(dest, format="parquet").to_table()
    return t.sort_by("doc_id")


def _q_pages_by_host(sf_dir: str):
    """Skew-safe per-host counts over the (mega-host-skewed) fixture
    corpus via salted two-phase aggregation."""
    from govuk_crawler_worker_ray.pipelines.relational import (
        count_by_host_salted,
    )

    d = _fixture()
    ds = _read_sized(os.path.join(d, "corpus.parquet"),
                     columns=["url", "host"])
    return count_by_host_salted(ds)


def _q_skew_join(sf_dir: str):
    """Salted skew join of the mega-host-skewed fixture corpus (fact)
    against a per-host dimension: www.gov.uk (~80% of rows) fans across
    salts instead of landing on one join partition."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    from govuk_crawler_worker_ray.pipelines.relational import (
        salted_skew_join,
    )

    d = _fixture()
    corp = os.path.join(d, "corpus.parquet")
    fact = _read_sized(corp, columns=["url", "host"])
    # dim build (query-level, not the operator): distinct hosts via a
    # narrow per-batch unique + driver fold — bounded by host
    # cardinality, which is the dim's own size by definition
    hosts: set = set()
    for b in fact.map_batches(
            lambda t: pa.table({"host": pc.unique(t["host"])}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        hosts.update(b["host"].to_pylist())
    hs = sorted(hosts)
    import ray.data as _rd
    dim = _rd.from_arrow(pa.table({
        "host": pa.array(hs, pa.string()),
        "host_group": pa.array(
            [int(hashlib.md5(h.encode()).hexdigest()[:4], 16) % 8
             for h in hs], pa.int64()),
    }))
    return salted_skew_join(fact, dim, on="host", spread_col="url",
                            hot_frac=0.5)


def _q_priority_sample(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sampling import priority_sample

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    return priority_sample(docs)


def _q_tfidf_rank(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import tfidf_rank

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    return tfidf_rank(docs)


def _q_embedding_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import (
        embedding_stats,
    )

    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["embedding"])
    return embedding_stats(emb)


def _q_label_centroids(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import (
        label_centroids,
    )

    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["embedding", "label"])
    return label_centroids(emb)


def _q_semi_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        customers_with_orders,
    )

    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_name"])
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    return customers_with_orders(cust, orders)


def _q_left_outer_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        customer_order_details,
    )

    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_name"])
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_orderkey",
                                  "o_totalprice"])
    return customer_order_details(cust, orders)


def _q_full_outer_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        customer_activity,
    )

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    return customer_activity(orders, events)


def _q_upsert_latest(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import upsert_latest

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "ts",
                                  "event_type", "value"])
    return upsert_latest(events)


def _q_token_windows(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        token_windows,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    return token_windows(docs)


def _q_user_retention(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        user_retention,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return user_retention(events)


def _q_c4_pipeline(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.recipes import c4_curation

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang"])
    return c4_curation(docs)


def _q_assemble_features(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        assemble_features,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang"])
    # prune the list<float> embedding column at the read
    emb = _read_sized(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "label"])
    return assemble_features(docs, emb)


def _q_compact_files(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sink import compact_files

    dest = os.path.join("/tmp", "gcw_compact_" +
                        os.path.basename(os.path.normpath(sf_dir)))
    return compact_files(
        os.path.join(sf_dir, "documents.parquet"), dest,
        rows_per_file=200, columns=["doc_id", "n_chars"])


def _q_percent_rank(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        percent_rank_docs,
    )

    return percent_rank_docs(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_winsorize(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import winsorize

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])
    return winsorize(events)


def _q_table_profile(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        table_profile,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"))
    return table_profile(docs)


def _q_gap_fill(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        gap_fill_hourly,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type"])
    return gap_fill_hourly(events)


def _q_moving_avg(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import moving_avg

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "ts", "value"])
    return moving_avg(events)


def _q_lang_mix(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import lang_mix

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["source", "lang"])
    return lang_mix(docs)


def _q_domain_mix(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import domain_mix

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["source", "text"])
    return domain_mix(docs)


def _q_cdc_chunk_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import cdc_chunk_stats

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    return cdc_chunk_stats(docs)


def _q_domain_mix_sample(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sampling import (
        domain_mix_sample,
    )

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "source", "text"])
    return domain_mix_sample(docs, budget_docs=200)


def _q_source_cap(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.sampling import source_cap

    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "source"])
    return source_cap(docs, cap=10)


def _q_event_transitions(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        event_transitions,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    return event_transitions(events)


def _q_orders_cube(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import orders_cube

    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])
    return orders_cube(orders)


def _q_corr_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import corr_stats

    li = _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                     columns=["l_returnflag", "l_quantity",
                              "l_discount"])
    return corr_stats(li)


def _q_bloom_semi_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        bloom_semi_join,
    )

    cust = _read_sized(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_name"])
    orders = _read_sized(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])
    return bloom_semi_join(cust, orders)


def _q_json_extract_agg(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import (
        json_field_agg,
    )

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])
    return json_field_agg(events)


def _q_running_total(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import running_total

    events = _read_sized(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "ts", "value"])
    return running_total(events)


def _q_html_extract(sf_dir: str):
    """HTML -> text over the fixture crawl corpus (the only HTML in
    the testdata); filtered to text/html at the read."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        html_extract_text,
    )

    import pyarrow.compute as pc

    d = _fixture()
    pages = rd.read_parquet(os.path.join(d, "corpus.parquet"),
                            columns=["url", "content_type", "body"])
    html = pages.map_batches(
        lambda b: b.filter(pc.starts_with(b["content_type"],
                                          "text/html"))
        .select(["url", "body"]),
        batch_format="pyarrow")
    return html_extract_text(html)


def _q_degree_stats(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import degree_stats

    d = _fixture()
    links = rd.read_parquet(os.path.join(d, "golden_links.parquet"),
                            columns=["doc_id", "link_url"])
    edges = links.map_batches(
        lambda b: pa.table({"src": b["doc_id"], "dst": b["link_url"]}),
        batch_format="pyarrow")
    return degree_stats(edges)


def _q_global_rank(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.relational import global_rank

    return global_rank(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_pmi_collocations(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        pmi_collocations,
    )

    return pmi_collocations(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_length_outliers(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        length_outliers,
    )

    return length_outliers(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_dup_spans(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.dedup import dup_spans

    return dup_spans(_read_sized(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]))


def _q_span_stats(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import span_stats
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return span_stats(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_span_transitions(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        span_transitions,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return span_transitions(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_snapshot_diff(sf_dir: str):
    """Prior snapshot = documents as stored; new snapshot = a
    deterministic recrawl of it (doc_id % 7 == 3 gone, doc_id % 5 == 0
    revised, doc_id % 13 == 0 re-appearing under a fresh id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from govuk_crawler_worker_ray.pipelines.dedup import snapshot_diff

    path = os.path.join(sf_dir, "documents.parquet")

    def revise(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(ids % 7 != 3))
        mask = pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 5 == 0)
        text = pc.if_else(
            mask,
            pc.binary_join_element_wise(
                t["text"].combine_chunks(), " rev2", ""),
            t["text"].combine_chunks())
        return pa.table({"doc_id": t["doc_id"], "text": text})

    def added(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = ids[ids % 13 == 0]
        return pa.table({
            "doc_id": pa.array(sel + 10_000_000, pa.int64()),
            "text": pa.array(
                np.char.add("added page ", sel.astype(str)),
                pa.string()),
        })

    docs = lambda: _read_sized(path, columns=["doc_id", "text"])  # noqa: E731
    new = (docs().map_batches(revise, batch_format="pyarrow")
           .union(docs().map_batches(added, batch_format="pyarrow")))
    return snapshot_diff(new, docs())


def _q_minhash_incremental(sf_dir: str):
    """Same deterministic doc_id % 3 snapshot split as
    incremental_dedup (prior = multiples of 3, new = the rest)."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.pipelines.dedup import (
        minhash_incremental,
    )

    def part(is_prior):
        def f(b):
            m = b["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0
            return b.filter(pa.array(m if is_prior else ~m))
        return f

    docs = lambda: _read_sized(  # noqa: E731
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    prior = docs().map_batches(part(True), batch_format="pyarrow")
    new = docs().map_batches(part(False), batch_format="pyarrow")
    return minhash_incremental(new, prior)


def _q_mm_quality_gate(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        mm_quality_gate,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return mm_quality_gate(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_interleaved_curation(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_curation,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return interleaved_curation(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_interleaved_dedup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_dedup,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return interleaved_dedup(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_media_manifest(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        media_manifest,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return media_manifest(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_span_text(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import span_text
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return span_text(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_media_context(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        media_context,
    )
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return media_context(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_mm_pack(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.packing import mm_pack
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return mm_pack(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_media_dedup(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.multimodal import media_dedup
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return media_dedup(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def _q_knn_join(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.similarity import knn_join

    return knn_join(_read_sized(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]))


def _q_triangle_count(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.graph import triangle_count

    d = _fixture()
    edges = _read_sized(
        os.path.join(d, "golden_links.parquet"),
        columns=["doc_id", "link_url"]).map_batches(
            lambda b: b.rename_columns(["src", "dst"]),
            batch_format="pyarrow")
    return triangle_count(edges)


def _q_bfs_depth(sf_dir: str):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import bfs_depth

    d = _fixture()
    edges = _read_sized(
        os.path.join(d, "golden_links.parquet"),
        columns=["doc_id", "link_url"]).map_batches(
            lambda b: b.rename_columns(["src", "dst"]),
            batch_format="pyarrow")
    seeds = rd.read_parquet(os.path.join(d, "seeds.parquet"),
                            columns=["url"])
    return bfs_depth(edges, seeds)


def _q_partitioned_write(sf_dir: str):
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from govuk_crawler_worker_ray.pipelines.sink import (
        read_partitioned,
        write_partitioned,
    )

    dest = os.path.join("/tmp", "gcw_sink_" +
                        os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(dest, ignore_errors=True)
    docs = _read_sized(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    # receipts are tiny (one row per bucket); consuming them drives
    # the write to completion before the round-trip read
    receipts = write_partitioned(docs, dest, key="doc_id",
                                 hex_chars=1, resume=True).to_pandas()
    assert not receipts["skipped"].any()

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": b["bucket"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "c": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
        })

    return (read_partitioned(dest, columns=["bucket", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n_docs"),
                       Sum("c", alias_name="n_chars")))


def _q_pack_manifest(sf_dir: str):
    from govuk_crawler_worker_ray.pipelines.packing import pack_manifest
    from govuk_crawler_worker_ray.sources.documents import read_documents

    d = _fixture()
    return pack_manifest(read_documents(
        os.path.join(d, "documents.parquet"),
        columns=["doc_id", "spans"]))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "dedup_exact": _q_dedup_exact,
        "token_count": _q_token_count,
        "text_stats": _q_text_stats,
        "quality_score": _q_quality,
        "lang_histogram": _q_lang_hist,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "sliding_window": _q_sliding_window,
        "distinct_users_daily": _q_distinct_users_daily,
        "stratified_sample": _q_stratified_sample,
        "kmv_distinct": _q_kmv_distinct,
        "hll_distinct": _q_hll_distinct,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "inverted_index": _q_inverted_index,
        "hard_negatives": _q_hard_negatives,
        "vocab_encode": _q_vocab_encode,
        "anti_join": _q_anti_join,
        "group_topk": _q_group_topk,
        "bpe_token_count": _q_bpe_token_count,
        "conversion_funnel": _q_conversion_funnel,
        "event_gaps": _q_event_gaps,
        "doc_quartiles": _q_doc_quartiles,
        "events_rollup": _q_events_rollup,
        "events_pivot": _q_events_pivot,
        "normalized_dedup": _q_normalized_dedup,
        "length_histogram": _q_length_histogram,
        "text_normalize": _q_text_normalize,
        "repetition_stats": _q_repetition_stats,
        "decontaminate": _q_decontaminate,
        "chunk_dedup": _q_chunk_dedup,
        "distinctive_terms": _q_distinctive_terms,
        "quality_filter": _q_quality_filter,
        "heavy_hitters": _q_heavy_hitters,
        "dataset_split": _q_dataset_split,
        "incremental_dedup": _q_incremental_dedup,
        "bigram_fluency": _q_bigram_fluency,
        "pii_scrub": _q_pii_scrub,
        "pricing_summary": _q_pricing_summary,
        "pack_offsets": _q_pack_offsets,
        "deterministic_shuffle": _q_deterministic_shuffle,
        "token_df": _q_token_df,
        "value_quantiles": _q_value_quantiles,
        "sampled_quantiles": _q_sampled_quantiles,
        "media_features": _q_media_features,
        "video_frames": _q_video_frames,
        "revenue_by_nation": _q_revenue_by_nation,
        "revenue_by_nation_join": _q_revenue_by_nation_join,
        "top_docs_by_length": _q_top_docs,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "embedding_neardup": _q_embedding_neardup,
        "semantic_dedup": _q_semantic_dedup,
        "minhash_neardup": _q_minhash_neardup,
        "ngram_jaccard": _q_ngram_jaccard,
        "ngram_jaccard_bucketed": _q_ngram_jaccard_bucketed,
        "neardup_components": _q_neardup_components,
        "simhash": _q_simhash,
        "simhash_neardup": _q_simhash_neardup,
        "quantize_embeddings": _q_quantize_embeddings,
        "priority_sample": _q_priority_sample,
        "tfidf_rank": _q_tfidf_rank,
        "embedding_stats": _q_embedding_stats,
        "label_centroids": _q_label_centroids,
        "semi_join": _q_semi_join,
        "left_outer_join": _q_left_outer_join,
        "full_outer_join": _q_full_outer_join,
        "upsert_latest": _q_upsert_latest,
        "token_windows": _q_token_windows,
        "html_extract": _q_html_extract,
        "running_total": _q_running_total,
        "json_extract_agg": _q_json_extract_agg,
        "bloom_semi_join": _q_bloom_semi_join,
        "user_retention": _q_user_retention,
        "source_cap": _q_source_cap,
        "lang_mix": _q_lang_mix,
        "domain_mix": _q_domain_mix,
        "domain_mix_sample": _q_domain_mix_sample,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "gap_fill": _q_gap_fill,
        "moving_avg": _q_moving_avg,
        "table_profile": _q_table_profile,
        "winsorize": _q_winsorize,
        "percent_rank": _q_percent_rank,
        "assemble_features": _q_assemble_features,
        "c4_pipeline": _q_c4_pipeline,
        "compact_files": _q_compact_files,
        "event_transitions": _q_event_transitions,
        "orders_cube": _q_orders_cube,
        "corr_stats": _q_corr_stats,
        "pagerank": _q_pagerank,
        "degree_stats": _q_degree_stats,
        "global_rank": _q_global_rank,
        "pmi_collocations": _q_pmi_collocations,
        "length_outliers": _q_length_outliers,
        "dup_spans": _q_dup_spans,
        "span_stats": _q_span_stats,
        "span_transitions": _q_span_transitions,
        "snapshot_diff": _q_snapshot_diff,
        "minhash_incremental": _q_minhash_incremental,
        "mm_quality_gate": _q_mm_quality_gate,
        "interleaved_dedup": _q_interleaved_dedup,
        "interleaved_curation": _q_interleaved_curation,
        "media_manifest": _q_media_manifest,
        "span_text": _q_span_text,
        "media_context": _q_media_context,
        "mm_pack": _q_mm_pack,
        "media_dedup": _q_media_dedup,
        "knn_join": _q_knn_join,
        "triangle_count": _q_triangle_count,
        "bfs_depth": _q_bfs_depth,
        "partitioned_write": _q_partitioned_write,
        "pack_manifest": _q_pack_manifest,
        "crawl_order": _q_crawl_order,
        "crawl_seen": _q_crawl_seen,
        "crawl_mirror": _q_crawl_mirror,
        "mirror_path_fn": _q_mirror_path_fn,
        "extract_links": _q_extract_links,
        "content_type_gate": _q_content_type_gate,
        "pages_by_host": _q_pages_by_host,
        "skew_join": _q_skew_join,
        "curate_crawl": _q_curate,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_STOP = r"(?i)\b(the|and|of|a|to|in|is)\b"
_PUNCT = r"[.,;:!?]"
_TOK = r"\S+"


_ACCEPTED_SQL = ("'text/css','text/csv',"
                 "'application/vnd.openxmlformats-officedocument."
                 "wordprocessingml.document','image/gif','text/html',"
                 "'image/x-icon','text/calendar',"
                 "'application/javascript','image/jpeg',"
                 "'application/json',"
                 "'application/vnd.oasis.opendocument.presentation',"
                 "'application/vnd.oasis.opendocument.spreadsheet',"
                 "'application/vnd.oasis.opendocument.text',"
                 "'application/pdf','image/png',"
                 "'application/vnd.ms-excel',"
                 "'application/vnd.openxmlformats-officedocument."
                 "spreadsheetml.sheet'")


# range_join window constants, imported from the pipeline module so the
# oracle can never drift from the engine's interval table
def _range_consts():
    from govuk_crawler_worker_ray.pipelines.relational import (
        RANGE_BASE_US,
        RANGE_PERIOD_US,
        RANGE_SPAN_US,
    )

    return RANGE_BASE_US, RANGE_PERIOD_US, RANGE_SPAN_US


_RANGE_BASE, _RANGE_PERIOD, _RANGE_SPAN = _range_consts()


def _kmv_sql() -> str:
    from govuk_crawler_worker_ray.pipelines.sketches import kmv_oracle_sql

    return kmv_oracle_sql()


def _sampled_quantiles_sql() -> str:
    from govuk_crawler_worker_ray.pipelines.sketches import (
        sampled_quantiles_oracle_sql,
    )

    return sampled_quantiles_oracle_sql()


def _hll_sql() -> str:
    from govuk_crawler_worker_ray.pipelines.sketches import hll_oracle_sql

    return hll_oracle_sql()


def _cms_sql() -> str:
    from govuk_crawler_worker_ray.pipelines.sketches import cms_oracle_sql

    return cms_oracle_sql()


def _pagerank_sql(gl: str) -> str:
    from govuk_crawler_worker_ray.pipelines.graph import (
        pagerank_oracle_sql,
    )

    return pagerank_oracle_sql(
        "SELECT doc_id AS src, link_url AS dst FROM "
        f"read_parquet('{gl}')")


def _bpe_sql() -> str:
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        BPE_TOKEN_RE,
    )

    rx = BPE_TOKEN_RE.replace("'", "''")
    return (f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{rx}')) "
            "AS BIGINT) AS n_bpe_tokens FROM documents")


def _pii_scrub_sql() -> str:
    """Mirrors text_analysis.pii_scrub_batch kernel-for-kernel (same
    RE2 patterns, same order: url -> email -> phone)."""
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        _PII_EMAIL,
        _PII_PHONE,
        _PII_URL,
    )

    return (
        "WITH s1 AS (SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{_PII_URL}')) AS BIGINT) "
        "AS n_urls, "
        f"regexp_replace(text, '{_PII_URL}', '<url>', 'g') AS t "
        "FROM documents), "
        "s2 AS (SELECT doc_id, n_urls, "
        f"CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) "
        "AS n_emails, "
        f"regexp_replace(t, '{_PII_EMAIL}', '<email>', 'g') AS t "
        "FROM s1) "
        "SELECT doc_id, "
        f"regexp_replace(t, '{_PII_PHONE}', '<phone>', 'g') "
        "AS scrubbed_text, n_urls, n_emails, "
        f"CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) "
        "AS n_phones FROM s2")


def _c4_sql(min_quality: int = 6) -> str:
    """Composed twin of recipes.c4_curation: the pii_scrub chain, the
    quality expression, keep-first-by-md5(scrubbed), and the split
    CASE — all built from the SAME imported constants the standalone
    oracles use, so the composite can't drift from its parts."""
    from govuk_crawler_worker_ray.pipelines.sampling import split_bounds
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        _PII_EMAIL,
        _PII_PHONE,
        _PII_URL,
    )

    qp = ("CAST(CASE WHEN length(t) BETWEEN 100 AND 20000 THEN 4 "
          "ELSE 0 END "
          f"+ CASE WHEN CAST(len(regexp_extract_all(t, '{_STOP}')) "
          "AS DOUBLE) / GREATEST(len(regexp_extract_all(t, "
          f"'{_TOK}')), 1) >= 0.01 THEN 4 ELSE 0 END "
          f"+ CASE WHEN CAST(len(regexp_extract_all(t, '{_PUNCT}')) "
          "AS DOUBLE) / GREATEST(length(t), 1) <= 0.2 THEN 2 "
          "ELSE 0 END AS BIGINT)")
    names, bounds, last = split_bounds()
    arms = ["WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
            f"< '{hi}' THEN '{name}'"
            for name, hi in zip(names, bounds)]
    return (
        "WITH s1 AS (SELECT doc_id, lang, "
        f"regexp_replace(text, '{_PII_URL}', '<url>', 'g') AS t "
        "FROM documents), "
        "s2 AS (SELECT doc_id, lang, "
        f"regexp_replace(t, '{_PII_EMAIL}', '<email>', 'g') AS t "
        "FROM s1), "
        "s3 AS (SELECT doc_id, lang, "
        f"regexp_replace(t, '{_PII_PHONE}', '<phone>', 'g') AS t "
        "FROM s2), "
        f"q AS (SELECT doc_id, lang, t, {qp} AS quality_points "
        "FROM s3), "
        f"k AS (SELECT * FROM q WHERE quality_points >= {min_quality}), "
        "d AS (SELECT doc_id, lang, quality_points, "
        "row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) "
        "AS rn FROM k) "
        "SELECT doc_id, lang, quality_points, CASE "
        + " ".join(arms)
        + f" ELSE '{last}' END AS split "
        "FROM d WHERE rn = 1")


def _dataset_split_sql() -> str:
    """CASE chain with the SAME md5-prefix cut points the engine's
    dataset_split uses (imported, not re-typed)."""
    from govuk_crawler_worker_ray.pipelines.sampling import split_bounds

    names, bounds, last = split_bounds()
    arms = ["WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
            f"< '{hi}' THEN '{name}'"
            for name, hi in zip(names, bounds)]
    return ("SELECT doc_id, CASE " + " ".join(arms)
            + f" ELSE '{last}' END AS split "
            "FROM documents")


def _strata_case_sql() -> str:
    """CASE expression with the SAME md5-prefix thresholds the engine's
    stratified_sample uses (imported, not re-typed)."""
    from govuk_crawler_worker_ray.pipelines.sampling import (
        DEFAULT_RATE,
        DEFAULT_RATES,
        _hex_threshold,
    )

    whens = " ".join(
        f"WHEN '{lang}' THEN '{_hex_threshold(r)}'"
        for lang, r in sorted(DEFAULT_RATES.items()))
    return (f"CASE lang {whens} "
            f"ELSE '{_hex_threshold(DEFAULT_RATE)}' END")


def _curate_oracle_sql() -> str:
    """DuckDB oracle for the WHOLE curation pipeline over the fixture
    crawl's own parquet output: span unnest -> text_agg in (offset,
    text) order -> quality/lang/md5 -> min-rowkey winner per content
    hash.  Mirrors pipelines/curate.py exactly (verified equal)."""
    _run_fixture_crawl()  # the SQL reads the crawl's fetched parquet
    out = "/tmp/gcw_entry_out/t1000"
    c_en = "len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|is)\\b'))"
    c_de = ("len(regexp_extract_all(text, "
            "'(?i)\\b(der|die|und|das|ist)\\b'))")
    c_es = "len(regexp_extract_all(text, '(?i)\\b(el|la|que|los|es)\\b'))"
    c_fr = "len(regexp_extract_all(text, '(?i)\\b(le|la|les|et|est)\\b'))"
    return f"""
WITH f AS (
  SELECT url, discovered_seq, spans
  FROM read_parquet('{out}/round=*/fetched/*.parquet')
  WHERE outcome = 'fetched' AND content_type = 'text/html'
), sp AS (
  SELECT url, discovered_seq, unnest(spans) AS s FROM f
), txt AS (
  SELECT url AS doc_id, discovered_seq,
         string_agg(s.text, ' ' ORDER BY s.offset, s.text) AS text
  FROM sp WHERE s.kind IN ('text','link') AND s.text IS NOT NULL
        AND s.text != ''
  GROUP BY url, discovered_seq
), scored AS (
  SELECT doc_id, text,
    CAST(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
      + CASE WHEN CAST(len(regexp_extract_all(text, '{_STOP}'))
          AS DOUBLE) / GREATEST(len(regexp_extract_all(text, '{_TOK}')),
          1) >= 0.01 THEN 4 ELSE 0 END
      + CASE WHEN CAST(len(regexp_extract_all(text, '{_PUNCT}'))
          AS DOUBLE) / GREATEST(length(text), 1) <= 0.2 THEN 2 ELSE 0
          END AS BIGINT) AS quality_points,
    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         WHEN {c_en} >= {c_de} AND {c_en} >= {c_es} AND {c_en} >= {c_fr}
           THEN 'en'
         WHEN {c_de} >= {c_es} AND {c_de} >= {c_fr} THEN 'de'
         WHEN {c_es} >= {c_fr} THEN 'es' ELSE 'fr' END AS pred_lang,
    md5(text) AS content_hash,
    doc_id || chr(9) || lpad(CAST(discovered_seq AS VARCHAR), 12, '0')
      AS rowkey
  FROM txt WHERE text != ''
), winners AS (
  SELECT content_hash, min(rowkey) AS win FROM scored
  GROUP BY content_hash
)
SELECT s.doc_id, s.text, s.quality_points, s.pred_lang, s.content_hash
FROM scored s JOIN winners w
  ON s.content_hash = w.content_hash AND s.rowkey = w.win
ORDER BY s.doc_id
"""


def oracle_sql() -> dict[str, str]:
    d = _fixture()  # goldens must exist for the read_parquet oracles
    # scalar-twin goldens for the deterministic per-row hash operators
    # (driver runs the side-by-side compare at sf0.01 per its contract)
    from govuk_crawler_worker_ray.goldens import (
        write_ann_ivf_golden,
        write_ann_lsh_golden,
        write_scalar_goldens,
    )

    oracle_sf = os.environ.get("GCW_ORACLE_SF", "/root/testdata/sf0.01")
    sg = write_scalar_goldens(
        os.path.join(oracle_sf, "documents.parquet"),
        "/tmp/gcw_goldens")
    ga = write_ann_lsh_golden(
        os.path.join(oracle_sf, "embeddings.parquet"),
        "/tmp/gcw_goldens")
    gi = write_ann_ivf_golden(
        os.path.join(oracle_sf, "embeddings.parquet"),
        "/tmp/gcw_goldens")
    from govuk_crawler_worker_ray.goldens import (
        write_semantic_dedup_golden,
    )

    gsd = write_semantic_dedup_golden(
        os.path.join(oracle_sf, "embeddings.parquet"),
        "/tmp/gcw_goldens")
    from govuk_crawler_worker_ray.goldens import write_media_goldens

    gmed = write_media_goldens(
        os.path.join(oracle_sf, "documents.parquet"),
        "/tmp/gcw_goldens")
    from govuk_crawler_worker_ray.goldens import write_minhash_goldens

    gmh = write_minhash_goldens(
        os.path.join(oracle_sf, "documents.parquet"),
        "/tmp/gcw_goldens")
    from govuk_crawler_worker_ray.goldens import (
        write_minhash_incremental_golden,
    )

    gmhi = write_minhash_incremental_golden(
        os.path.join(oracle_sf, "documents.parquet"),
        "/tmp/gcw_goldens")
    from govuk_crawler_worker_ray.goldens import write_cdc_golden

    gcdc = write_cdc_golden(
        os.path.join(oracle_sf, "documents.parquet"),
        "/tmp/gcw_goldens")
    gm = os.path.join(d, "golden_mirror.parquet")
    go = os.path.join(d, "golden_crawl_order.parquet")
    gs = os.path.join(d, "golden_seen.parquet")
    gl = os.path.join(d, "golden_links.parquet")
    fseeds = os.path.join(d, "seeds.parquet")
    from govuk_crawler_worker_ray.pipelines.graph import (
        bfs_depth_oracle_sql,
    )
    _bfs_sql = bfs_depth_oracle_sql(
        "SELECT doc_id AS src, link_url AS dst FROM "
        f"read_parquet('{gl}')",
        f"SELECT url FROM read_parquet('{fseeds}')")
    corp = os.path.join(d, "corpus.parquet")
    fdoc = os.path.join(d, "documents.parquet")
    _mm_cte = (
        "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
        f"read_parquet('{fdoc}')), "
        "f AS (SELECT doc_id, CAST(len(regexp_extract_all("
        "COALESCE(sp.text, ''), '\\S+')) AS BIGINT) AS t, "
        "CASE WHEN sp.media_ref IS NOT NULL THEN 1 ELSE 0 END "
        "AS m FROM s), "
        "a AS (SELECT doc_id, CAST(sum(t) AS BIGINT) AS n_tokens, "
        "CAST(sum(m) AS BIGINT) AS n_media FROM f GROUP BY doc_id), "
        "j AS (SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS "
        "n_tokens, COALESCE(a.n_media, 0) AS n_media FROM "
        f"read_parquet('{fdoc}') d LEFT JOIN a USING (doc_id)), "
        "c AS (SELECT doc_id, n_tokens, n_media, "
        "n_tokens + 64 * n_media AS cost, md5(doc_id) AS h FROM j), "
        "sc AS (SELECT doc_id, n_tokens, n_media, cost, "
        "CAST(COALESCE(sum(cost) OVER (ORDER BY h, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS tok_start FROM c)")
    sql = {
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM documents GROUP BY md5(text)"),
        # exact trigram Jaccard from first principles (substr explode);
        # the engine's jaccard is the same double quotient of the same
        # exact integers, so the float compares bit-identical
        "ngram_jaccard": (
            "WITH pos AS (SELECT doc_id, text, "
            "unnest(generate_series(1, length(text) - 2)) AS i "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "substr(text, i, 3) AS gram FROM pos), "
            "sz AS (SELECT doc_id, count(*) AS n FROM grams "
            "GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS i FROM grams a JOIN grams b "
            "ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) "
            "AS jaccard FROM inter "
            "JOIN sz sa ON sa.doc_id = doc_a "
            "JOIN sz sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8 "
            "ORDER BY doc_a, doc_b"),
        "token_count": (
            f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{_TOK}')) "
            "AS BIGINT) AS n_tokens FROM documents"),
        "text_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            f"CAST(len(regexp_extract_all(text, '{_TOK}')) AS BIGINT) "
            "AS n_tokens, "
            f"CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS BIGINT) "
            "AS n_punct, "
            f"CAST(len(regexp_extract_all(text, '{_STOP}')) AS BIGINT) "
            "AS n_stopwords FROM documents"),
        "quality_score": (
            "SELECT doc_id, "
            "CAST(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 4 "
            "ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(text, '{_STOP}')) "
            "AS DOUBLE) / GREATEST(len(regexp_extract_all(text, "
            f"'{_TOK}')), 1) >= 0.01 THEN 4 ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(text, '{_PUNCT}')) "
            "AS DOUBLE) / GREATEST(length(text), 1) <= 0.2 THEN 2 "
            "ELSE 0 END AS BIGINT) AS quality_points FROM documents"),
        "lang_histogram": (
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang"),
        "lang_id": (
            "WITH c AS (SELECT doc_id, "
            "regexp_matches(text, '[一-鿿]') AS cjk, "
            "len(regexp_extract_all(text, "
            "'(?i)\\b(the|and|of|to|is)\\b')) AS c_en, "
            "len(regexp_extract_all(text, "
            "'(?i)\\b(der|die|und|das|ist)\\b')) AS c_de, "
            "len(regexp_extract_all(text, "
            "'(?i)\\b(el|la|que|los|es)\\b')) AS c_es, "
            "len(regexp_extract_all(text, "
            "'(?i)\\b(le|la|les|et|est)\\b')) AS c_fr FROM documents) "
            "SELECT doc_id, CASE WHEN cjk THEN 'zh' "
            "WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en' "
            "WHEN c_de >= c_es AND c_de >= c_fr THEN 'de' "
            "WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END AS pred_lang FROM c"),
        "events_hourly": (
            "SELECT event_type, "
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micros FROM events GROUP BY 1, 2"),
        "sessionize": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) "
            "OVER (PARTITION BY user_id ORDER BY ts) AS gap FROM events) "
            "SELECT user_id, CAST(1 + sum(CASE WHEN gap > 1800000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, "
            "count(*) AS n_events FROM g GROUP BY user_id"),
        "asof_join": (
            "WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS "
            "ts_micros FROM events WHERE event_type = 'purchase'), "
            "b AS (SELECT user_id, epoch_us(ts) AS ts_micros, "
            "max(CAST(round(value * 1000000) AS BIGINT)) AS value_micros "
            "FROM events WHERE event_type = 'click' GROUP BY 1, 2) "
            "SELECT a.event_id, a.user_id, a.ts_micros, "
            "COALESCE(b.ts_micros, -1) AS right_ts_micros, "
            "COALESCE(b.value_micros, -1) AS right_value_micros "
            "FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id "
            "AND a.ts_micros >= b.ts_micros"),
        "range_join": (
            "WITH r AS (SELECT i AS range_id, "
            f"{_RANGE_BASE} + i * {_RANGE_PERIOD} AS lo, "
            f"{_RANGE_BASE} + i * {_RANGE_PERIOD} + {_RANGE_SPAN} AS hi "
            "FROM generate_series(0, 59) t(i)) "
            "SELECT r.range_id, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micros FROM events e JOIN r "
            "ON epoch_us(e.ts) >= r.lo AND epoch_us(e.ts) < r.hi "
            "GROUP BY 1"),
        "sliding_window": (
            "WITH h AS (SELECT event_type, "
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, "
            "count(*) AS n, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS v FROM events GROUP BY 1, 2) "
            "SELECT event_type, bucket, "
            "CAST(sum(n) OVER w AS BIGINT) AS w24_events, "
            "CAST(sum(v) OVER w AS BIGINT) AS w24_micros FROM h "
            "WINDOW w AS (PARTITION BY event_type ORDER BY bucket "
            "RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)"),
        "kmv_distinct": _kmv_sql(),
        "hll_distinct": _hll_sql(),
        "cms_heavy_hitters": _cms_sql(),
        # rank order (count DESC, token ASC) is total, so the vocab ids
        # and therefore the id sequences are deterministic both sides
        "vocab_encode": (
            "WITH cnt AS (SELECT token, count(*) AS n FROM (SELECT "
            "unnest(regexp_extract_all(text, '\\S+')) AS token FROM "
            "documents) GROUP BY token), "
            "vocab AS (SELECT token, id FROM (SELECT token, "
            "row_number() OVER (ORDER BY n DESC, token) - 1 AS id "
            "FROM cnt) WHERE id < 64), "
            "tl AS (SELECT doc_id, regexp_extract_all(text, '\\S+') "
            "AS ts FROM documents), "
            "pos AS (SELECT doc_id, ts, "
            "unnest(generate_series(1, len(ts))) AS i FROM tl), "
            "enc AS (SELECT p.doc_id, p.i, COALESCE(v.id, -1) AS id "
            "FROM pos p LEFT JOIN vocab v ON v.token = p.ts[p.i]), "
            "agg AS (SELECT doc_id, string_agg(CAST(id AS VARCHAR), "
            "',' ORDER BY i) AS ids_csv FROM enc GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(a.ids_csv, '') AS ids_csv "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"),
        # postings assembled doc_id-ascending; engine and SQL both
        # order by the integer doc_id, so the strings compare exact
        "inverted_index": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS token "
            "FROM documents), "
            "tf AS (SELECT token, doc_id, count(*) AS tf FROM tok "
            "GROUP BY token, doc_id) "
            "SELECT token, CAST(count(*) AS BIGINT) AS df, "
            "string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) "
            "AS postings FROM tf GROUP BY token"),
        "anti_join": (
            "SELECT o_orderkey FROM orders WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"AND epoch_us(l_shipdate) >= {_ANTI_CUTOFF_US})"),
        "group_topk": (
            "WITH r AS (SELECT lang, doc_id, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY length(text) DESC, doc_id ASC) AS rn "
            "FROM documents) "
            "SELECT lang, doc_id, n_chars FROM r WHERE rn <= 3"),
        "bpe_token_count": _bpe_sql(),
        "conversion_funnel": (
            "WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t0 "
            "FROM events WHERE event_type = 'signup' GROUP BY 1) "
            "SELECT f.user_id, f.t0 AS first_ts_micros, "
            "CAST(CASE WHEN EXISTS (SELECT 1 FROM events p "
            "WHERE p.event_type = 'purchase' AND p.user_id = f.user_id "
            "AND epoch_us(p.ts) >= f.t0 "
            "AND epoch_us(p.ts) <= f.t0 + 86400000000) "
            "THEN 1 ELSE 0 END AS BIGINT) AS converted FROM f"),
        "event_gaps": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
            "AS gap FROM events) "
            "SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps, "
            "CAST(COALESCE(max(gap), -1) AS BIGINT) AS max_gap_micros "
            "FROM g GROUP BY user_id"),
        "doc_quartiles": (
            "SELECT lang, doc_id, CAST(ntile(4) OVER (PARTITION BY "
            "lang ORDER BY length(text), doc_id) AS BIGINT) AS quartile "
            "FROM documents"),
        "events_rollup": (
            "WITH d AS (SELECT event_type, "
            "epoch_us(ts) // 86400000000 AS day, count(*) AS n_events "
            "FROM events GROUP BY 1, 2) "
            "SELECT event_type, day, n_events FROM d "
            "UNION ALL SELECT event_type, -1, "
            "CAST(sum(n_events) AS BIGINT) FROM d GROUP BY event_type "
            "UNION ALL SELECT 'ALL', -1, CAST(sum(n_events) AS BIGINT) "
            "FROM d"),
        "normalized_dedup": (
            "WITH n AS (SELECT doc_id, trim(regexp_replace("
            "regexp_replace(regexp_replace(lower(text), "
            "'[0-9]+', '<num>', 'g'), '[.,;:!?]', '', 'g'), "
            "'\\s+', ' ', 'g')) AS t FROM documents) "
            "SELECT md5(t) AS norm_hash, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM n GROUP BY md5(t)"),
        # floor(log2(x)) == bit_length-1: verified exact for 1..200000
        # against Python int.bit_length (IEEE log2 of 2^k is exact)
        "length_histogram": (
            "WITH b AS (SELECT CASE WHEN length(text) = 0 THEN -1 "
            "ELSE CAST(floor(log2(length(text))) AS BIGINT) END AS "
            "bucket, CAST(length(text) AS BIGINT) AS chars "
            "FROM documents) "
            "SELECT bucket, count(*) AS n_docs, "
            "CAST(sum(chars) AS BIGINT) AS sum_chars FROM b "
            "GROUP BY bucket"),
        "events_pivot": (
            "SELECT epoch_us(ts) // 86400000000 AS day, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 "
                f"END) AS BIGINT) AS n_{t}"
                for t in ("click", "error", "purchase", "signup",
                          "view"))
            + " FROM events GROUP BY 1"),
        "text_normalize": (
            "WITH n AS (SELECT doc_id, trim(regexp_replace("
            "regexp_replace(regexp_replace(lower(text), "
            "'[0-9]+', '<num>', 'g'), '[.,;:!?]', '', 'g'), "
            "'\\s+', ' ', 'g')) AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, "
            "CAST(length(norm_text) AS BIGINT) AS norm_chars FROM n"),
        # repetition: same token stream as token_df (regexp_extract_all
        # \S+ == the engine's utf8_split_whitespace minus empties);
        # fractions are single double divisions of exact ints on both
        # sides, so the hashes match bit-for-bit
        "repetition_stats": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "unnest(generate_series(1, "
            "len(regexp_extract_all(text, '\\S+')))) AS p "
            "FROM documents), "
            "stats AS (SELECT doc_id, count(*) AS n, "
            "count(DISTINCT tok) AS nd FROM toks GROUP BY doc_id), "
            "bi AS (SELECT doc_id, tok || ' ' || "
            "lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS bg "
            "FROM toks), "
            "bimax AS (SELECT doc_id, max(c) AS maxc FROM ("
            "SELECT doc_id, bg, count(*) AS c FROM bi "
            "WHERE bg IS NOT NULL GROUP BY doc_id, bg) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tokens, "
            "COALESCE(CAST(s.n - s.nd AS DOUBLE) / s.n, 0.0) "
            "AS dup_token_frac, "
            "COALESCE(2.0 * b.maxc / s.n, 0.0) AS top_bigram_frac "
            "FROM documents d LEFT JOIN stats s USING (doc_id) "
            "LEFT JOIN bimax b ON d.doc_id = b.doc_id"),
        # decontamination: benchmark slice = doc_id % 17 == 0; word
        # 5-grams; NULL-propagating concat drops trailing positions
        # exactly like the engine's same-doc mask
        "decontaminate": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "unnest(generate_series(1, "
            "len(regexp_extract_all(text, '\\S+')))) AS p "
            "FROM documents), "
            "g AS (SELECT doc_id, tok || ' ' || "
            "lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w "
            "|| ' ' || lead(tok, 3) OVER w || ' ' || "
            "lead(tok, 4) OVER w AS gram FROM toks "
            "WINDOW w AS (PARTITION BY doc_id ORDER BY p) "
            "QUALIFY gram IS NOT NULL), "
            "bench AS (SELECT DISTINCT gram FROM g "
            "WHERE doc_id % 17 = 0), "
            "hits AS (SELECT g.doc_id, count(*) AS n_hits FROM g "
            "JOIN bench USING (gram) WHERE g.doc_id % 17 <> 0 "
            "GROUP BY g.doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
            "CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 "
            "END AS BIGINT) AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id) "
            "WHERE d.doc_id % 17 <> 0"),
        # PII masking: patterns imported from the pipeline module so
        # the oracle can never drift
        "pii_scrub": _pii_scrub_sql(),
        # mean corpus-wide bigram count per doc (integer sums, one
        # double division — bit-exact)
        "bigram_fluency": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "unnest(generate_series(1, "
            "len(regexp_extract_all(text, '\\S+')))) AS p "
            "FROM documents), "
            "bi AS (SELECT doc_id, tok || ' ' || "
            "lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS bg "
            "FROM toks), "
            "b2 AS (SELECT doc_id, bg FROM bi WHERE bg IS NOT NULL), "
            "cnt AS (SELECT bg, count(*) AS c FROM b2 GROUP BY bg), "
            "agg AS (SELECT doc_id, count(*) AS n_bigrams, "
            "sum(c) AS s FROM b2 JOIN cnt USING (bg) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
            "COALESCE(CAST(a.s AS DOUBLE) / a.n_bigrams, 0.0) "
            "AS avg_bigram_freq "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"),
        # frequent tokens above 1% of all token occurrences, exact
        # integer threshold compare
        "heavy_hitters": (
            "WITH toks AS (SELECT "
            "unnest(regexp_extract_all(text, '\\S+')) AS token "
            "FROM documents), tot AS (SELECT count(*) AS n FROM toks) "
            "SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences "
            "FROM toks, tot GROUP BY token, tot.n "
            "HAVING 100 * count(*) > 1 * tot.n"),
        # deterministic md5-bucket train/val/test assignment (same hash
        # contract as stratified_sample); thresholds imported from the
        # pipeline constants so the oracle can never drift
        "dataset_split": _dataset_split_sql(),
        # rarest-k terms per doc: integer (df, token) ordering only
        "distinctive_terms": (
            "WITH toks AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS token "
            "FROM documents), "
            "d AS (SELECT token, CAST(count(*) AS BIGINT) AS df "
            "FROM toks GROUP BY token), "
            "r AS (SELECT doc_id, token, df, CAST(row_number() OVER ("
            "PARTITION BY doc_id ORDER BY df, token) AS BIGINT) AS rank "
            "FROM toks JOIN d USING (token)) "
            "SELECT doc_id, rank, token, df FROM r WHERE rank <= 3"),
        # global-median quality gate; same score expression as
        # quality_score, threshold = quantile_disc(points, 0.5)
        "quality_filter": (
            "WITH s AS (SELECT doc_id, "
            "CAST(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 4 "
            "ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(text, '{_STOP}')) "
            "AS DOUBLE) / GREATEST(len(regexp_extract_all(text, "
            f"'{_TOK}')), 1) >= 0.01 THEN 4 ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(text, '{_PUNCT}')) "
            "AS DOUBLE) / GREATEST(length(text), 1) <= 0.2 THEN 2 "
            "ELSE 0 END AS BIGINT) AS quality_points FROM documents), "
            "t AS (SELECT quantile_disc(quality_points, 0.5) AS thr "
            "FROM s) "
            "SELECT doc_id, quality_points FROM s, t "
            "WHERE quality_points >= t.thr"),
        # reproducible corpus shuffle: dense rank in (md5, doc_id) order
        "deterministic_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY "
            "md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) "
            "AS shuffle_pos FROM documents"),
        # packing layout: global token prefix sum over doc_id order,
        # sliced into 2048-token sequences; empty docs occupy 0 tokens
        "pack_offsets": (
            "WITH t AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "s AS (SELECT doc_id, n_tokens, "
            "CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS tok_start FROM t) "
            "SELECT doc_id, n_tokens, tok_start, "
            "tok_start // 2048 AS seq_first, "
            "(tok_start + greatest(n_tokens, 1) - 1) // 2048 "
            "AS seq_last FROM s"),
        # cross-run incremental dedup: prior = doc_id % 3 == 0
        "incremental_dedup": (
            "WITH prior AS (SELECT DISTINCT md5(text) AS h "
            "FROM documents WHERE doc_id % 3 = 0), "
            "nw AS (SELECT doc_id, md5(text) AS h FROM documents "
            "WHERE doc_id % 3 <> 0) "
            "SELECT h AS content_hash, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM nw "
            "WHERE h NOT IN (SELECT h FROM prior) GROUP BY h"),
        # span-level exact dedup: chunks = consecutive 8-token windows;
        # winner = min (doc_id, chunk_id) per distinct chunk text; docs
        # reassembled from surviving chunks (fully-duplicate docs drop)
        "chunk_dedup": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "unnest(generate_series(1, "
            "len(regexp_extract_all(text, '\\S+')))) AS p "
            "FROM documents), "
            "chunks AS (SELECT doc_id, "
            "CAST((p - 1) // 8 AS BIGINT) AS chunk_id, "
            "string_agg(tok, ' ' ORDER BY p) AS ctext FROM toks "
            "GROUP BY doc_id, (p - 1) // 8), "
            "win AS (SELECT doc_id, chunk_id, ctext, row_number() "
            "OVER (PARTITION BY ctext ORDER BY doc_id, chunk_id) AS rn "
            "FROM chunks) "
            "SELECT doc_id, "
            "string_agg(ctext, ' ' ORDER BY chunk_id) AS kept_text, "
            "CAST(count(*) AS BIGINT) AS n_kept "
            "FROM win WHERE rn = 1 GROUP BY doc_id"),
        "token_df": (
            "SELECT tok AS token, CAST(count(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok "
            "FROM documents) GROUP BY tok"),
        "value_quantiles": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 1000000) AS BIGINT) AS v FROM events) "
            "SELECT event_type, "
            "quantile_disc(v, 0.25) AS q25_micros, "
            "quantile_disc(v, 0.5) AS q50_micros, "
            "quantile_disc(v, 0.75) AS q75_micros, "
            "quantile_disc(v, 0.95) AS q95_micros "
            "FROM v GROUP BY event_type"),
        "sampled_quantiles": _sampled_quantiles_sql(),
        "distinct_users_daily": (
            "SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            "count(*) AS n_events FROM events GROUP BY 1"),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            f"{_strata_case_sql()}"),
        # Q1-shape: integer cents/micros inner aggregate, averages
        # derived from the exact sums in the outer select (mirrors the
        # engine's finish step expression-for-expression)
        "pricing_summary": (
            "WITH a AS (SELECT l_returnflag, l_linestatus, "
            "sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) "
            "AS sum_qty_cents, "
            "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
            "AS sum_base_cents, "
            "sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) AS BIGINT)) AS sum_disc_price_cents, "
            "sum(CAST(floor(l_extendedprice * (1 - l_discount) * "
            "(1 + l_tax) * 100 + 0.5) AS BIGINT)) AS sum_charge_cents, "
            "sum(CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT)) "
            "AS sum_disc_micros, "
            "count(*) AS count_order FROM lineitem "
            f"WHERE epoch_us(l_shipdate) <= {PRICING_CUTOFF_US} "
            "GROUP BY 1, 2) "
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum_qty_cents AS BIGINT) AS sum_qty_cents, "
            "CAST(sum_base_cents AS BIGINT) AS sum_base_cents, "
            "CAST(sum_disc_price_cents AS BIGINT) "
            "AS sum_disc_price_cents, "
            "CAST(sum_charge_cents AS BIGINT) AS sum_charge_cents, "
            "CAST(sum_disc_micros AS BIGINT) AS sum_disc_micros, "
            "CAST(count_order AS BIGINT) AS count_order, "
            "CAST(sum_qty_cents AS DOUBLE) / 100.0 / count_order "
            "AS avg_qty, "
            "CAST(sum_base_cents AS DOUBLE) / 100.0 / count_order "
            "AS avg_price, "
            "CAST(sum_disc_micros AS DOUBLE) / 1000000.0 / count_order "
            "AS avg_disc FROM a"),
        "revenue_by_nation": (
            "SELECT n_name, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " AS revenue_cents FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
        "revenue_by_nation_join": (
            "SELECT n_name, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " AS revenue_cents FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
        "top_docs_by_length": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars "
            "FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 25"),
        "quantize_embeddings": (
            "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), m AS (SELECT vec_id, v, "
            "list_max(list_transform(v, x -> abs(x))) AS m FROM b) "
            "SELECT vec_id, m AS scale, array_to_string("
            "list_transform(v, x -> CAST(CASE WHEN m = 0 THEN 0 ELSE "
            "floor(abs(127 * x / m) + 0.5) * "
            "(CASE WHEN x < 0 THEN -1 ELSE 1 END) END AS BIGINT)), ',') "
            "AS qvec_csv FROM m"),
        # integer-exact priority sampling (Duffield-Lund-Thorup): same
        # clamp, same 43-bit hash fraction, same int64 division
        # integer dot products over the SAME int8 quantization as
        # quantize_embeddings: top-k membership, tie order and scores
        # are all exact
        "hard_negatives": (
            "WITH b AS (SELECT vec_id, label, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "m AS (SELECT vec_id, label, v, "
            "list_max(list_transform(v, x -> abs(x))) AS m FROM b), "
            "q AS (SELECT vec_id, label, list_transform(v, x -> "
            "CAST(CASE WHEN m = 0 THEN 0 ELSE floor(abs(127 * x / m) "
            "+ 0.5) * (CASE WHEN x < 0 THEN -1 ELSE 1 END) END "
            "AS BIGINT)) AS qv FROM m), "
            "probes AS (SELECT * FROM q ORDER BY vec_id LIMIT 20), "
            "scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS "
            "neighbor_id, CAST(list_dot_product(p.qv, c.qv) AS BIGINT) "
            "AS dot, row_number() OVER (PARTITION BY p.vec_id ORDER BY "
            "list_dot_product(p.qv, c.qv) DESC, c.vec_id) AS rank "
            "FROM probes p JOIN q c ON c.label <> p.label "
            "AND c.vec_id <> p.vec_id) "
            "SELECT probe_id, neighbor_id, dot, CAST(rank AS BIGINT) "
            "AS rank FROM scored WHERE rank <= 5"),
        "priority_sample": (
            "SELECT doc_id, priority FROM (SELECT doc_id, "
            "(least(length(text) + 1, 524287) * (1::BIGINT << 43)) // "
            "CAST(1 + (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, "
            "16))::UBIGINT >> 21) AS BIGINT) AS priority FROM documents) "
            "ORDER BY priority DESC, doc_id LIMIT 25"),
        # integer-scaled tf-idf: token-exact tf via split + equality,
        # idf = (N << 20) // df — no ln, so the BIGINT scores compare
        # exactly
        "tfidf_rank": (
            "WITH tf AS (SELECT doc_id, "
            r"len(list_filter(string_split_regex(text, '\s+'), "
            "x -> x = 'table')) AS t1, "
            r"len(list_filter(string_split_regex(text, '\s+'), "
            "x -> x = 'hash')) AS t2, "
            r"len(list_filter(string_split_regex(text, '\s+'), "
            "x -> x = 'merge')) AS t3 FROM documents), "
            "c AS (SELECT count(*) AS n, "
            "count(*) FILTER (WHERE t1 > 0) AS d1, "
            "count(*) FILTER (WHERE t2 > 0) AS d2, "
            "count(*) FILTER (WHERE t3 > 0) AS d3 FROM tf) "
            "SELECT doc_id, "
            "t1 * (CASE WHEN d1 = 0 THEN 0 ELSE (n * 1048576) // d1 END) "
            "+ t2 * (CASE WHEN d2 = 0 THEN 0 ELSE (n * 1048576) // d2 END) "
            "+ t3 * (CASE WHEN d3 = 0 THEN 0 ELSE (n * 1048576) // d3 END) "
            "AS score FROM tf, c ORDER BY score DESC, doc_id LIMIT 25"),
        # per-dim moments over the int8 codes (same quantization
        # expression the quantize_embeddings oracle pins): integer sums
        # are order-independent, the mean/var doubles are one exact-int
        # division each
        "embedding_stats": (
            "WITH m AS (SELECT CAST(embedding AS DOUBLE[]) AS v, "
            "list_max(list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> abs(x))) AS mx FROM embeddings), "
            "q AS (SELECT d.i AS dim, CASE WHEN mx = 0 THEN 0 ELSE "
            "CAST(floor(abs(127 * v[d.i + 1] / mx) + 0.5) * "
            "(CASE WHEN v[d.i + 1] < 0 THEN -1 ELSE 1 END) AS BIGINT) "
            "END AS qv FROM m, range(64) d(i)) "
            "SELECT dim, count(*) AS n_vecs, sum(qv) AS sum_q, "
            "CAST(sum(qv) AS DOUBLE) / count(*) AS mean_q, "
            "CAST(count(*) * sum(qv * qv) - sum(qv) * sum(qv) AS DOUBLE)"
            " / (count(*) * count(*)) AS var_q FROM q GROUP BY dim"),
        "label_centroids": (
            "WITH m AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(embedding AS DOUBLE[]) AS v, "
            "list_max(list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> abs(x))) AS mx FROM embeddings), "
            "q AS (SELECT label, d.i AS dim, CASE WHEN mx = 0 THEN 0 "
            "ELSE CAST(floor(abs(127 * v[d.i + 1] / mx) + 0.5) * "
            "(CASE WHEN v[d.i + 1] < 0 THEN -1 ELSE 1 END) AS BIGINT) "
            "END AS qv FROM m, range(64) d(i)) "
            "SELECT label, dim, count(*) AS n_vecs, "
            "CAST(sum(qv) AS DOUBLE) / count(*) AS centroid_q "
            "FROM q GROUP BY label, dim"),
        "semi_join": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders "
            "WHERE o_totalprice >= 450000.0)"),
        "left_outer_join": (
            "SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice "
            "FROM customer c LEFT JOIN "
            "(SELECT * FROM orders WHERE o_totalprice >= 450000.0) o "
            "ON c.c_custkey = o.o_custkey"),
        # full outer over two pre-aggregated sides; spend in integer
        # cents (floor(x*100+0.5)) because double sums are
        # order-dependent.  coalesce mirrors Ray's merged key column.
        "full_outer_join": (
            "WITH o AS (SELECT o_custkey, count(*) AS order_cnt, "
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS spend_cents FROM orders GROUP BY o_custkey), "
            "e AS (SELECT user_id, count(*) AS event_cnt FROM events "
            "GROUP BY user_id) "
            "SELECT coalesce(o.o_custkey, e.user_id) AS o_custkey, "
            "o.order_cnt, o.spend_cents, e.event_cnt "
            "FROM o FULL JOIN e ON o.o_custkey = e.user_id"),
        # latest record per key, (ts, event_id) tiebreak — the
        # recrawl-merge shape
        "upsert_latest": (
            "SELECT user_id, event_id, ts, event_type, value FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "WHERE rn = 1"),
        # fixed 32-token tiling windows; token lists must match the
        # engine's whitespace split exactly (regex \s+, empties dropped)
        "token_windows": (
            r"WITH t AS (SELECT doc_id, list_filter("
            r"string_split_regex(text, '\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "w AS (SELECT doc_id, toks, len(toks) AS n, "
            "CAST(ceil(greatest(len(toks) - 32, 0) / 32.0) AS BIGINT) "
            "+ 1 AS nw FROM t WHERE len(toks) > 0), "
            "x AS (SELECT doc_id, unnest(range(nw)) AS win_idx, n, "
            "toks FROM w) "
            "SELECT doc_id, win_idx, "
            "least(n - win_idx * 32, 32) AS n_tokens, "
            "array_to_string(toks[win_idx * 32 + 1 : "
            "least(n, win_idx * 32 + 32)], ' ') AS win_text FROM x"),
        # the WHOLE html->text transform in SQL: DuckDB's
        # regexp_replace is RE2, the engine's pc.replace_substring_
        # regex is RE2 — same patterns, byte-identical output (entity
        # decode order matters: &amp; last, both sides)
        "html_extract": (
            "SELECT url, text, CAST(length(text) AS BIGINT) AS n_chars "
            "FROM (SELECT url, trim(regexp_replace("
            "replace(replace(replace(replace(replace(replace("
            "regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(body, '(?is)<script\\b.*?</script>', ' ', "
            "'g'), '(?is)<style\\b.*?</style>', ' ', 'g'), "
            "'(?s)<!--.*?-->', ' ', 'g'), '<[^>]*>', ' ', 'g'), "
            "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
            "'&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'), "
            "'\\s+', ' ', 'g')) AS text "
            f"FROM read_parquet('{corp}') "
            "WHERE content_type LIKE 'text/html%')"),
        # running cumulative sum per key, (ts, event_id) frame order,
        # integer micros (the events_hourly convention)
        "running_total": (
            "SELECT user_id, event_id, ts, "
            "sum(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS cum_value_micros FROM events"),
        # real json_extract on the oracle side proves the engine's
        # RE2 flat-field fast path agrees with a full JSON parser
        "json_extract_agg": (
            "SELECT event_type, count(*) AS n_events, "
            "sum(coalesce(CAST(json_extract_string(props, '$.k') "
            "AS BIGINT), 0)) AS sum_k FROM events GROUP BY event_type"),
        # bloom prefilter + exact verify == plain EXISTS (no false
        # negatives; the exact join removes false positives)
        "bloom_semi_join": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders "
            "WHERE o_totalprice >= 450000.0)"),
        # daily active/new/retained/churned; churn is relative to the
        # previous PRESENT day (both sides lag over the same rows)
        "user_retention": (
            "WITH a AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day "
            "FROM events), "
            "l AS (SELECT user_id, day, "
            "min(day) OVER (PARTITION BY user_id) AS first_day, "
            "lag(day) OVER (PARTITION BY user_id ORDER BY day) "
            "AS prev_day FROM a), "
            "d AS (SELECT day, count(*) AS n_active, "
            "sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) "
            "AS n_new, "
            "sum(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) "
            "AS n_retained FROM l GROUP BY day) "
            "SELECT day, n_active, CAST(n_new AS BIGINT) AS n_new, "
            "CAST(n_retained AS BIGINT) AS n_retained, "
            "CAST(coalesce(lag(n_active) OVER (ORDER BY day), 0) "
            "- n_retained AS BIGINT) AS n_churned FROM d"),
        # composed C4 recipe: scrub -> quality gate -> keep-first
        # dedup -> split, from the same constants as the parts
        "c4_pipeline": _c4_sql(),
        # feature assembly == the quality/token expressions inline +
        # one equi-join against the label table
        "assemble_features": (
            "SELECT d.doc_id, d.lang, "
            f"CAST(len(regexp_extract_all(d.text, '{_TOK}')) AS BIGINT) "
            "AS n_tokens, "
            "CAST(CASE WHEN length(d.text) BETWEEN 100 AND 20000 THEN 4 "
            "ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(d.text, "
            f"'{_STOP}')) AS DOUBLE) / GREATEST(len(regexp_extract_all("
            f"d.text, '{_TOK}')), 1) >= 0.01 THEN 4 ELSE 0 END "
            f"+ CASE WHEN CAST(len(regexp_extract_all(d.text, "
            f"'{_PUNCT}')) AS DOUBLE) / GREATEST(length(d.text), 1) "
            "<= 0.2 THEN 2 ELSE 0 END AS BIGINT) AS quality_points, "
            "CAST(e.label AS BIGINT) AS label "
            "FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id"),
        # lossless compaction: the round-trip read must equal the
        # original narrow projection row-for-row
        "compact_files": (
            "SELECT doc_id, n_chars FROM documents"),
        # PERCENT_RANK in exact integer ppm over the global_rank order
        "percent_rank": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "text, '\\S+')) AS BIGINT) AS n_tokens FROM documents), "
            "r AS (SELECT doc_id, n_tokens, CAST(row_number() OVER "
            "(ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS pos "
            "FROM t) "
            "SELECT doc_id, n_tokens, pos, "
            "((pos - 1) * 1000000) // GREATEST("
            "(SELECT count(*) FROM documents) - 1, 1) AS pct_ppm "
            "FROM r"),
        # exact global quantile_disc thresholds + clip
        "winsorize": (
            "WITH v AS (SELECT event_id, "
            "CAST(round(value * 1000000) AS BIGINT) AS value_micros "
            "FROM events), "
            "t AS (SELECT quantile_disc(value_micros, 0.05) AS lo, "
            "quantile_disc(value_micros, 0.95) AS hi FROM v) "
            "SELECT event_id, value_micros, "
            "least(greatest(value_micros, (SELECT lo FROM t)), "
            "(SELECT hi FROM t)) AS clipped_micros FROM v"),
        # schema profile: one UNION ALL leg per column, native-type
        # extrema with NULLs marking the inapplicable side
        "table_profile": (
            " UNION ALL ".join(
                [("SELECT '{c}' AS column, count(*) AS n_rows, "
                  "count(*) - count({c}) AS n_nulls, "
                  "CAST(min({c}) AS VARCHAR) AS min_int, "
                  "CAST(max({c}) AS VARCHAR) AS max_int, "
                  "'' AS min_str, '' AS max_str FROM documents")
                 .format(c=c) for c in ("doc_id", "n_chars")]
                + [("SELECT '{c}' AS column, count(*) AS n_rows, "
                    "count(*) - count({c}) AS n_nulls, "
                    "'' AS min_int, '' AS max_int, "
                    "coalesce(min({c}), '') AS min_str, "
                    "coalesce(max({c}), '') AS max_str "
                    "FROM documents")
                   .format(c=c) for c in ("text", "lang", "source")])),
        # dense hourly grid == range() cross join + left join fill
        "gap_fill": (
            "WITH d AS (SELECT event_type, "
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, "
            "count(*) AS n FROM events GROUP BY 1, 2), "
            "b AS (SELECT unnest(generate_series("
            "(SELECT min(bucket) FROM d), "
            "(SELECT max(bucket) FROM d))) AS bucket), "
            "t AS (SELECT DISTINCT event_type FROM events) "
            "SELECT t.event_type, b.bucket, "
            "CAST(coalesce(d.n, 0) AS BIGINT) AS n_events "
            "FROM t CROSS JOIN b LEFT JOIN d "
            "ON d.event_type = t.event_type AND d.bucket = b.bucket"),
        # bounded ROWS frame; positive values so // floors identically
        "moving_avg": (
            "WITH m AS (SELECT user_id, event_id, ts, "
            "CAST(round(value * 1000000) AS BIGINT) AS v FROM events) "
            "SELECT user_id, event_id, ts, "
            "CAST(sum(v) OVER w AS BIGINT) AS win_sum_micros, "
            "CAST(count(*) OVER w AS BIGINT) AS win_n, "
            "CAST(sum(v) OVER w // count(*) OVER w AS BIGINT) "
            "AS avg_micros FROM m WINDOW w AS ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"),
        # per-source language composition; exact integer ppm share ==
        # window-over-aggregate on the oracle side
        "lang_mix": (
            "SELECT source, lang, count(*) AS n_docs, "
            "(count(*) * 1000000) // "
            "(sum(count(*)) OVER (PARTITION BY source)) AS share_ppm "
            "FROM documents GROUP BY source, lang"),
        # sqrt-flattened per-source mixing weights; all-integer ppm
        # (isqrt == FLOOR(SQRT(x)) exactly for x < 2^52)
        "domain_mix": (
            "WITH t AS (SELECT source, "
            f"CAST(len(regexp_extract_all(text, '{_TOK}')) AS BIGINT) "
            "AS tok FROM documents) "
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(tok) AS BIGINT) AS n_tokens, "
            "CAST((sum(tok) * 1000000) // (sum(sum(tok)) OVER ()) "
            "AS BIGINT) AS token_share_ppm, "
            "CAST((CAST(FLOOR(SQRT(CAST(sum(tok) AS DOUBLE))) AS BIGINT)"
            " * 1000000) // "
            "(sum(CAST(FLOOR(SQRT(CAST(sum(tok) AS DOUBLE))) AS BIGINT))"
            " OVER ()) AS BIGINT) AS weight_ppm "
            "FROM t GROUP BY source"),
        # content-defined chunking dedup signal — scalar-twin golden
        # (goldens.cdc_stats_scalar is the readable spec)
        "cdc_chunk_stats": (
            "SELECT doc_id, n_chunks, n_dup_chunks, dup_ppm "
            f"FROM read_parquet('{gcdc}')"),
        # the blend materialized: per-source quota from the sqrt
        # weights, lowest-md5-rank docs kept (source_cap contract)
        "domain_mix_sample": (
            "WITH t AS (SELECT source, "
            f"CAST(len(regexp_extract_all(text, '{_TOK}')) AS BIGINT) "
            "AS tok FROM documents), "
            "w AS (SELECT source, "
            "CAST(FLOOR(SQRT(CAST(sum(tok) AS DOUBLE))) AS BIGINT) "
            "AS sq FROM t GROUP BY source), "
            "q AS (SELECT source, "
            "CAST((sq * 200) // (sum(sq) OVER ()) AS BIGINT) AS quota "
            "FROM w), "
            "r AS (SELECT doc_id, source, CAST(row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) "
            "AS rank FROM documents) "
            "SELECT r.doc_id, r.source, r.rank FROM r JOIN q USING "
            "(source) WHERE r.rank <= q.quota"),
        # per-source cap by md5(doc_id) rank — same hash contract as
        # stratified_sample (rank over the full 32-hex digest)
        "source_cap": (
            "SELECT doc_id, source, rank FROM ("
            "SELECT doc_id, source, CAST(row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) "
            "AS rank FROM documents) WHERE rank <= 10"),
        # consecutive-event transition counts == LEAD window + GROUP BY
        "event_transitions": (
            "WITH l AS (SELECT event_type AS src_type, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS dst_type FROM events) "
            "SELECT src_type, dst_type, count(*) AS n_trans FROM l "
            "WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type"),
        # CUBE == four grouping sets; 'ALL' sentinel (real values are
        # never NULL so coalesce is unambiguous); integer cents
        "orders_cube": (
            "SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus, "
            "coalesce(o_orderpriority, 'ALL') AS o_orderpriority, "
            "count(*) AS n_orders, "
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS revenue_cents FROM orders "
            "GROUP BY CUBE(o_orderstatus, o_orderpriority)"),
        # integer-exact moment sums (quantity, discount-pct) the
        # driver-side Pearson finish consumes
        "corr_stats": (
            "WITH t AS (SELECT l_returnflag, "
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q, "
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d "
            "FROM lineitem) "
            "SELECT l_returnflag, count(*) AS n_rows, "
            "sum(q) AS sum_qty, sum(d) AS sum_disc, "
            "sum(q * d) AS sum_qty_disc, sum(q * q) AS sum_qty_sq, "
            "sum(d * d) AS sum_disc_sq FROM t GROUP BY l_returnflag"),
        "ann_bruteforce": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings "
            "WHERE vec_id = (SELECT min(vec_id) FROM embeddings)), "
            "s AS (SELECT vec_id, list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), CAST((SELECT qe FROM q) AS "
            "DOUBLE[])) AS cos FROM embeddings) "
            "SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, "
            "vec_id ASC) AS BIGINT) AS rank FROM s "
            "ORDER BY cos DESC, vec_id ASC LIMIT 10"),
        "embedding_neardup": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.v, b.v) >= 0.95 "
            "ORDER BY vec_a, vec_b"),
        "crawl_order": (
            f"SELECT round, seq, url FROM read_parquet('{go}')"),
        "crawl_seen": (
            f"SELECT digest, status FROM read_parquet('{gs}') "
            "ORDER BY digest"),
        "crawl_mirror": (
            f"SELECT mirror_path, url, body FROM read_parquet('{gm}')"),
        "mirror_path_fn": (
            f"SELECT url, mirror_path FROM read_parquet('{gm}')"),
        "extract_links": (
            f"SELECT doc_id, link_seq, link_url FROM read_parquet('{gl}')"),
        # integer-exact PageRank: the same floor-arithmetic update
        # unrolled as chained CTEs (see pipelines/graph.py)
        "pagerank": _pagerank_sql(gl),
        # interleaved-span operators: DuckDB unnests the same nested
        # list<struct> parquet the engine flattens zero-copy
        # kind-bigram transitions in offset order; has_next (lead(1))
        # distinguishes "no next span" from a genuinely-null next kind
        "span_transitions": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.kind AS kind, "
            "sp.\"offset\" AS o FROM s), "
            "w AS (SELECT kind AS kind_from, "
            "lead(kind) OVER win AS kind_to, "
            "lead(1) OVER win AS has_next FROM f "
            "WINDOW win AS (PARTITION BY doc_id ORDER BY o)) "
            "SELECT kind_from, kind_to, CAST(count(*) AS BIGINT) AS n "
            "FROM w WHERE has_next IS NOT NULL "
            "GROUP BY kind_from, kind_to"),
        # recrawl delta: same deterministic new-snapshot transform as
        # _q_snapshot_diff; unchanged pages are filtered in the WHERE
        "snapshot_diff": (
            "WITH p AS (SELECT doc_id, md5(text) AS h FROM documents), "
            "n AS (SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 THEN "
            "text || ' rev2' ELSE text END) AS h FROM documents "
            "WHERE doc_id % 7 <> 3 "
            "UNION ALL SELECT doc_id + 10000000, "
            "md5('added page ' || CAST(doc_id AS VARCHAR)) "
            "FROM documents WHERE doc_id % 13 = 0) "
            "SELECT COALESCE(n.doc_id, p.doc_id) AS doc_id, "
            "CASE WHEN p.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change "
            "FROM n FULL OUTER JOIN p ON n.doc_id = p.doc_id "
            "WHERE p.doc_id IS NULL OR n.doc_id IS NULL "
            "OR n.h <> p.h"),
        "span_stats": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.kind AS kind, sp.text AS t, "
            "sp.media_ref AS mr FROM s) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
            "CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_text_spans, "
            "CAST(sum(CASE WHEN mr IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_media_spans, "
            "CAST(sum(COALESCE(len(t), 0)) AS BIGINT) AS text_chars "
            "FROM f GROUP BY doc_id"),
        # exact dedup on the north-rule span-sequence invariant: the
        # canonical US/RS/NUL encoding is identical on both sides
        "interleaved_dedup": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.\"offset\" AS o, "
            "coalesce(sp.kind, chr(0)) || chr(31) || "
            "coalesce(sp.text, chr(0)) || chr(31) || "
            "coalesce(sp.media_ref, chr(0)) AS rec FROM s), "
            "dd AS (SELECT doc_id, md5(string_agg(rec, chr(30) "
            "ORDER BY o)) AS span_digest FROM f GROUP BY doc_id) "
            "SELECT span_digest, count(*) AS n_docs, "
            "min(doc_id) AS min_doc_id FROM dd GROUP BY span_digest"),
        # composed multimodal recipe: the gate CTE joined against the
        # span-digest winner set
        "interleaved_curation": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.\"offset\" AS o, sp.kind AS kind, "
            "sp.text AS t, sp.media_ref AS mr FROM s), "
            "g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
            "CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_text_spans, "
            "CAST(sum(CASE WHEN mr IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_media_spans, "
            "CAST(sum(COALESCE(len(t), 0)) AS BIGINT) AS text_chars "
            "FROM f GROUP BY doc_id), "
            "gate AS (SELECT doc_id, n_spans, n_media_spans, "
            "text_chars, (n_media_spans * 1000000) // n_spans "
            "AS media_ppm FROM g WHERE text_chars >= 20 "
            "AND n_text_spans >= 1 "
            "AND (n_media_spans * 1000000) // n_spans <= 600000), "
            "rec AS (SELECT doc_id, coalesce(kind, chr(0)) || chr(31) "
            "|| coalesce(t, chr(0)) || chr(31) || coalesce(mr, chr(0)) "
            "AS r, o FROM f), "
            "dd AS (SELECT doc_id, md5(string_agg(r, chr(30) "
            "ORDER BY o)) AS span_digest FROM rec GROUP BY doc_id), "
            "w AS (SELECT min(doc_id) AS doc_id FROM dd "
            "GROUP BY span_digest) "
            "SELECT gate.* FROM gate JOIN w USING (doc_id)"),
        # the span_stats profile + the integer-ppm curation gate
        "mm_quality_gate": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.kind AS kind, sp.text AS t, "
            "sp.media_ref AS mr FROM s), "
            "g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
            "CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_text_spans, "
            "CAST(sum(CASE WHEN mr IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_media_spans, "
            "CAST(sum(COALESCE(len(t), 0)) AS BIGINT) AS text_chars "
            "FROM f GROUP BY doc_id) "
            "SELECT doc_id, n_spans, n_media_spans, text_chars, "
            "(n_media_spans * 1000000) // n_spans AS media_ppm FROM g "
            "WHERE text_chars >= 20 AND n_text_spans >= 1 "
            "AND (n_media_spans * 1000000) // n_spans <= 600000"),
        "media_manifest": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')) "
            "SELECT doc_id, CAST(sp.\"offset\" AS BIGINT) AS "
            "span_offset, sp.kind AS kind, sp.media_ref AS media_ref "
            "FROM s WHERE sp.media_ref IS NOT NULL"),
        # interleaved -> plain text: ordered string_agg over non-empty
        # span texts; the left join keeps text-free docs as ''
        "span_text": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.\"offset\" AS o, sp.text AS t "
            "FROM s WHERE COALESCE(len(sp.text), 0) > 0), "
            "j AS (SELECT doc_id, string_agg(t, ' ' ORDER BY o) AS "
            "text FROM f GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(j.text, '') AS text FROM "
            f"read_parquet('{fdoc}') d LEFT JOIN j USING (doc_id)"),
        # caption mining: strictly-preceding/following non-empty
        # text-kind span via IGNORE NULLS window fills — the same
        # grouped ffill/bfill the engine vectorizes per batch
        "media_context": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, sp.\"offset\" AS o, sp.kind AS kind, "
            "sp.text AS t, sp.media_ref AS mr FROM s), "
            "w AS (SELECT doc_id, o, mr, "
            "last_value(CASE WHEN kind = 'text' AND COALESCE(len(t), 0)"
            " > 0 THEN t END IGNORE NULLS) OVER (PARTITION BY doc_id "
            "ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "PRECEDING) AS pt, "
            "first_value(CASE WHEN kind = 'text' AND COALESCE(len(t), "
            "0) > 0 THEN t END IGNORE NULLS) OVER (PARTITION BY doc_id "
            "ORDER BY o ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED "
            "FOLLOWING) AS nt FROM f) "
            "SELECT doc_id, CAST(o AS BIGINT) AS span_offset, "
            "mr AS media_ref, COALESCE(pt, '') AS prev_text, "
            "COALESCE(nt, '') AS next_text FROM w WHERE mr IS NOT NULL"),
        # asset dedup: first occurrence by (doc_id, offset) through the
        # same tab-separated zero-padded min key the engine exchanges
        "media_dedup": (
            "WITH s AS (SELECT doc_id, unnest(spans) AS sp FROM "
            f"read_parquet('{fdoc}')), "
            "f AS (SELECT doc_id, CAST(sp.\"offset\" AS BIGINT) AS o, "
            "sp.media_ref AS mr FROM s WHERE sp.media_ref IS NOT NULL), "
            "k AS (SELECT mr, doc_id || chr(9) || "
            "lpad(CAST(o AS VARCHAR), 12, '0') AS key FROM f) "
            "SELECT mr AS media_ref, CAST(count(*) AS BIGINT) AS "
            "n_refs, split_part(min(key), chr(9), 1) AS first_doc_id, "
            "CAST(split_part(min(key), chr(9), 2) AS BIGINT) AS "
            "first_offset FROM k GROUP BY mr"),
        # full kNN self-join over the SAME int8 quantization as
        # quantize_embeddings: integer dots, (dot DESC, id) tie order
        "knn_join": (
            "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS "
            "v FROM embeddings), "
            "m AS (SELECT vec_id, v, list_max(list_transform(v, "
            "x -> abs(x))) AS m FROM b), "
            "q AS (SELECT vec_id, list_transform(v, x -> "
            "CAST(CASE WHEN m = 0 THEN 0 ELSE floor(abs(127 * x / m) "
            "+ 0.5) * (CASE WHEN x < 0 THEN -1 ELSE 1 END) END "
            "AS BIGINT)) AS qv FROM m), "
            "scored AS (SELECT p.vec_id AS vec_id, c.vec_id AS "
            "neighbor_id, CAST(list_dot_product(p.qv, c.qv) AS BIGINT) "
            "AS dot, row_number() OVER (PARTITION BY p.vec_id ORDER BY "
            "list_dot_product(p.qv, c.qv) DESC, c.vec_id) AS rank "
            "FROM q p JOIN q c ON c.vec_id <> p.vec_id) "
            "SELECT vec_id, neighbor_id, dot, CAST(rank AS BIGINT) AS "
            "rank FROM scored WHERE rank <= 5"),
        # triangle census: same canonical a<b edge set, wedge total
        # from degrees, triangles via the x<y<z two-join enumeration
        # interleaved multimodal packing: per-doc cost = span-text
        # tokens + 64 per media span, prefix-summed in deterministic
        # shuffle order (md5(doc_id), doc_id), sliced into 2048-token
        # sequences; docs with no spans cost 0 (point occupancy)
        "mm_pack": _mm_cte + (
            " SELECT doc_id, n_tokens, n_media, cost, tok_start, "
            "tok_start // 2048 AS seq_first, "
            "(tok_start + greatest(cost, 1) - 1) // 2048 AS seq_last "
            "FROM sc"),
        # mm_pack layout exploded to (sequence, doc) slice rows: the
        # same CTE chain, one generate_series unnest per doc run
        "pack_manifest": _mm_cte + (
            ", m AS (SELECT doc_id, cost, tok_start, "
            "unnest(generate_series(tok_start // 2048, "
            "(tok_start + greatest(cost, 1) - 1) // 2048)) AS seq "
            "FROM sc) "
            "SELECT seq, doc_id, "
            "CAST(greatest(tok_start, seq * 2048) - tok_start "
            "AS BIGINT) AS sl_start, "
            "CAST(greatest(least(tok_start + cost, (seq + 1) * 2048) "
            "- greatest(tok_start, seq * 2048), 0) AS BIGINT) "
            "AS sl_tokens FROM m"),
        # crawl tier: min link hops from the seed set (recursive CTE twin)
        "bfs_depth": _bfs_sql,
        # resumable sink round-trip: per-md5-prefix-bucket doc counts
        # and char sums must survive write + read-back bit-exactly
        "partitioned_write": (
            "SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS "
            "bucket, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(text)) AS BIGINT) AS n_chars "
            "FROM documents GROUP BY bucket"),
        "triangle_count": (
            "WITH e AS (SELECT DISTINCT CASE WHEN doc_id < link_url "
            "THEN doc_id ELSE link_url END AS a, CASE WHEN doc_id < "
            "link_url THEN link_url ELSE doc_id END AS b FROM "
            f"read_parquet('{gl}') WHERE doc_id <> link_url), "
            "d AS (SELECT url, count(*) AS deg FROM (SELECT a AS url "
            "FROM e UNION ALL SELECT b AS url FROM e) GROUP BY url), "
            "w AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) "
            "AS n_wedges FROM d), "
            "t AS (SELECT count(*) AS n FROM e e1 JOIN e e2 ON "
            "e2.a = e1.a AND e1.b < e2.b JOIN e e3 ON e3.a = e1.b "
            "AND e3.b = e2.b) "
            "SELECT w.n_wedges AS n_wedges, CAST(t.n AS BIGINT) AS "
            "n_triangles, CAST(CASE WHEN w.n_wedges = 0 THEN 0 ELSE "
            "(3000000 * t.n) // w.n_wedges END AS BIGINT) AS gcc_ppm "
            "FROM w, t"),
        "degree_stats": (
            "WITH e AS (SELECT doc_id AS src, link_url AS dst FROM "
            f"read_parquet('{gl}')), "
            "n AS (SELECT DISTINCT url FROM (SELECT src AS url FROM e "
            "UNION ALL SELECT dst FROM e)), "
            "o AS (SELECT src, count(*) AS od FROM e GROUP BY src), "
            "i AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst) "
            "SELECT n.url, CAST(COALESCE(o.od, 0) AS BIGINT) AS "
            "out_degree, CAST(COALESCE(i.idg, 0) AS BIGINT) AS "
            "in_degree FROM n LEFT JOIN o ON o.src = n.url "
            "LEFT JOIN i ON i.dst = n.url"),
        "global_rank": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "text, '\\S+')) AS BIGINT) AS n_tokens FROM documents) "
            "SELECT doc_id, n_tokens, CAST(row_number() OVER "
            "(ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS pos "
            "FROM t"),
        # integer-exact PMI argument: same floor-division order as the
        # engine (see text_analysis.pmi_collocations)
        "pmi_collocations": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(text, "
            "'\\S+')) AS tok FROM documents), "
            "tot AS (SELECT count(*) AS n_tok FROM toks), "
            "uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
            "seq AS (SELECT doc_id, unnest(regexp_extract_all(text, "
            "'\\S+')) AS tok, unnest(generate_series(1, "
            "len(regexp_extract_all(text, '\\S+')))) AS p "
            "FROM documents), "
            "bi AS (SELECT tok AS w1, lead(tok) OVER (PARTITION BY "
            "doc_id ORDER BY p) AS w2 FROM seq), "
            "bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi "
            "WHERE w2 IS NOT NULL GROUP BY w1, w2 "
            "HAVING count(*) >= 5) "
            "SELECT bc.w1, bc.w2, CAST(bc.c_xy AS BIGINT) AS c_xy, "
            "CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y, "
            "CAST(((bc.c_xy * 1000000) // u1.c) * tot.n_tok // u2.c "
            "AS BIGINT) AS pmi_ratio_micros "
            "FROM bc JOIN uni u1 ON u1.tok = bc.w1 "
            "JOIN uni u2 ON u2.tok = bc.w2, tot"),
        "length_outliers": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "text, '\\S+')) AS BIGINT) AS n_tokens FROM documents), "
            "q AS (SELECT quantile_disc(n_tokens, 0.25) AS q1, "
            "quantile_disc(n_tokens, 0.75) AS q3 FROM t) "
            "SELECT t.doc_id, t.n_tokens, "
            "(2 * t.n_tokens < 2 * q.q1 - 3 * (q.q3 - q.q1) OR "
            "2 * t.n_tokens > 2 * q.q3 + 3 * (q.q3 - q.q1)) "
            "AS is_outlier FROM t, q"),
        # 8-gram windows: the || chain nulls out (and so drops) every
        # window crossing the doc end, mirroring the engine's same-doc
        # mask
        "dup_spans": (
            "WITH seq AS (SELECT doc_id, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "unnest(generate_series(1, len(regexp_extract_all(text, "
            "'\\S+')))) AS p FROM documents), "
            "g AS (SELECT doc_id, p, tok"
            + "".join(f" || ' ' || lead(tok, {j}) OVER w"
                      for j in range(1, 8)) +
            " AS gram FROM seq WINDOW w AS "
            "(PARTITION BY doc_id ORDER BY p)), "
            "g2 AS (SELECT doc_id, p, gram FROM g "
            "WHERE gram IS NOT NULL), "
            "d AS (SELECT gram, count(DISTINCT doc_id) AS n_docs "
            "FROM g2 GROUP BY gram "
            "HAVING count(DISTINCT doc_id) >= 2) "
            "SELECT g2.doc_id, g2.p AS pos, "
            "CAST(d.n_docs AS BIGINT) AS n_docs "
            "FROM g2 JOIN d USING (gram)"),
        "content_type_gate": (
            "SELECT url, CASE WHEN lower(trim(split_part(content_type, "
            f"';', 1))) IN ({_ACCEPTED_SQL}) THEN true ELSE false END AS "
            f"accepted FROM read_parquet('{corp}')"),
        "pages_by_host": (
            "SELECT host, count(*) AS n_pages FROM "
            f"read_parquet('{corp}') GROUP BY host"),
        # salted skew join: the salt is an engine-internal partitioning
        # detail, so the oracle is the PLAIN join with the same
        # md5-derived dim attribute (integer-exact both sides)
        "skew_join": (
            "WITH dim AS (SELECT host, CAST(('0x' || "
            "substr(md5(host), 1, 4))::INTEGER % 8 AS BIGINT) "
            "AS host_group FROM (SELECT DISTINCT host FROM "
            f"read_parquet('{corp}'))) "
            "SELECT c.url, c.host, d.host_group FROM "
            f"read_parquet('{corp}') c JOIN dim d USING (host)"),
        # deterministic per-row hash ops: goldens from the independent
        # pure-Python scalar twins (goldens.py), hash-verified like the
        # crawl goldens
        "simhash": (
            "SELECT doc_id, simhash FROM "
            f"read_parquet('{sg['simhash']}')"),
        # banded-candidate recall is EXACT by pigeonhole, so the
        # all-pairs hamming over the scalar-twin signatures is a true
        # whole-algorithm oracle for the banding + bucket verify
        "simhash_neardup": (
            "WITH s AS (SELECT doc_id, ('0x' || simhash)::UBIGINT AS "
            f"sig FROM read_parquet('{sg['simhash']}')) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.sig, b.sig)) <= 3"),
        "fingerprint": (
            "SELECT doc_id, fingerprint FROM "
            f"read_parquet('{sg['fingerprint']}')"),
        # multimodal fake-decode twins: pure-Python scalar goldens
        # (blake2b features are not SQL-expressible; same
        # two-implementations pattern as simhash/fingerprint)
        "media_features": (
            "SELECT media_id, kind, width, height, duration_ms, "
            "mean_byte, n_bytes FROM "
            f"read_parquet('{gmed['media_features']}')"),
        "video_frames": (
            "SELECT media_id, frame_idx, frame_digest FROM "
            f"read_parquet('{gmed['video_frames']}')"),
        # deterministic given the fixed hyperplane family: scalar-twin
        # golden (same two-implementations pattern as simhash)
        "ann_lsh": (
            f"SELECT vec_id, rank FROM read_parquet('{ga}')"),
        # deterministic given the fixed k-means spec (sample, init,
        # iteration count): scalar-twin golden, same pattern
        "ann_ivf": (
            f"SELECT vec_id, rank FROM read_parquet('{gi}')"),
        "semantic_dedup": (
            f"SELECT vec_id, cluster, keep FROM read_parquet('{gsd}')"),
        # the whole curation handoff is SQL-expressible over the crawl's
        # own parquet output (span unnest + string_agg + winner join)
        "curate_crawl": _curate_oracle_sql(),
        # minhash-LSH pairs + components: scalar-twin goldens (pure
        # Python int re-implementation of the banding spec + union-find
        # vs the engine's vectorized numpy path and distributed
        # min-label propagation — goldens.py, same two-implementations
        # pattern as simhash/ann_lsh)
        "minhash_neardup": (
            "SELECT doc_a, doc_b, jaccard FROM "
            f"read_parquet('{gmh['minhash_neardup']}')"),
        "minhash_incremental": (
            "SELECT doc_new, doc_prior, jaccard FROM "
            f"read_parquet('{gmhi}')"),
        "neardup_components": (
            "SELECT doc_id, component FROM "
            f"read_parquet('{gmh['neardup_components']}')"),
    }
    # the bucketed middle-regime plan is exact, so it shares
    # ngram_jaccard's first-principles SQL oracle verbatim
    sql["ngram_jaccard_bucketed"] = sql["ngram_jaccard"]
    return sql
