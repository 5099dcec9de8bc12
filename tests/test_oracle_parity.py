"""Replicates the driver's correctness gate: run each queries() entry at
sf=0.01 and compare row count, column names, and order-insensitive values
against oracle_sql() via DuckDB."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def harness(ray_session):
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return entrymod, con


ORACLE_KEYS = [
    "dedup_exact", "token_count", "text_stats", "quality_score",
    "lang_histogram", "lang_id", "events_hourly", "sessionize",
    "revenue_by_nation", "top_docs_by_length", "ann_bruteforce",
    "asof_join", "range_join", "sliding_window", "distinct_users_daily",
    "stratified_sample", "media_features", "video_frames",
    "kmv_distinct", "token_df", "value_quantiles", "sampled_quantiles",
    "ngram_jaccard",
    "ngram_jaccard_bucketed",
    "anti_join", "group_topk", "text_normalize", "simhash_neardup",
    "quantize_embeddings", "bpe_token_count", "conversion_funnel",
    "pagerank", "event_gaps", "doc_quartiles", "events_rollup",
    "events_pivot", "normalized_dedup", "length_histogram",
    "repetition_stats", "decontaminate", "chunk_dedup",
    "pricing_summary", "semantic_dedup", "pack_offsets",
    "distinctive_terms", "quality_filter", "heavy_hitters",
    "dataset_split", "incremental_dedup", "bigram_fluency",
    "deterministic_shuffle", "pii_scrub",
    "minhash_neardup", "minhash_incremental", "neardup_components",
    "priority_sample", "tfidf_rank", "embedding_stats",
    "label_centroids", "semi_join", "left_outer_join",
    "full_outer_join", "upsert_latest", "token_windows",
    "html_extract", "running_total", "json_extract_agg",
    "bloom_semi_join", "user_retention", "source_cap", "lang_mix",
    "domain_mix", "domain_mix_sample", "cdc_chunk_stats",
    "gap_fill", "moving_avg", "table_profile", "winsorize",
    "percent_rank",
    "assemble_features", "compact_files", "c4_pipeline",
    "event_transitions", "orders_cube", "corr_stats",
    "skew_join", "hll_distinct",
    "cms_heavy_hitters", "inverted_index", "hard_negatives",
    "vocab_encode", "ann_ivf", "revenue_by_nation_join",
    "degree_stats", "global_rank", "pmi_collocations",
    "length_outliers", "dup_spans", "span_stats", "span_transitions",
    "snapshot_diff", "mm_quality_gate",
    "interleaved_dedup", "interleaved_curation", "media_manifest",
    "span_text", "media_context", "media_dedup", "knn_join",
    "triangle_count", "mm_pack", "bfs_depth", "partitioned_write",
    "pack_manifest",
    "crawl_order", "crawl_seen", "crawl_mirror", "mirror_path_fn",
    "extract_links", "content_type_gate", "pages_by_host",
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(harness, name):
    entrymod, con = harness
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _canon(_to_df(q(SF_DIR)))
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)


ROWS_ONLY_KEYS = ["fingerprint", "ann_lsh", "embedding_neardup",
                  "simhash", "curate_crawl"]


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(harness, name):
    entrymod, _ = harness
    df = _to_df(entrymod.queries()[name](SF_DIR))
    assert df is not None
    assert not any(df[c].isna().all() for c in df.columns) or len(df) == 0


def test_entry_smoke(harness):
    entrymod, _ = harness
    df = entrymod.entry()
    assert len(df) > 0
    assert list(df.columns) == ["round", "seq", "url"]


def test_every_query_is_parity_covered(harness):
    """Drift guard: every queries() entry must be exercised here —
    either in ORACLE_KEYS (full hash parity) or ROWS_ONLY_KEYS
    (smoke) — and every queries() entry must have an oracle_sql twin.
    A new operator that forgets the parity row fails this test."""
    entrymod, _ = harness
    qs = set(entrymod.queries())
    covered = set(ORACLE_KEYS) | set(ROWS_ONLY_KEYS)
    assert qs - covered == set(), (
        f"queries missing from parity suite: {sorted(qs - covered)}")
    assert covered - qs == set(), (
        f"stale parity keys: {sorted(covered - qs)}")
    missing_oracle = qs - set(entrymod.oracle_sql())
    assert missing_oracle == set(), (
        f"queries without oracle_sql: {sorted(missing_oracle)}")
