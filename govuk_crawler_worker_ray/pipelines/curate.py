"""Crawl-output curation: the handoff from the crawl half of the engine
to the training-data half, as ONE streaming Ray Data pipeline over the
per-round fetched parquet partitions:

  read round=*/fetched (column-pruned, row-filtered at the reader)
    -> visible-text extraction from interleaved spans (zero-copy walk)
    -> text stats + integer quality points + language ID (vectorized)
    -> exact dedup on content hash (single narrow groupby)
    -> curated parquet (resumable directory sink)

Nothing materializes: blocks stream from the reader through the
transforms into the writer with backpressure.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Interleaved spans -> visible text: concatenate text spans and link
    anchor texts in offset order (media refs carry no visible text)."""
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    offsets = flat.field("offset").to_numpy(zero_copy_only=False)
    n = batch.num_rows
    buckets: list[list[tuple[int, str]]] = [[] for _ in range(n)]
    for p, k, t, o in zip(parents, kinds, texts, offsets):
        if t and k in ("text", "link"):
            buckets[p].append((int(o), t))
    out = [" ".join(t for _, t in sorted(b)) for b in buckets]
    cols = {
        "doc_id": batch["url"],
        "text": pa.array(out, pa.string()),
    }
    if "discovered_seq" in batch.column_names:
        cols["discovered_seq"] = batch["discovered_seq"]
    return pa.table(cols)


def curate_crawl_output(crawl_out_dir: str, dest_dir: str,
                        min_quality_points: int = 4):
    """-> (curated Dataset written to dest_dir, row count).

    Reads every round's fetched partition; keeps accepted HTML pages;
    extracts text; scores; drops low-quality docs; exact-dedups by
    content hash keeping the first-crawled doc."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from .dedup import content_hash_batch
    from .text_analysis import lang_id_batch, quality_score_batch

    round_dirs = sorted(
        os.path.join(crawl_out_dir, d, "fetched")
        for d in os.listdir(crawl_out_dir)
        if d.startswith("round=") and
        os.path.isdir(os.path.join(crawl_out_dir, d, "fetched")))
    rounds = [os.path.join(rdir, f) for rdir in round_dirs
              for f in sorted(os.listdir(rdir)) if f.endswith(".parquet")]
    ds = rd.read_parquet(
        rounds,
        columns=["url", "spans", "outcome", "content_type",
                 "discovered_seq"],
        filter=((pc.field("outcome") == "fetched") &
                (pc.field("content_type") == "text/html")))
    docs = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    docs = docs.filter(expr="text != ''")

    def score(batch: pa.Table) -> pa.Table:
        q = quality_score_batch(batch)
        lang = lang_id_batch(batch)
        hashed = content_hash_batch(batch)
        # rowkey (doc_id <TAB> zero-padded seq) is UNIQUE per fetched row
        # (a seq is fetched at most once across rounds), so the winner
        # semi-join below keeps exactly one physical row per hash with
        # no second dedup pass.  The separator is '\t' (0x09), below
        # every character legal in a URL, so min(rowkey) is exactly the
        # lexicographically-least (doc_id, seq) pair even when one
        # doc_id is a prefix of another.
        rowkey = pc.binary_join_element_wise(
            batch["doc_id"],
            pc.utf8_lpad(pc.cast(batch["discovered_seq"], pa.string()),
                         12, "0"), "\t")
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "quality_points": q["quality_points"],
            "pred_lang": lang["pred_lang"],
            "content_hash": hashed["content_hash"],
            "rowkey": rowkey,
        })

    scored = docs.map_batches(score, batch_format="pyarrow")
    kept = scored.filter(
        expr=f"quality_points >= {min_quality_points}")
    # exact dedup, ONE narrow shuffle: min rowkey per content hash
    # (least (doc_id, seq) pair: min doc_id, earliest-crawled copy on
    # ties) — text never shuffles
    winners = (kept.select_columns(["content_hash", "rowkey"])
               .groupby("content_hash")
               .aggregate(Min("rowkey", alias_name="win_key"),
                          Count(alias_name="n_dups")))
    win_parts = []
    for b in winners.iter_batches(batch_format="pyarrow"):
        win_parts.append(pc.binary_join_element_wise(
            b["content_hash"], b["win_key"], "\t"))
    import ray

    win_set = (pa.concat_arrays([p.combine_chunks() if isinstance(
        p, pa.ChunkedArray) else p for p in win_parts])
        if win_parts else pa.array([], pa.string()))
    win_ref = ray.put(win_set)

    def only_winners(batch: pa.Table) -> pa.Table:
        full = pc.binary_join_element_wise(batch["content_hash"],
                                           batch["rowkey"], "\t")
        mask = pc.is_in(full, value_set=ray.get(win_ref))
        return batch.filter(mask).drop_columns(["rowkey"])

    # broadcast semi-join on the composite winner key: vectorized is_in,
    # no driver row loop, no second shuffle.  (When the winner set
    # outgrows a broadcast — 10^9+ distinct hashes — the documented
    # scale path is a hash-partitioned join on content_hash.)
    curated = kept.map_batches(only_winners, batch_format="pyarrow")
    curated.write_parquet(dest_dir)
    import pyarrow.dataset as pads

    n = pads.dataset(dest_dir, format="parquet").count_rows()
    return dest_dir, n
