"""Explicit Arrow schemas for every table the engine produces/consumes.

The reference's data model is fixed Go structs (SURVEY.md §1); we declare
the equivalent pyarrow schemas up-front rather than relying on inference.
"""

from __future__ import annotations

import pyarrow as pa

# The interleaved-document span struct (BASELINE.json input_hint):
# kind in {text, link, img, css_link, script}; link-bearing kinds carry the
# raw href/src in media_ref; offset is the position in the document.
SPAN_STRUCT = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
])

# Authoritative input shape: Lance/parquet table of interleaved documents.
DOCUMENTS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
])

# The synthetic origin ("web") — one row per fetchable URL; the fetch stage
# resolves against this table preserving the status dispatch of
# http_crawler/crawler.go:84-109.  ``transient`` marks 429/5XX rows that
# succeed once retried (exercises the requeue path deterministically).
CORPUS_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("status_code", pa.int16()),
    pa.field("content_type", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
    pa.field("body", pa.string()),
    pa.field("redirect_location", pa.string()),
    pa.field("transient", pa.bool_()),
])

# One frontier wave (round input).
FRONTIER_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("url_digest", pa.string()),     # hex digest (seen-set key)
    pa.field("depth", pa.int32()),
    pa.field("discovered_seq", pa.int64()),  # global FIFO order
    pa.field("priority", pa.int32()),        # reference hardwires 0
])

# Fetch stage output (before the mirror/extract branch).
FETCHED_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("url_digest", pa.string()),
    pa.field("depth", pa.int32()),
    pa.field("discovered_seq", pa.int64()),
    pa.field("status_code", pa.int16()),
    pa.field("content_type", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
    pa.field("body", pa.string()),
    # outcome in {fetched, requeue_5xx, requeue_429, rejected, not_found,
    #             acked_non_accepted, aborted_retries}
    pa.field("outcome", pa.string()),
])

MIRROR_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("mirror_path", pa.string()),
    pa.field("body", pa.string()),
    pa.field("round", pa.int32()),
])

METRICS_SCHEMA = pa.schema([
    pa.field("round", pa.int32()),
    pa.field("metric", pa.string()),
    pa.field("key", pa.string()),
    pa.field("value", pa.int64()),
])

SEEN_SNAPSHOT_SCHEMA = pa.schema([
    pa.field("digest", pa.string()),
    pa.field("status", pa.int32()),
    pa.field("expire_at", pa.float64()),
])
