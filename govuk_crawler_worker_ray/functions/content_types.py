"""Content-type parsing + allowlist (http_crawler/crawler_response.go).

Vectorized versions operate on pyarrow arrays for use inside
``map_batches`` stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Mime constants (crawler_response.go:8-27).  ATOM is *defined* but NOT in
# the accept switch (crawler_response.go:41-44; tested
# crawler_response_test.go:35-38).
ATOM = "application/atom+xml"
CSS = "text/css"
CSV = "text/csv"
DOCX = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
GIF = "image/gif"
HTML = "text/html"
ICO = "image/x-icon"
ICS = "text/calendar"
JAVASCRIPT = "application/javascript"
JPEG = "image/jpeg"
JSON = "application/json"
ODP = "application/vnd.oasis.opendocument.presentation"
ODS = "application/vnd.oasis.opendocument.spreadsheet"
ODT = "application/vnd.oasis.opendocument.text"
PDF = "application/pdf"
PNG = "image/png"
XLS = "application/vnd.ms-excel"
XLSX = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"

ACCEPTED_CONTENT_TYPES = frozenset({
    CSS, CSV, DOCX, GIF, HTML, ICO, ICS, JAVASCRIPT,
    JPEG, JSON, ODP, ODS, ODT, PDF, PNG, XLS, XLSX,
})


def parse_content_type(value: str | None) -> str | None:
    """Go ``mime.ParseMediaType`` subset (crawler_response.go:50-57):
    strip parameters (``; charset=...``), trim, lowercase; empty or
    slash-less values error -> None."""
    if value is None:
        return None
    mime_type = value.split(";", 1)[0].strip().lower()
    if mime_type == "" or "/" not in mime_type:
        return None
    if " " in mime_type:
        return None
    return mime_type


def accepted_content_type(value: str | None) -> bool:
    """17-type allowlist gate (crawler_response.go:35-48); parse errors
    => False."""
    return parse_content_type(value) in ACCEPTED_CONTENT_TYPES


# ---------------------------------------------------------------------------
# vectorized (Arrow) versions
# ---------------------------------------------------------------------------

def parse_content_type_array(values: pa.Array) -> pa.Array:
    """Vectorized ParseContentType: split on ';', trim, lowercase.
    Invalid entries become null."""
    first = pc.split_pattern(values.cast(pa.string()), ";", max_splits=1)
    mime = pc.utf8_lower(pc.utf8_trim_whitespace(pc.list_element(first, 0)))
    bad = pc.or_(
        pc.equal(mime, ""),
        pc.or_(pc.invert(pc.match_substring(mime, "/")),
               pc.match_substring(mime, " ")),
    )
    return pc.if_else(bad, pa.nulls(len(mime), pa.string()), mime)


def accepted_mask(values: pa.Array) -> pa.Array:
    """Boolean mask of batch rows whose content type is accepted."""
    mime = parse_content_type_array(values)
    mask = pc.is_in(mime, value_set=pa.array(sorted(ACCEPTED_CONTENT_TYPES)))
    return pc.fill_null(mask, False)


def html_mask(values: pa.Array) -> pa.Array:
    """Boolean mask: parsed mime == text/html (the extract-forwarding gate,
    workflow.go:201-207)."""
    mime = parse_content_type_array(values)
    return pc.fill_null(pc.equal(mime, HTML), False)
