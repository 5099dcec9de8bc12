"""Link extraction — HTML path and interleaved-span path.

Reproduces ``CrawlerMessageItem.ExtractURLs``
(/root/reference/crawler_message_item.go:85-128):

- four element/attr classes, scanned in this order:
  ``a@href``, ``img@src``, ``link@href``, ``script@src``
  (crawler_message_item.go:93-98);
- per class: collect attr values in document order (missing attr => "",
  goquery ``Attr`` ignores the exists flag — crawler_message_item.go:231),
  trim whitespace, parse (ANY parse failure aborts the whole page —
  crawler_message_item.go:144-147), absolutize against
  {scheme, host} of the response URL, filter by allowed hosts
  (grouped by allowed-host order — crawler_message_item.go:167-175),
  filter blacklisted paths, strip fragments;
- concatenate classes, then exact-dedup.  The reference dedups via a Go
  map (order-destroying, crawler_message_item.go:183-195); its tests only
  assert set membership, so we define the golden order as keep-first —
  see SURVEY.md §7.4.

The span path is the graft: pages are interleaved documents
``spans: list<struct<kind, text, media_ref, offset>>`` where
``kind in {text, link, img, css_link, script}`` maps 1:1 to the four
element/attr classes (BASELINE.json input_hint).  Span extraction must
produce the same links as HTML extraction over the rendered page.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, unquote

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .urls import (
    is_blacklisted_path,
    netloc_host,
    parse_url,
    remove_fragment,
)

# (kind tag in spans, html element, attribute), in reference scan order.
LINK_CLASSES = (
    ("link", "a", "href"),
    ("img", "img", "src"),
    ("css_link", "link", "href"),
    ("script", "script", "src"),
)
_KIND_RANK = {kind: i for i, (kind, _, _) in enumerate(LINK_CLASSES)}
LINK_KINDS = tuple(_KIND_RANK)


class _HrefCollector(HTMLParser):
    """Collects attr values for the four element classes in doc order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.by_class: dict[str, list[str]] = {k: [] for k, _, _ in LINK_CLASSES}
        self._want = {(el, attr): kind for kind, el, attr in LINK_CLASSES}
        self._elements = {el for _, el, _ in LINK_CLASSES}

    def handle_starttag(self, tag, attrs):
        if tag not in self._elements:
            return
        for kind, el, attr in LINK_CLASSES:
            if el != tag:
                continue
            val = ""
            for a, v in attrs:
                if a == attr:
                    val = v if v is not None else ""
                    break
            self.by_class[kind].append(val.strip())

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)


def html_collect_hrefs(html: str) -> dict[str, list[str]]:
    """HTML -> per-class raw href lists in document order."""
    p = _HrefCollector()
    p.feed(html)
    return p.by_class


def spans_collect_hrefs(spans) -> dict[str, list[str]]:
    """Interleaved spans -> per-class raw href lists.

    ``spans`` is an iterable of dicts/structs with keys
    (kind, text, media_ref, offset); link-bearing spans carry the raw
    href/src in ``media_ref``.  Offsets give document order.
    """
    by_class: dict[str, list[tuple[int, str]]] = {k: [] for k in LINK_KINDS}
    for s in spans:
        kind = s["kind"]
        if kind in by_class:
            ref = s["media_ref"] or ""
            by_class[kind].append((s["offset"], ref.strip()))
    return {k: [h for _, h in sorted(v, key=lambda t: t[0])]
            for k, v in by_class.items()}


def resolve_href(href: str, base_scheme: str, base_host: str) -> str:
    """RFC 3986 resolution against a {scheme, host} base
    (crawler_message_item.go:113-117).  Fast paths for the two dominant
    shapes; urljoin for the rest."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("/") and not href.startswith("//"):
        return f"{base_scheme}://{base_host}{href}"
    return urljoin(f"{base_scheme}://{base_host}", href)


def postprocess_links(
    by_class: dict[str, list[str]],
    base_scheme: str,
    base_host: str,
    allowed_hosts: list[str],
    blacklist: list[str],
) -> list[str] | None:
    """The per-class parse/absolutize/filter pipeline + final dedup.

    Returns the ordered list of surviving link URLs, or None when the page
    aborts (any unparseable href — crawler_message_item.go:144-147).
    Keep-first dedup (see module docstring).
    """
    out: list[str] = []
    for kind, _, _ in LINK_CLASSES:
        hrefs = by_class.get(kind, ())
        resolved: list[str] = []
        for h in hrefs:
            if parse_url(h) is None:
                return None  # whole-page abort
            resolved.append(resolve_href(h, base_scheme, base_host))
        # parse each resolved link ONCE (the host-grouping pass below
        # would otherwise re-parse per allowed host)
        hosts_of: list[str | None] = []
        keep: list[bool] = []
        for r in resolved:
            parts = parse_url(r)
            if parts is None:
                hosts_of.append(None)
                keep.append(False)
                continue
            hosts_of.append(netloc_host(parts.netloc))
            keep.append(not is_blacklisted_path(unquote(parts.path),
                                                blacklist))
        # filterURLsByHost groups output by allowed-host order
        # (crawler_message_item.go:167-175).
        for allowed in allowed_hosts:
            for r, h, k in zip(resolved, hosts_of, keep):
                if k and h == allowed:
                    out.append(remove_fragment(r))
    seen: set[str] = set()
    unique: list[str] = []
    for u in out:
        if u not in seen:
            seen.add(u)
            unique.append(u)
    return unique


def extract_links_from_html(
    html: str, base_scheme: str, base_host: str,
    allowed_hosts: list[str], blacklist: list[str],
) -> list[str] | None:
    return postprocess_links(html_collect_hrefs(html), base_scheme,
                             base_host, allowed_hosts, blacklist)


def extract_links_from_spans(
    spans, base_scheme: str, base_host: str,
    allowed_hosts: list[str], blacklist: list[str],
) -> list[str] | None:
    return postprocess_links(spans_collect_hrefs(spans), base_scheme,
                             base_host, allowed_hosts, blacklist)


# ---------------------------------------------------------------------------
# batch (Arrow) version over interleaved spans — the hot path
# ---------------------------------------------------------------------------

# RE2-safe detectors (no lookahead): an INVALID percent escape is a '%'
# not followed by two hex digits (string-end cases included).
_BAD_ESCAPE_RE = (r"%($|[^0-9a-fA-F]|[0-9a-fA-F]($|[^0-9a-fA-F]))")
_CTRL_RE = r"[\x00-\x1f\x7f]"
_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<netloc>[^/?#]*)"
_PATH_RE = r"^[^:/?#]+://[^/?#]*(?P<path>[^?#]*)"


def _vector_link_fields(resolved: pa.Array):
    """netloc-host and raw path per resolved URL via RE2 kernels; null
    where the URL is not scheme://-shaped (mailto:, garbage)."""
    st = pc.extract_regex(resolved, _SCHEME_HOST_RE)
    netloc = pc.struct_field(st, "netloc")
    # strip userinfo: keep text after the last '@'
    host = pc.replace_substring_regex(pc.fill_null(netloc, ""),
                                      r"^.*@", "")
    host = pc.if_else(pc.is_null(netloc), pa.nulls(len(resolved),
                                                   pa.string()), host)
    pt = pc.extract_regex(resolved, _PATH_RE)
    path = pc.fill_null(pc.struct_field(pt, "path"), "")
    return host, path

def extract_links_spans_batch_scalar(
    batch: pa.Table,
    allowed_hosts: list[str],
    blacklist: list[str],
    url_col: str = "url",
    spans_col: str = "spans",
) -> pa.Table:
    """Explode a batch of interleaved documents into link rows.

    Input columns: ``url`` (the page URL — base for resolution) and
    ``spans``.  Output: ``(src_url, link_url, link_seq)`` with link_seq the
    within-page keep-first order.  Pages that abort (unparseable href)
    emit a single row with ``link_url = None`` and ``link_seq = -1`` so the
    caller can reject them (workflow.go:230-234).

    Span flattening is zero-copy Arrow (``list_flatten`` +
    ``list_parent_indices``); per-link resolution falls back to Python only
    for relative references.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({"src_url": pa.array([], pa.string()),
                         "link_url": pa.array([], pa.string()),
                         "link_seq": pa.array([], pa.int32())})
    urls = batch[url_col].to_pylist()
    spans = batch[spans_col].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind")
    link_mask = pc.is_in(kinds, value_set=pa.array(list(LINK_KINDS)))
    sel = link_mask.to_numpy(zero_copy_only=False)
    idx = np.nonzero(sel)[0]
    parent_sel = parents[idx]
    kind_sel = kinds.take(pa.array(idx)).to_pylist()
    ref_sel = flat.field("media_ref").take(pa.array(idx)).to_pylist()
    offset_sel = flat.field("offset").take(pa.array(idx)).to_numpy(
        zero_copy_only=False)

    # group link spans per page, honoring (class_rank, offset) order
    src_out: list[str] = []
    link_out: list[str | None] = []
    seq_out: list[int] = []
    # per-page span index ranges: parent_sel is nondecreasing
    boundaries = np.searchsorted(parent_sel, np.arange(n + 1))
    for row in range(n):
        lo, hi = boundaries[row], boundaries[row + 1]
        page_url = urls[row]
        base = parse_url(page_url)
        if base is None:
            continue
        base_scheme, base_host = base.scheme, netloc_host(base.netloc)
        if lo == hi:
            continue
        order = sorted(
            range(lo, hi),
            key=lambda i: (_KIND_RANK[kind_sel[i]], offset_sel[i]))
        by_class: dict[str, list[str]] = {k: [] for k in LINK_KINDS}
        for i in order:
            by_class[kind_sel[i]].append((ref_sel[i] or "").strip())
        links = postprocess_links(by_class, base_scheme, base_host,
                                  allowed_hosts, blacklist)
        if links is None:
            src_out.append(page_url)
            link_out.append(None)
            seq_out.append(-1)
            continue
        for j, link in enumerate(links):
            src_out.append(page_url)
            link_out.append(link)
            seq_out.append(j)
    return pa.table({
        "src_url": pa.array(src_out, pa.string()),
        "link_url": pa.array(link_out, pa.string()),
        "link_seq": pa.array(seq_out, pa.int32()),
    })


def _as_arr(x):
    """ChunkedArray/Array -> Array (concat_arrays wants plain arrays)."""
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    return x


def extract_links_spans_batch(
    batch: pa.Table,
    allowed_hosts: list[str],
    blacklist: list[str],
    url_col: str = "url",
    spans_col: str = "spans",
) -> pa.Table:
    """Vectorized link explode — semantically identical to
    ``extract_links_spans_batch_scalar`` (equivalence pinned by
    tests/test_extract.py::test_vectorized_equals_scalar) but the
    per-link work runs in Arrow RE2/string kernels:

    - abort detection (control chars / invalid %-escapes) as regex masks;
    - absolute and root-relative resolution without urllib (scalar
      urljoin only for the rare other shapes);
    - host/path extraction, host ranking, blacklist prefixes, fragment
      strip — all batch kernels;
    - the reference's output order (parent, class, allowed-host rank,
      document position) via one lexsort; keep-first dedup per page.
    """
    n = batch.num_rows
    empty = pa.table({"src_url": pa.array([], pa.string()),
                      "link_url": pa.array([], pa.string()),
                      "link_host": pa.array([], pa.string()),
                      "link_seq": pa.array([], pa.int32())})
    if n == 0:
        return empty
    urls = batch[url_col].to_pylist()
    spans = batch[spans_col].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents_all = pc.list_parent_indices(spans).to_numpy(
        zero_copy_only=False)
    kinds_all = flat.field("kind")
    link_mask = pc.is_in(kinds_all, value_set=pa.array(list(LINK_KINDS)))
    sel = link_mask.to_numpy(zero_copy_only=False)
    idx = np.nonzero(sel)[0]
    if len(idx) == 0:
        return empty
    take = pa.array(idx)
    parent = parents_all[idx]
    kind_rank = pc.index_in(
        kinds_all.take(take),
        value_set=pa.array(sorted(_KIND_RANK, key=_KIND_RANK.get))
    ).to_numpy(zero_copy_only=False).astype(np.int8)
    offset = flat.field("offset").take(take).to_numpy(
        zero_copy_only=False).astype(np.int64)
    refs = pc.utf8_trim_whitespace(
        pc.fill_null(flat.field("media_ref").take(take), ""))

    # page bases (python, one per PAGE not per link)
    base_prefix: list[str | None] = []
    for u in urls:
        p = parse_url(u)
        base_prefix.append(f"{p.scheme}://{netloc_host(p.netloc)}"
                           if p is not None else None)

    # abort masks: control chars, invalid %-escapes, and the rare shapes
    # urlsplit itself can reject (bracketed hosts) via scalar re-check
    bad = pc.or_(pc.match_substring_regex(refs, _CTRL_RE),
                 pc.match_substring_regex(refs, _BAD_ESCAPE_RE)
                 ).to_numpy(zero_copy_only=False)
    odd = pc.match_substring(refs, "[").to_numpy(zero_copy_only=False)
    refs_py = refs.to_pylist()
    for i in np.nonzero(odd & ~bad)[0]:
        if parse_url(refs_py[i]) is None:
            bad[i] = True
    page_abort = np.zeros(n, dtype=bool)
    np.logical_or.at(page_abort, parent[bad], True)
    # pages with an unparseable base URL emit nothing (scalar-path parity)
    page_dead = np.array([bp is None for bp in base_prefix], dtype=bool)

    # resolution: absolute | root-relative (both pure Arrow kernels) |
    # scalar urljoin only for the rare other shapes (relative paths,
    # protocol-relative, mailto:, ...)
    is_abs = pc.or_(pc.starts_with(refs, pattern="http://"),
                    pc.starts_with(refs, pattern="https://")
                    ).to_numpy(zero_copy_only=False)
    starts_slash = pc.starts_with(refs, pattern="/").to_numpy(
        zero_copy_only=False)
    proto_rel = pc.starts_with(refs, pattern="//").to_numpy(
        zero_copy_only=False)
    is_root = starts_slash & ~proto_rel
    bp_per_link = pa.array(base_prefix, pa.string()).take(
        pa.array(parent, pa.int64()))
    joined_root = pc.binary_join_element_wise(
        pc.fill_null(bp_per_link, ""), refs, "")
    other = ~(is_abs | is_root)
    fallback: list[str] = [""] * len(idx)
    for i in np.nonzero(other)[0]:
        bp = base_prefix[parent[i]]
        if bp is not None:
            fallback[i] = urljoin(bp, refs_py[i])
    resolved_arr = pc.if_else(
        pa.array(is_abs), refs,
        pc.if_else(pa.array(is_root), joined_root,
                   pa.array(fallback, pa.string())))
    # dead-base pages resolve to junk here; the keep mask below drops
    # every link of those pages (page_dead) before anything reads them
    resolved_arr = pc.if_else(pa.array(page_dead[parent]),
                              pa.nulls(len(idx), pa.string()),
                              resolved_arr)
    resolved_arr = pc.fill_null(resolved_arr, "")

    host, path = _vector_link_fields(resolved_arr)
    host_rank = pc.index_in(host, value_set=pa.array(allowed_hosts,
                                                     pa.string()))
    rank_np = host_rank.to_numpy(zero_copy_only=False).astype(float)
    in_host = ~np.isnan(rank_np)

    # blacklist on the DECODED path: vectorized starts_with per prefix,
    # scalar unquote only for the rare %-escaped paths
    if blacklist:
        has_pct = pc.match_substring(path, "%").to_numpy(
            zero_copy_only=False)
        if has_pct.any():
            path_py = path.to_pylist()
            for i in np.nonzero(has_pct)[0]:
                path_py[i] = unquote(path_py[i])
            path_dec = pa.array(path_py, pa.string())
        else:
            path_dec = path
        blk_mask = None
        for b in blacklist:
            m = pc.starts_with(path_dec, pattern=b)
            blk_mask = m if blk_mask is None else pc.or_(blk_mask, m)
        blk = blk_mask.to_numpy(zero_copy_only=False)
    else:
        blk = np.zeros(len(idx), dtype=bool)

    keep = (in_host & ~blk & ~page_abort[parent] & ~page_dead[parent]
            & ~bad)
    kidx = np.nonzero(keep)[0]
    # reference order: per page, classes in scan order, within class the
    # allowed-host groups in root order, within group document order
    order = kidx[np.lexsort((offset[kidx], rank_np[kidx].astype(np.int64),
                             kind_rank[kidx], parent[kidx]))]
    order_arr = pa.array(order)
    nofrag_arr = pc.replace_substring_regex(
        resolved_arr.take(order_arr), r"(?s)#.*$", "")
    if isinstance(nofrag_arr, pa.ChunkedArray):
        nofrag_arr = nofrag_arr.combine_chunks()
    host_ord = host.take(order_arr)

    # keep-first dedup per page + within-page seq, fully vectorized and
    # EXACT: dictionary-encode the link strings (C-side string
    # equality), then first-occurrence per (page, code) in sequence
    # order via one lexsort (the previous per-link Python loop was the
    # single largest worker cost — 37M list appends per 1M-page crawl)
    pg_ord = parent[order]
    codes = nofrag_arr.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    comp = pg_ord.astype(np.int64) * (codes.max() + 1 if len(codes)
                                      else 1) + codes
    pos = np.arange(len(comp))
    perm = np.lexsort((pos, comp))
    cs = comp[perm]
    first = np.ones(len(cs), dtype=bool)
    first[1:] = cs[1:] != cs[:-1]
    keep_pos = np.sort(pos[perm[first]])
    kept_pg = pg_ord[keep_pos]
    is_new = np.ones(len(kept_pg), dtype=bool)
    is_new[1:] = kept_pg[1:] != kept_pg[:-1]
    run_starts = np.nonzero(is_new)[0]
    run_ids = np.cumsum(is_new) - 1
    seqs = (np.arange(len(kept_pg)) - run_starts[run_ids]).astype(
        np.int32) if len(kept_pg) else np.zeros(0, np.int32)

    keep_arr = pa.array(keep_pos, pa.int64())
    src_col = batch[url_col].combine_chunks()
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()
    out_src = src_col.take(pa.array(kept_pg, pa.int64()))
    out_link = nofrag_arr.take(keep_arr)
    out_host = host_ord.take(keep_arr)
    out_seq = pa.array(seqs, pa.int32())
    # abort markers (one per aborted page with a parseable base)
    ab = np.nonzero(page_abort & ~page_dead)[0]
    if len(ab):
        out_src = pa.concat_arrays(
            [_as_arr(out_src),
             _as_arr(src_col.take(pa.array(ab, pa.int64())))])
        out_link = pa.concat_arrays(
            [_as_arr(out_link), pa.nulls(len(ab), pa.string())])
        out_host = pa.concat_arrays(
            [_as_arr(out_host), pa.nulls(len(ab), pa.string())])
        out_seq = pa.concat_arrays(
            [out_seq, pa.array(np.full(len(ab), -1, np.int32),
                               pa.int32())])
    return pa.table({
        "src_url": out_src,
        "link_url": out_link,
        # host of each kept link (already computed for the allow-gate) —
        # carried out so downstream stages skip a per-link re-parse
        "link_host": out_host,
        "link_seq": out_seq,
    })
