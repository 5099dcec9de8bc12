"""Deterministic synthetic web corpus generator (FIXTURES.md F1-F3).

Builds the stand-in for live HTTP (the reference's httptest servers,
workflow_test.go:587-592): a seeded web graph over the three reference
root hosts (crawler_message_item_test.go:45-60) with one skewed mega-host
(www.gov.uk, ~80% of pages), a status-code mix covering the full dispatch
of http_crawler/crawler.go:84-109, content-type variety over the
allowlist + rejects, and hand-written conformance pages reproducing every
body case cited in FIXTURES.md F2.

Pages are authored as INTERLEAVED SPAN documents (the authoritative
input shape, BASELINE.json input_hint) and the HTML body is RENDERED from
the spans — so the engine's span-path extraction and the oracle's
HTML-path extraction see the same document through two independent
parsers.

Everything is a pure function of (n_pages, seed); no wall clock.
"""

from __future__ import annotations

import html as html_mod
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import CORPUS_SCHEMA, DOCUMENTS_SCHEMA

GOV = "www.gov.uk"
ASSETS = "assets.digital.cabinet-office.gov.uk"
EXAMPLE = "example.com"
HOSTS = (GOV, ASSETS, EXAMPLE)
HOST_WEIGHTS = (0.8, 0.1, 0.1)
SECTIONS = ("guidance", "government/news", "browse", "topics", "help")

ROOT_URLS = tuple(f"https://{h}/" for h in HOSTS)


def render_spans_to_html(spans: list[dict]) -> str:
    """Render an interleaved span doc to HTML.  Attr values are
    entity-escaped; the HTML parser unescapes them back, so both paths
    observe identical raw refs."""
    parts = ["<!DOCTYPE html><html><head><title>page</title></head><body>"]
    esc = lambda s: html_mod.escape(s or "", quote=True)  # noqa: E731
    for s in sorted(spans, key=lambda x: x["offset"]):
        k = s["kind"]
        if k == "text":
            parts.append(f"<p>{esc(s['text'])}</p>")
        elif k == "link":
            parts.append(f'<a href="{esc(s["media_ref"])}">'
                         f'{esc(s["text"])}</a>')
        elif k == "img":
            parts.append(f'<img src="{esc(s["media_ref"])}">')
        elif k == "css_link":
            parts.append(f'<link rel="stylesheet" href="{esc(s["media_ref"])}">')
        elif k == "script":
            parts.append(f'<script src="{esc(s["media_ref"])}"></script>')
    parts.append("</body></html>")
    return "".join(parts)


class _SpanBuilder:
    def __init__(self) -> None:
        self.spans: list[dict] = []

    def add(self, kind: str, text: str = "", ref: str | None = None):
        self.spans.append({"kind": kind, "text": text, "media_ref": ref,
                           "offset": len(self.spans)})
        return self


def _page_url(host: str, section: str, i: int) -> str:
    return f"https://{host}/{section}/page-{i}"


@dataclass
class CorpusFixture:
    corpus: pa.Table
    documents: pa.Table
    seeds: list[str]

    def index(self) -> dict[str, dict]:
        return {r["url"]: r for r in self.corpus.to_pylist()}


def generate_corpus(n_pages: int = 300, seed: int = 42) -> CorpusFixture:
    rng = np.random.default_rng(seed)
    rows: list[dict] = []

    # ---- page universe per host ----------------------------------------
    host_pages: dict[str, list[str]] = {}
    counts = {
        GOV: max(3, int(n_pages * HOST_WEIGHTS[0])),
        ASSETS: max(2, int(n_pages * HOST_WEIGHTS[1])),
        EXAMPLE: max(2, int(n_pages * HOST_WEIGHTS[2])),
    }
    for host, n in counts.items():
        pages = [f"https://{host}/"]
        for i in range(1, n):
            pages.append(_page_url(host, SECTIONS[i % len(SECTIONS)], i))
        host_pages[host] = pages

    # robots.txt per host (north rule; only honored when
    # CrawlConfig.respect_robots — plain text so it is never mirrored)
    rows.append(dict(
        url=f"https://{GOV}/robots.txt", host=GOV, status_code=200,
        content_type="text/plain", spans=[],
        body=("User-agent: *\nDisallow: /help\nDisallow: /topics/page-\n"
              "Allow: /topics/page-8\n"),
        redirect_location=None, transient=False))
    rows.append(dict(
        url=f"https://{EXAMPLE}/robots.txt", host=EXAMPLE, status_code=200,
        content_type="text/plain", spans=[],
        body=("User-agent: GOV.UK Crawler Worker\nDisallow: /browse\n\n"
              "User-agent: *\nDisallow: /\n"),
        redirect_location=None, transient=False))

    # shared asset library on the assets host (dup-heavy decorations)
    asset_lib = []
    for k in range(max(3, n_pages // 50)):
        kind = ("img", f"/lib/img-{k}.png", "image/png") if k % 3 == 0 else (
            ("css_link", f"/lib/style-{k}.css", "text/css") if k % 3 == 1
            else ("script", f"/lib/app-{k}.js", "application/javascript"))
        url = f"https://{ASSETS}{kind[1]}"
        asset_lib.append((kind[0], url))
        rows.append(dict(url=url, host=ASSETS, status_code=200,
                         content_type=kind[2], spans=[],
                         body=f"ASSET:{kind[1]}", redirect_location=None,
                         transient=False))

    # query-variant pages (?page=N survives the pagination gate)
    query_variants: dict[str, str] = {}
    for host in (GOV,):
        for i, u in enumerate(host_pages[host]):
            if "/browse/" in u and i % 4 == 0:
                query_variants[u] = u + "?page=2"

    # ---- status mix ----------------------------------------------------
    def assign_status(host: str, i: int) -> tuple[int, str, bool, str | None]:
        """-> (status, content_type, transient, redirect_location)"""
        if i == 0:
            return 200, "text/html; charset=utf-8", False, None
        r = rng.random()
        pages = host_pages[host]
        if r < 0.86:
            return 200, "text/html; charset=utf-8", False, None
        if r < 0.89:
            tgt = pages[int(rng.integers(0, len(pages)))]
            code = int(rng.choice([301, 302, 303, 307]))
            return code, "", False, tgt
        if r < 0.91:
            return 404, "", False, None
        # transient 5xx/429 rows carry the content they serve once retried
        if r < 0.925:
            t = bool(rng.random() < 0.5)
            return 500, "text/html; charset=utf-8" if t else "", t, None
        if r < 0.93:
            t = bool(rng.random() < 0.5)
            return 504, "text/html; charset=utf-8" if t else "", t, None
        if r < 0.94:
            t = bool(rng.random() < 0.5)
            return 429, "text/html; charset=utf-8" if t else "", t, None
        if r < 0.955:
            return 200, "application/json", False, None
        if r < 0.97:
            return 200, "application/pdf", False, None
        if r < 0.985:
            return 200, "audio/mpeg", False, None  # accepted=False
        return 200, "application/atom+xml", False, None  # ATOM reject

    # ---- span-authored content pages ------------------------------------
    for host, pages in host_pages.items():
        n = len(pages)
        # reachability backbone: page j's tree parent links to j
        children: dict[int, list[int]] = {i: [] for i in range(n)}
        for j in range(1, n):
            parent = int(rng.integers(0, j))
            children[parent].append(j)
        for i, url in enumerate(pages):
            status, ct, transient, redir = assign_status(host, i)
            serves_html = ct.startswith("text/html") and (
                status == 200 or transient)
            if not serves_html:
                body = "" if status != 200 else f"DATA:{url}"
                rows.append(dict(url=url, host=host, status_code=status,
                                 content_type=ct, spans=[], body=body,
                                 redirect_location=redir,
                                 transient=transient))
                continue
            b = _SpanBuilder()
            b.add("text", f"Page {i} on {host}")
            b.add("link", "home", "/")
            for c in children[i]:
                b.add("link", f"child {c}", pages[c])
            extra = rng.integers(0, len(pages), size=int(rng.integers(2, 7)))
            for e in extra:
                b.add("text", f"see also {e}")
                b.add("link", f"also {e}", pages[int(e)])
            if rng.random() < 0.15:  # cross-host
                other = HOSTS[int(rng.integers(0, 3))]
                op = host_pages[other]
                b.add("link", "cross", op[int(rng.integers(0, len(op)))])
            if rng.random() < 0.08:  # off-host noise (filtered)
                b.add("link", "ext", "https://www.google.com/whatever")
            for _ in range(int(rng.integers(1, 3))):  # shared assets
                kind, aurl = asset_lib[int(rng.integers(0, len(asset_lib)))]
                b.add(kind, "", aurl)
            if rng.random() < 0.08:  # dropped query params
                tgt = pages[int(rng.integers(0, len(pages)))]
                b.add("link", "filtered", tgt + "?utm=x")
            if url in query_variants:  # pagination link (survives gate)
                b.add("link", "next page", query_variants[url])
            if rng.random() < 0.08:  # fragment
                tgt = pages[int(rng.integers(0, len(pages)))]
                b.add("link", "frag", tgt + "#section")
            if rng.random() < 0.06:  # blacklisted targets
                b.add("link", "search", f"https://{host}/search?q=x{i}")
            if rng.random() < 0.03:
                b.add("link", "mail", "mailto:someone@example.com")
            spans = b.spans
            rows.append(dict(url=url, host=host, status_code=status,
                             content_type=ct, spans=spans,
                             body=render_spans_to_html(spans),
                             redirect_location=None, transient=transient))

    # query-variant rows: html pages linking back to their base
    for base, qurl in query_variants.items():
        spans = (_SpanBuilder().add("text", "paginated")
                 .add("link", "back", base).spans)
        rows.append(dict(url=qurl, host=GOV, status_code=200,
                         content_type="text/html; charset=utf-8",
                         spans=spans, body=render_spans_to_html(spans),
                         redirect_location=None, transient=False))

    rows.extend(_conformance_pages(host_pages))

    # root page links to the conformance suite + flaky seed
    gov_root = next(r for r in rows if r["url"] == f"https://{GOV}/")
    b = _SpanBuilder()
    b.spans = list(gov_root["spans"])
    for r in _conformance_pages(host_pages):
        if r["host"] == GOV and r["status_code"] == 200:
            b.add("link", "conf", r["url"])
    b.add("link", "flaky", f"https://{GOV}/conformance/flaky-seed")
    gov_root["spans"] = b.spans
    gov_root["body"] = render_spans_to_html(b.spans)

    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    doc_rows = [{"doc_id": r["url"], "spans": r["spans"]}
                for r in rows if r["spans"]]
    documents = pa.Table.from_pylist(doc_rows, schema=DOCUMENTS_SCHEMA)
    seeds = list(ROOT_URLS) + [f"https://{GOV}/conformance/flaky-seed"]
    return CorpusFixture(corpus=corpus, documents=documents, seeds=seeds)


def _conformance_pages(host_pages: dict[str, list[str]]) -> list[dict]:
    """Hand-written pages reproducing the reference's body test cases
    (FIXTURES.md F2; crawler_message_item_test.go / workflow_test.go)."""
    gov = host_pages[GOV]
    mk = lambda path: f"https://{GOV}{path}"  # noqa: E731

    def page(path, spans, ct="text/html; charset=utf-8", status=200,
             transient=False, redirect=None, body=None):
        return dict(url=mk(path), host=GOV, status_code=status,
                    content_type=ct, spans=spans,
                    body=(render_spans_to_html(spans) if body is None
                          else body),
                    redirect_location=redirect, transient=transient)

    out = []
    # multi-class links incl. off-host (test :266-278)
    out.append(page("/conformance/multi-class", (
        _SpanBuilder()
        .add("img", "", f"https://{ASSETS}/image.png")
        .add("link", "Test", mk("/conformance/target-a"))
        .add("script", "", "https://example.com/jq.js")
        .add("script", "", "https://google.com/another.js")
        .add("css_link", "", f"https://{ASSETS}/style.css").spans)))
    # relative + mailto + protocol-relative (:375-388)
    out.append(page("/conformance/relative", (
        _SpanBuilder()
        .add("link", "a", "/conformance/target-b")
        .add("link", "b", "mailto:c@d.com")
        .add("link", "c", f"//{EXAMPLE}/proto-relative").spans)))
    # fragments (:390-402)
    out.append(page("/conformance/fragments", (
        _SpanBuilder()
        .add("link", "f", mk("/conformance/target-a") + "#germany").spans)))
    # duplicates (:418-424)
    out.append(page("/conformance/dups", (
        _SpanBuilder()
        .add("link", "a", mk("/conformance/target-b"))
        .add("link", "b", mk("/conformance/target-b"))
        .add("img", "i", mk("/conformance/target-b")).spans)))
    # query params: ?some=params dropped, ?page=1 survives
    # (workflow_test.go:367-434)
    out.append(page("/conformance/params", (
        _SpanBuilder()
        .add("link", "q", mk("/conformance/target-a?some=params"))
        .add("link", "p", mk("/conformance/paged?page=1")).spans)))
    # blacklisted link targets (:404-416)
    out.append(page("/conformance/blacklisted-links", (
        _SpanBuilder()
        .add("link", "s", mk("/search?q=x"))
        .add("link", "u", mk("/government/uploads/doc.pdf"))
        .add("link", "ok", mk("/conformance/target-a")).spans)))
    # empty body (:280-286)
    out.append(page("/conformance/empty", [], body=""))
    # empty-href quirk: href="" resolves to the bare base URL (the goquery
    # missing-attr behavior, crawler_message_item.go:231)
    out.append(page("/conformance/no-attr", (
        _SpanBuilder().add("link", "x", "").spans)))
    # whole-page abort: unparseable href (crawler_message_item.go:144-147)
    out.append(page("/conformance/abort", (
        _SpanBuilder()
        .add("link", "x", "http://%zz/bad")
        .add("link", "y", "/conformance/target-a").spans)))
    # unicode path (percent-encoded on the wire)
    uni = ("/conformance/unicode/%E5%A6%82%E4%BD%95%E5%9C%A8%E9%A6%99%E6"
           "%B8%AF%E7%94%B3%E8%AB%8B")
    out.append(page("/conformance/uni-source", (
        _SpanBuilder().add("link", "u", mk(uni)).spans)))
    out.append(page(uni, (_SpanBuilder().add("text", "unicode page")
                          .spans)))
    # trailing slash -> index.html; plus sign -> space in mirror path
    out.append(page("/conformance/trailing/", (
        _SpanBuilder().add("text", "dir page").spans)))
    out.append(page("/conformance/plus+name", (
        _SpanBuilder().add("text", "plus page").spans)))
    # mirror-path error: parseable URL whose decoded path fails the SECOND
    # decode (QueryUnescape of 'a%zz' errors, crawler_message_item.go:51) —
    # the reference crawls it (counted fetched, appended to crawl order in
    # CrawlURL) and only WriteItemToDisk rejects it (workflow.go:162-170)
    out.append(page("/conformance/mirror-err%25zz", (
        _SpanBuilder().add("text", "unmirrorable page").spans)))
    # redirect page + its target (crawler.go:91-109)
    out.append(page("/conformance/redirect", [], ct="", status=302,
                    redirect=mk("/conformance/target-a"), body=""))
    out.append(page("/conformance/redirect-source", (
        _SpanBuilder().add("link", "r", mk("/conformance/redirect")).spans)))
    # flaky seed: 500 that succeeds on retry (dup/INCR interplay)
    out.append(page("/conformance/flaky-seed", (
        _SpanBuilder().add("text", "finally up")
        .add("link", "t", mk("/conformance/target-b")).spans),
        status=500, transient=True))
    # stable targets
    out.append(page("/conformance/target-a", (
        _SpanBuilder().add("text", "target a").spans)))
    out.append(page("/conformance/target-b", (
        _SpanBuilder().add("text", "target b").spans)))
    out.append(page("/conformance/paged", (
        _SpanBuilder().add("text", "page base").spans)))
    out.append(page("/conformance/paged?page=1", (
        _SpanBuilder().add("link", "back", mk("/conformance/paged")).spans)))
    # non-accepted content linked directly (ack + reset path)
    out.append(page("/conformance/podcast", [], ct="audio/mpeg",
                    body="MP3DATA"))
    out.append(page("/conformance/feed", [], ct="application/atom+xml",
                    body="<feed/>"))
    out.append(page("/conformance/media-links", (
        _SpanBuilder()
        .add("link", "pod", mk("/conformance/podcast"))
        .add("link", "feed", mk("/conformance/feed")).spans)))
    return out


# ---------------------------------------------------------------------------
# fixture directory writer (idempotent)
# ---------------------------------------------------------------------------

def write_fixture(out_dir: str, n_pages: int = 300, seed: int = 42,
                  force: bool = False, goldens: bool = True) -> str:
    """Write corpus/documents/seeds parquet (+ oracle goldens unless
    ``goldens=False`` — bench fixtures skip the sequential oracle) to
    ``out_dir``.  Idempotent via a marker keyed on (n_pages, seed,
    generator version) — bump _GEN_VERSION when generation logic changes."""
    marker = os.path.join(out_dir, "meta.json")
    key = {"n_pages": n_pages, "seed": seed, "gen_version": _GEN_VERSION,
           "goldens": goldens}
    if not force and os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == key:
                    return out_dir
        except (json.JSONDecodeError, OSError):
            pass
    os.makedirs(out_dir, exist_ok=True)
    fx = generate_corpus(n_pages=n_pages, seed=seed)
    pq.write_table(fx.corpus, os.path.join(out_dir, "corpus.parquet"))
    pq.write_table(fx.documents, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(pa.table({"url": pa.array(fx.seeds, pa.string()),
                             "priority": pa.array([0] * len(fx.seeds),
                                                  pa.int32())}),
                   os.path.join(out_dir, "seeds.parquet"))
    if goldens:
        _write_goldens(out_dir, fx)
    with open(marker, "w") as f:
        json.dump(key, f)
    return out_dir


_GEN_VERSION = 5  # v5: mirror-err%25zz conformance page (mirror_rejected)


def _write_goldens(out_dir: str, fx: CorpusFixture) -> None:
    from .config import CrawlConfig
    from .reference_oracle import crawl_oracle

    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    res = crawl_oracle(fx.index(), fx.seeds, cfg)
    pq.write_table(pa.table({
        "round": pa.array([r for r, _, _ in res.crawl_order], pa.int32()),
        "seq": pa.array([s for _, s, _ in res.crawl_order], pa.int64()),
        "url": pa.array([u for _, _, u in res.crawl_order], pa.string()),
    }), os.path.join(out_dir, "golden_crawl_order.parquet"))
    paths = sorted(res.mirror)
    pq.write_table(pa.table({
        "mirror_path": pa.array(paths, pa.string()),
        "url": pa.array([res.mirror[p][0] for p in paths], pa.string()),
        "body": pa.array([res.mirror[p][1] for p in paths], pa.string()),
    }), os.path.join(out_dir, "golden_mirror.parquet"))
    digests = sorted(res.seen)
    pq.write_table(pa.table({
        "digest": pa.array(digests, pa.string()),
        "status": pa.array([res.seen[d] for d in digests], pa.int32()),
    }), os.path.join(out_dir, "golden_seen.parquet"))

    # per-page link extraction golden via the HTML path (independent
    # parser from the engine's span path — the cross-check the
    # input_hint's span-sequence invariant requires)
    from .functions.extract import extract_links_from_html
    from .functions.urls import netloc_host, parse_url

    allowed = [netloc_host(parse_url(r).netloc) for r in ROOT_URLS]
    l_doc, l_seq, l_url = [], [], []
    for row in fx.corpus.to_pylist():
        if (row["status_code"] != 200
                or not row["content_type"].startswith("text/html")
                or not row["spans"]):
            continue
        p = parse_url(row["url"])
        links = extract_links_from_html(row["body"], p.scheme,
                                        netloc_host(p.netloc), allowed,
                                        cfg.blacklist_paths)
        if links is None:
            continue  # abort pages emit nothing
        for i, link in enumerate(links):
            l_doc.append(row["url"])
            l_seq.append(i)
            l_url.append(link)
    pq.write_table(pa.table({
        "doc_id": pa.array(l_doc, pa.string()),
        "link_seq": pa.array(l_seq, pa.int32()),
        "link_url": pa.array(l_url, pa.string()),
    }), os.path.join(out_dir, "golden_links.parquet"))
