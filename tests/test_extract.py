"""Link-extraction conformance tests (crawler_message_item_test.go:264-425)
plus HTML-path vs span-path equality (the per-row invariant from
BASELINE.json input_hint)."""

import pyarrow as pa

from govuk_crawler_worker_ray.functions import extract as E

ROOT_HOSTS = ["www.gov.uk", "assets.digital.cabinet-office.gov.uk",
              "example.com"]
BASE = ("https", "www.gov.uk")


def ex(html, blacklist=(), base=BASE, hosts=ROOT_HOSTS):
    return E.extract_links_from_html(html, base[0], base[1], list(hosts),
                                     list(blacklist))


def test_multi_class_extraction():
    html = '''
      <img src="https://assets.digital.cabinet-office.gov.uk/image.png">
      <a href="https://www.gov.uk/foo">Test</a>
      <script src="https://example.com/jq.js"></script>
      <script src="https://google.com/another.js"></script>
    '''
    assert ex(html) == [
        "https://www.gov.uk/foo",
        "https://assets.digital.cabinet-office.gov.uk/image.png",
        "https://example.com/jq.js",
    ]


def test_empty_body():
    assert ex("") == []


def test_each_class():
    assert ex('<div><a href="https://www.gov.uk/"></a></div>') == [
        "https://www.gov.uk/"]
    assert ex('<div><img src="https://www.gov.uk/image.png" /></div>') == [
        "https://www.gov.uk/image.png"]
    assert ex('<head><link rel="icon" href="https://www.gov.uk/favicon.ico">'
              '</head>') == ["https://www.gov.uk/favicon.ico"]
    assert ex('<head><script type="text/javascript" '
              'src="https://www.gov.uk/jq.js"></script></head>') == [
        "https://www.gov.uk/jq.js"]


def test_off_host_filtered():
    assert ex('<head><script src="https://www.foobar.com/jq.js"></script>'
              '</head>') == []


def test_relative_and_mailto():
    assert ex('<div><a href="/foo/bar">a</a>'
              '<a href="mailto:c@d.com">b</a></div>') == [
        "https://www.gov.uk/foo/bar"]


def test_fragment_removed():
    assert ex('<div><a href="https://www.gov.uk/#germany"></a></div>') == [
        "https://www.gov.uk/"]


def test_blacklisted_removed():
    assert ex('<div><a href="/foo/bar">a</a><a href="/trade-tariff">b</a>'
              '</div>', blacklist=["/trade-tariff"]) == [
        "https://www.gov.uk/foo/bar"]


def test_unique():
    assert ex('<a href="https://www.gov.uk/foo">a</a>'
              '<a href="https://www.gov.uk/foo">b</a>') == [
        "https://www.gov.uk/foo"]


def test_missing_attr_quirk():
    # goquery's Attr ignores the exists flag (crawler_message_item.go:231):
    # an <a> with no href contributes "" which resolves to the bare base URL.
    assert ex('<a name="anchor">x</a>') == ["https://www.gov.uk"]


def test_class_order_groups_output():
    # classes are scanned a, img, link, script (crawler_message_item.go:93-98)
    html = ('<script src="/s.js"></script><img src="/i.png">'
            '<a href="/a.html">x</a><link href="/c.css">')
    assert ex(html) == [
        "https://www.gov.uk/a.html", "https://www.gov.uk/i.png",
        "https://www.gov.uk/c.css", "https://www.gov.uk/s.js"]


def _spans_for(html_links):
    """Build an interleaved span doc equivalent to a simple HTML page."""
    spans = []
    off = 0
    for kind, ref, text in html_links:
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": off})
        off += 1
    return spans


def test_span_path_equals_html_path():
    html = ('<p>intro</p><a href="/a.html">x</a><img src="/i.png">'
            '<link href="/c.css"><script src="/s.js"></script>'
            '<a href="https://example.com/z">z</a>'
            '<a href="/a.html">dup</a>')
    spans = [
        {"kind": "text", "text": "intro", "media_ref": None, "offset": 0},
        {"kind": "link", "text": "x", "media_ref": "/a.html", "offset": 1},
        {"kind": "img", "text": "", "media_ref": "/i.png", "offset": 2},
        {"kind": "css_link", "text": "", "media_ref": "/c.css", "offset": 3},
        {"kind": "script", "text": "", "media_ref": "/s.js", "offset": 4},
        {"kind": "link", "text": "z", "media_ref": "https://example.com/z",
         "offset": 5},
        {"kind": "link", "text": "dup", "media_ref": "/a.html", "offset": 6},
    ]
    got_html = ex(html)
    got_spans = E.extract_links_from_spans(spans, "https", "www.gov.uk",
                                           ROOT_HOSTS, [])
    assert got_html == got_spans
    # within a class, filterURLsByHost groups output by allowed-host order
    # (crawler_message_item.go:167-175): gov.uk links precede example.com.
    assert got_spans == [
        "https://www.gov.uk/a.html", "https://example.com/z",
        "https://www.gov.uk/i.png", "https://www.gov.uk/c.css",
        "https://www.gov.uk/s.js"]


def test_parse_abort():
    # any unparseable href aborts the page (crawler_message_item.go:144-147)
    assert ex('<a href="http://%zz/bad">x</a>'
              '<a href="https://www.gov.uk/ok">y</a>') is None


def test_batch_extraction_matches_scalar():
    docs = [
        ("https://www.gov.uk/p1", [
            {"kind": "link", "text": "x", "media_ref": "/a.html",
             "offset": 0},
            {"kind": "text", "text": "blah", "media_ref": None, "offset": 1},
            {"kind": "img", "text": "", "media_ref": "/i.png", "offset": 2},
        ]),
        ("https://www.gov.uk/p2", [
            {"kind": "link", "text": "b", "media_ref": "http://%zz/bad",
             "offset": 0},
        ]),
        ("https://www.gov.uk/p3", []),
        ("https://example.com/p4", [
            {"kind": "script", "text": "", "media_ref": "/s.js", "offset": 0},
            {"kind": "link", "text": "", "media_ref": "/search?q=1",
             "offset": 1},
        ]),
    ]
    from govuk_crawler_worker_ray.schemas import SPAN_STRUCT
    batch = pa.table({
        "url": pa.array([d[0] for d in docs]),
        "spans": pa.array([d[1] for d in docs], pa.list_(SPAN_STRUCT)),
    })
    out = E.extract_links_spans_batch(batch, ROOT_HOSTS, ["/search"])
    rows = list(zip(out["src_url"].to_pylist(), out["link_url"].to_pylist(),
                    out["link_seq"].to_pylist()))
    links = [r for r in rows if r[2] >= 0]
    markers = [r for r in rows if r[2] < 0]
    assert links == [
        ("https://www.gov.uk/p1", "https://www.gov.uk/a.html", 0),
        ("https://www.gov.uk/p1", "https://www.gov.uk/i.png", 1),
        ("https://example.com/p4", "https://example.com/s.js", 0),
    ]
    assert markers == [("https://www.gov.uk/p2", None, -1)]  # abort


def test_vectorized_equals_scalar_on_corpus():
    """The vectorized batch extractor must be row-identical to the scalar
    reference implementation over the full conformance corpus."""
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS, generate_corpus
    from govuk_crawler_worker_ray.functions.extract import (
        extract_links_spans_batch,
        extract_links_spans_batch_scalar,
    )
    from govuk_crawler_worker_ray.functions.urls import netloc_host, parse_url

    fx = generate_corpus(400, 42)
    allowed = [netloc_host(parse_url(r).netloc) for r in ROOT_URLS]
    bl = ["/search", "/government/uploads"]
    html = fx.corpus.filter(
        pa.compute.match_substring_regex(fx.corpus["content_type"],
                                         "^text/html"))
    batch = pa.table({"url": html["url"], "spans": html["spans"]})
    a = extract_links_spans_batch_scalar(batch, allowed, bl)
    b = extract_links_spans_batch(batch, allowed, bl)

    def rows(t):
        links = [r for r in zip(t["src_url"].to_pylist(),
                                t["link_url"].to_pylist(),
                                t["link_seq"].to_pylist())
                 if r[2] >= 0]
        markers = {r[0] for r in zip(t["src_url"].to_pylist(),
                                     t["link_seq"].to_pylist())
                   if r[1] < 0}
        return links, markers

    la, ma = rows(a)
    lb, mb = rows(b)
    assert la == lb
    assert ma == mb and len(ma) > 0  # abort page present and identical


def test_vectorized_equals_scalar_on_edge_refs():
    from govuk_crawler_worker_ray.functions.extract import (
        extract_links_spans_batch,
        extract_links_spans_batch_scalar,
    )
    from govuk_crawler_worker_ray.schemas import SPAN_STRUCT

    edge_refs = [
        "", " ", "/a", "//proto.example.com/x", "relative/path",
        "../up", "mailto:a@b.c", "https://www.gov.uk", "HTTP://WWW.GOV.UK/x",
        "https://www.gov.uk:443/y", "https://user:p@www.gov.uk/z",
        "/with%20escape", "/with+plus", "#only-frag", "?only-query",
        "/page#frag", "https://example.com/q?page=1",
        "https://www.gov.uk/search?q=x", "javascript:void(0)",
        "  /spaces  ", "/semi;colon", "/per%cent-bad",
    ]
    docs = []
    for i, r in enumerate(edge_refs):
        docs.append((f"https://www.gov.uk/p{i}",
                     [{"kind": "link", "text": "t", "media_ref": r,
                       "offset": 0},
                      {"kind": "img", "text": "", "media_ref": "/i.png",
                       "offset": 1}]))
    # one page with ALL refs together (intra-page interactions)
    docs.append(("https://example.com/all",
                 [{"kind": "link", "text": "", "media_ref": r, "offset": o}
                  for o, r in enumerate(edge_refs)]))
    batch = pa.table({
        "url": pa.array([d[0] for d in docs]),
        "spans": pa.array([d[1] for d in docs], pa.list_(SPAN_STRUCT)),
    })
    allowed = ["www.gov.uk", "example.com"]
    bl = ["/search"]
    a = extract_links_spans_batch_scalar(batch, allowed, bl)
    b = extract_links_spans_batch(batch, allowed, bl)
    ra = list(zip(a["src_url"].to_pylist(), a["link_url"].to_pylist(),
                  a["link_seq"].to_pylist()))
    rb = list(zip(b["src_url"].to_pylist(), b["link_url"].to_pylist(),
                  b["link_seq"].to_pylist()))
    assert sorted(ra, key=str) == sorted(rb, key=str)
    # link ordering (non-marker) must match exactly
    assert [r for r in ra if r[2] >= 0] == [r for r in rb if r[2] >= 0]
