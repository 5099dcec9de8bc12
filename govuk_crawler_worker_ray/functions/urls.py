"""URL operators with reference-parity semantics.

Every function documents the reference behavior it reproduces
(citations are file:line into /root/reference).  Scalar versions first
(used by the pure-Python oracle and unit tests), then numpy/Arrow batch
wrappers used inside ``map_batches`` stages.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from urllib.parse import parse_qs, unquote, unquote_plus, urlencode, urlsplit

import numpy as np

# Matches Go's regexp `.(html|htm)$` (crawler_message_item.go:64) — note the
# unescaped '.' matches ANY character, so "/foohtml" also matches; reproduced
# faithfully.
_HTML_SUFFIX_RE = re.compile(r".(html|htm)$")

# Compiled scans for the hot gates (a per-character Python genexpr here was
# ~30% of the whole fetch stage): control chars Go url.Parse rejects, and
# '%' not followed by two hex digits (invalid escape).
_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")
_BAD_ESCAPE_RE = re.compile(r"%(?![0-9a-fA-F]{2})")


def valid_percent_escapes(s: str) -> bool:
    """Go url.Parse errors on invalid %-escapes ("invalid URL escape");
    Python's urlsplit does not — so we check explicitly for parity."""
    return _BAD_ESCAPE_RE.search(s) is None


@lru_cache(maxsize=1 << 16)
def parse_url(u: str):
    """Parse with Go-url.Parse-shaped failure semantics: returns the
    urlsplit result, or None when Go would error (control chars, invalid
    escapes) — used for the whole-page-abort parity
    (crawler_message_item.go:144-147, workflow.go:230-234).

    Memoized: the fetch stage's gates parse the same URL up to four
    times per row (blacklist, host gate, has_params, mirror path);
    SplitResult is an immutable namedtuple, safe to share."""
    if _CTRL_RE.search(u) is not None:
        return None
    if _BAD_ESCAPE_RE.search(u) is not None:
        return None
    try:
        return urlsplit(u)
    except ValueError:
        return None


def url_host(u: str) -> str:
    """The Go ``url.URL.Host`` field: netloc minus userinfo, port kept,
    case preserved (Python's ``.hostname`` lowercases — avoid)."""
    parts = parse_url(u)
    if parts is None:
        return ""
    return netloc_host(parts.netloc)


def netloc_host(netloc: str) -> str:
    return netloc.rsplit("@", 1)[-1]


def host_only(hostport: str) -> str:
    """Strip ``:port`` (http_crawler/crawler.go:173-185)."""
    return hostport.split(":", 1)[0]


def is_allowed_host(host: str, allowed_hosts: list[str]) -> bool:
    """Port-stripped host membership (http_crawler/crawler.go:154-169);
    ``allowed_hosts`` are the Host parts of the root URLs."""
    needle = host_only(host)
    return any(host_only(h) == needle for h in allowed_hosts)


def has_params(u: str) -> bool:
    """True when the URL has a raw query OR is unparseable
    (crawler_message_item.go:37-41)."""
    parts = parse_url(u)
    return parts is None or parts.query != ""


def go_path_clean(p: str) -> str:
    """Go's ``path.Clean`` (used at crawler_message_item.go:78).

    Lexical cleaning: collapse //, drop ".", resolve "..", keep leading
    ".." on relative paths, return "." for empty results.
    """
    if p == "":
        return "."
    rooted = p.startswith("/")
    out: list[str] = []
    for elem in p.split("/"):
        if elem == "" or elem == ".":
            continue
        if elem == "..":
            if out and out[-1] != "..":
                out.pop()
            elif not rooted:
                out.append("..")
            # rooted "/.." collapses to "/"
        else:
            out.append(elem)
    cleaned = "/".join(out)
    if rooted:
        cleaned = "/" + cleaned
    if cleaned == "":
        cleaned = "."
    return cleaned


def is_blacklisted_path(path: str, blacklist: list[str]) -> bool:
    """Prefix match over the blacklist (crawler_message_item.go:239-247)."""
    return any(path.startswith(b) for b in blacklist)


def is_blacklisted(u: str, blacklist: list[str]) -> bool:
    """URL-path blacklist gate; malformed URL => False
    (crawler_message_item.go:130-137)."""
    parts = parse_url(u)
    if parts is None:
        return False
    return is_blacklisted_path(_go_decoded_path(parts.path), blacklist)


def _go_decoded_path(raw_path: str) -> str:
    """Go ``url.Parse`` stores the DECODED path in ``.Path``; Python's
    urlsplit keeps it raw.  Decode once for parity."""
    return unquote(raw_path)


def relative_file_path(u: str, content_type_mime: str | None) -> str | None:
    """URL -> mirror path (crawler_message_item.go:43-83).

    Semantics reproduced exactly:
    - Go parses (decoding the path once) then applies ``QueryUnescape``
      (a SECOND decode, which also maps '+' -> ' ') — double decode;
    - host is the port-stripped Host (auth stripped by Parse);
    - for HTML (parsed mime == "text/html"): dir paths get "index.html",
      paths not matching regex `.(html|htm)$` get ".html" appended;
    - then Go ``path.Clean``, join host, trim leading "/".
    Query and fragment are dropped (never part of .Path).
    Returns None when the reference would error (reject).
    """
    parts = parse_url(u)
    if parts is None:
        return None
    file_path = _go_decoded_path(parts.path)
    # QueryUnescape pass: '+'->' ' and %XX decode; invalid escapes error.
    if not valid_percent_escapes(file_path):
        return None
    file_path = unquote_plus(file_path)
    host = host_only(netloc_host(parts.netloc))
    if content_type_mime == "text/html":
        if file_path.endswith("/"):
            file_path += "index.html"
        elif not _HTML_SUFFIX_RE.search(file_path):
            file_path += ".html"
    file_path = go_path_clean(file_path)
    # filepath.Join(host, cleaned) + TrimPrefix "/": Join drops "." elements.
    if file_path == ".":
        joined = host
    else:
        joined = go_path_clean(host + "/" + file_path) if host else file_path
    return joined.lstrip("/")


def publish_gate_params(u: str) -> bool:
    """The PublishURLs query-param gate (workflow.go:259-270).

    Returns True when the URL survives (may be published):
    - no raw query -> survives;
    - query that fails to parse -> dropped;
    - delete the ``page`` key (pagination); if anything remains -> dropped.
    """
    parts = parse_url(u)
    if parts is None:
        return False
    raw_query = parts.query
    if raw_query == "":
        return True
    try:
        values = parse_qs(raw_query, keep_blank_values=True,
                          strict_parsing=False, separator="&")
    except ValueError:
        return False
    if ";" in raw_query:
        # Go ParseQuery splits on both & and ; — emulate.
        try:
            values = {}
            for chunk in re.split("[&;]", raw_query):
                if not chunk:
                    continue
                k, _, v = chunk.partition("=")
                values.setdefault(unquote_plus(k), []).append(unquote_plus(v))
        except ValueError:
            return False
    values.pop("page", None)
    return urlencode(values, doseq=True) == ""


def remove_fragment(u: str) -> str:
    """Clear ``#fragment`` (crawler_message_item.go:160-165)."""
    i = u.find("#")
    return u if i == -1 else u[:i]


def canonicalize_url(u: str) -> str:
    """North-rule canonicalization (scale path; NOT applied in
    reference-parity mode): lowercase scheme+host, strip default ports,
    drop fragment, empty path -> "/"."""
    parts = parse_url(u)
    if parts is None:
        return u
    scheme = parts.scheme.lower()
    netloc = netloc_host(parts.netloc).lower()
    if (scheme == "http" and netloc.endswith(":80")) or (
            scheme == "https" and netloc.endswith(":443")):
        netloc = netloc.rsplit(":", 1)[0]
    path = parts.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


# ---------------------------------------------------------------------------
# digests (seen-set keys)
# ---------------------------------------------------------------------------

def url_digest(u: str, algo: str = "sha1") -> bytes:
    """Seen-set key digest.  The reference keys on md5 of the EXACT URL
    string (ttl_hash_set/ttl_hash_set.go:202-204); the north rule mandates
    sha1 of the canonicalized URL.  Both supported; callers pick."""
    h = hashlib.sha1 if algo == "sha1" else hashlib.md5
    return h(u.encode("utf-8", "surrogatepass")).digest()


def digest_batch(urls, algo: str = "sha1") -> list[bytes]:
    h = hashlib.sha1 if algo == "sha1" else hashlib.md5
    return [h(u.encode("utf-8", "surrogatepass")).digest() for u in urls]


def digest_hex_batch(urls, algo: str = "sha1") -> list[str]:
    h = hashlib.sha1 if algo == "sha1" else hashlib.md5
    return [h(u.encode("utf-8", "surrogatepass")).hexdigest() for u in urls]


def shard_of_digest(digest: bytes, num_shards: int) -> int:
    """Deterministic shard routing: first 8 bytes as big-endian uint64."""
    return int.from_bytes(digest[:8], "big") % num_shards


def shard_of_digests(digests: list[bytes], num_shards: int) -> np.ndarray:
    if not digests:
        return np.empty(0, dtype=np.int64)
    arr = np.frombuffer(b"".join(d[:8] for d in digests), dtype=">u8")
    return (arr % np.uint64(num_shards)).astype(np.int64)
