"""Property-based tests (hypothesis) for the pure operator layer —
invariants that must hold for ANY input, complementing the golden specs."""

import posixpath

from hypothesis import given, settings
from hypothesis import strategies as st

from govuk_crawler_worker_ray.functions import urls as U
from govuk_crawler_worker_ray.functions.content_types import (
    parse_content_type,
)

path_st = st.text(
    alphabet=st.sampled_from(list("abcXYZ019/._-~ +")), max_size=40)
url_path_st = st.builds(lambda p: "/" + p.lstrip("/"), path_st)


@settings(max_examples=300, deadline=None)
@given(path_st)
def test_go_path_clean_idempotent(p):
    once = U.go_path_clean(p)
    assert U.go_path_clean(once) == once
    # cleaned paths never contain "//", "/./" or interior "/../" after a
    # non-dotdot element (lexical-resolution invariant)
    assert "//" not in once
    assert "/./" not in once


@settings(max_examples=200, deadline=None)
@given(url_path_st)
def test_go_path_clean_matches_posixpath_for_rooted(p):
    # for rooted paths Go path.Clean and posixpath.normpath agree except
    # normpath's leading-"//" preservation
    got = U.go_path_clean(p)
    want = posixpath.normpath(p)
    if want.startswith("//") and not want.startswith("///"):
        want = want[1:]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(url_path_st)
def test_mirror_path_deterministic_and_relative(path):
    url = "https://www.gov.uk" + path
    a = U.relative_file_path(url, "text/html")
    b = U.relative_file_path(url, "text/html")
    assert a == b
    if a is not None:
        # never escapes the host directory, never absolute
        assert not a.startswith("/")
        assert not a.startswith("..")
        # html paths end with index.html / .html / the regex quirk match
        assert a == "www.gov.uk" or a.split("/")[0] == "www.gov.uk"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=30))
def test_parse_content_type_never_raises(s):
    out = parse_content_type(s)
    assert out is None or ("/" in out and out == out.lower())


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcdef0123456789", min_size=40,
                        max_size=40), max_size=50))
def test_shard_routing_stable_and_in_range(digests):
    shards = U.shard_of_digests([bytes.fromhex(d) for d in digests], 8)
    assert all(0 <= s < 8 for s in shards)
    again = U.shard_of_digests([bytes.fromhex(d) for d in digests], 8)
    assert list(shards) == list(again)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_publish_gate_and_blacklist_never_raise(u):
    U.publish_gate_params(u)
    U.is_blacklisted(u, ["/search", "/government/uploads"])
    U.has_params(u)
    U.canonicalize_url(u)
