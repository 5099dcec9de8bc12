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


# ---------------------------------------------------------------------------
# model-based seen-set check (FIXTURES.md F7): random op sequences against
# a plain dict+TTL reference model
# ---------------------------------------------------------------------------

_KEYS = [f"{i:040x}" for i in range(8)]
_ops = st.lists(
    st.tuples(st.sampled_from(["set0", "set1", "incr", "get", "exists",
                               "gate", "advance"]),
              st.sampled_from(_KEYS)),
    max_size=60)


@settings(max_examples=150, deadline=None)
@given(_ops)
def test_seen_shard_matches_dict_model(ops):
    from govuk_crawler_worker_ray.state.seen_set import SeenShard

    TTL = 10.0
    shard = SeenShard(0, TTL)
    model: dict[str, tuple[int, float]] = {}
    now = 0.0

    def m_get(k):
        ent = model.get(k)
        if ent is None or ent[1] <= now:
            model.pop(k, None)
            return 0
        return ent[0]

    for op, k in ops:
        if op == "advance":
            now += 3.0
            continue
        if op == "set0":
            shard.set_batch([k], 0, now)
            model[k] = (0, now + TTL)
        elif op == "set1":
            shard.set_batch([k], 1, now)
            model[k] = (1, now + TTL)
        elif op == "incr":
            got = shard.incr_batch([k], now)[0]
            want = m_get(k) + 1
            model[k] = (want, now + TTL)
            assert got == want
        elif op == "get":
            assert shard.get_batch([k], now)[0] == m_get(k)
        elif op == "exists":
            want = (k in model and model[k][1] > now)
            assert bool(shard.exists_batch([k], now)[0]) == want
        elif op == "gate":
            got = bool(shard.enqueue_gate_batch([k], now)[0])
            want = m_get(k) < 1
            if want:
                model[k] = (1, now + TTL)
            assert got == want
    # final states agree for every key
    for k in _KEYS:
        assert shard.get_batch([k], now)[0] == m_get(k)


def test_rank_partition_property():
    """Property: for random per-shard SORTED key arrays, the rank
    exchange assigns exactly the dense global sort order."""
    import numpy as np

    from govuk_crawler_worker_ray.state.seen_set import SeenShard

    rng = np.random.default_rng(7)
    for _ in range(20):
        S = int(rng.integers(1, 9))
        arrs = [np.sort(rng.integers(0, 10**6, int(rng.integers(0, 50))))
                .astype(np.int64) for _ in range(S)]
        ranks = SeenShard(0, 1.0).rank_partition(arrs)
        # reassemble: key at global rank r
        allk = np.concatenate(arrs) if any(len(a) for a in arrs) else \
            np.zeros(0, np.int64)
        out = np.empty(len(allk), dtype=np.int64)
        for a, r in zip(arrs, ranks):
            out[r] = a
        assert (out == np.sort(allk)).all()
        # ranks are a permutation
        flat = np.concatenate([r for r in ranks]) if len(allk) else \
            np.zeros(0, np.int64)
        assert sorted(flat.tolist()) == list(range(len(allk)))
