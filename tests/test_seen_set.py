"""Seen-set semantics tests (ttl_hash_set_test.go / FIXTURES.md F7) plus
filter-structure invariants and the Ray actor path."""

import numpy as np
import pytest

from govuk_crawler_worker_ray.functions.urls import digest_hex_batch
from govuk_crawler_worker_ray.state.bloom import BloomFilter
from govuk_crawler_worker_ray.state.cuckoo import CuckooFilter
from govuk_crawler_worker_ray.state.seen_set import SeenSet, SeenShard

TTL = 12 * 3600.0


def dig(*urls):
    return digest_hex_batch(list(urls))


def test_bloom_no_false_negatives():
    bf = BloomFilter(10_000, fpp=0.01)
    keys = np.arange(1, 10_001, dtype=np.uint64) * np.uint64(2654435761)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    other = np.arange(20_000, 40_000, dtype=np.uint64) * np.uint64(97)
    fpp = bf.contains_many(other).mean()
    assert fpp < 0.05


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter(10_000)
    keys = (np.arange(1, 8_001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    assert cf.insert_many(keys) == 0
    assert cf.contains_many(keys).all()
    other = np.arange(100_000, 120_000, dtype=np.uint64)
    assert cf.contains_many(other).mean() < 0.01
    cf.delete_many(keys[:4000])
    assert cf.contains_many(keys[4000:]).all()  # no false negatives remain
    assert cf.contains_many(keys[:4000]).mean() < 0.02


def test_incr_sequence():
    # ttl_hash_set_test.go:135-147 — Incr yields 1,2,3,4
    shard = SeenShard(0, TTL)
    d = dig("https://www.gov.uk/x")
    for expect in (1, 2, 3, 4):
        assert shard.incr_batch(d, now=0.0)[0] == expect


def test_missing_reads_zero_and_exists():
    shard = SeenShard(0, TTL)
    d = dig("https://www.gov.uk/y")
    assert shard.get_batch(d, 0.0)[0] == 0       # missing => 0
    assert not shard.exists_batch(d, 0.0)[0]
    shard.set_batch(d, 1, 0.0)
    assert shard.get_batch(d, 0.0)[0] == 1
    assert shard.exists_batch(d, 0.0)[0]


def test_ttl_semantics():
    # ttl_hash_set_test.go:156-175 — negative for missing, positive after Incr
    shard = SeenShard(0, TTL)
    d = dig("https://www.gov.uk/z")
    assert shard.ttl_batch(d, 0.0)[0] < 0
    shard.incr_batch(d, 0.0)
    t = shard.ttl_batch(d, 0.0)[0]
    assert 0 < t <= TTL
    # expiry: after TTL elapses the key reads as missing again
    assert shard.get_batch(d, TTL + 1)[0] == 0
    assert shard.ttl_batch(d, TTL + 1)[0] < 0


def test_set_refreshes_ttl():
    shard = SeenShard(0, TTL)
    d = dig("https://www.gov.uk/r")
    shard.set_batch(d, 1, 0.0)
    shard.set_batch(d, 1, TTL - 10)  # SETEX resets expiry
    assert shard.get_batch(d, TTL + 5)[0] == 1


def test_enqueue_gate():
    # workflow.go:273-291 + workflow_test.go:436-532
    shard = SeenShard(0, TTL)
    d = dig("https://www.gov.uk/a", "https://www.gov.uk/b",
            "https://www.gov.uk/c")
    shard.set_batch([d[1]], 1, 0.0)   # b already Enqueued
    shard.incr_batch([d[2]], 0.0)
    shard.incr_batch([d[2]], 0.0)     # c has retry count 2 (> Enqueued)
    out = shard.enqueue_gate_batch(d, 0.0)
    assert list(out) == [True, False, False]
    # idempotent: second call finds a Enqueued now
    assert list(shard.enqueue_gate_batch(d, 0.0)) == [False, False, False]
    # ReadyToEnqueue (0) publishes again (workflow_test.go:502-532)
    shard.set_batch([d[0]], 0, 0.0)
    assert list(shard.enqueue_gate_batch([d[0]], 0.0)) == [True]


def test_client_routing_local():
    ss = SeenSet.local(num_shards=8, ttl_seconds=TTL)
    urls = [f"https://www.gov.uk/p{i}" for i in range(500)]
    ds = dig(*urls)
    assert (ss.get(ds, 0.0) == 0).all()
    ss.set(ds[:250], 1, 0.0)
    got = ss.get(ds, 0.0)
    assert (got[:250] == 1).all() and (got[250:] == 0).all()
    incrd = ss.incr(ds[250:], 0.0)
    assert (incrd == 1).all()
    gate = ss.enqueue_gate(ds, 0.0)
    assert (~gate[:250]).all() and (~gate[250:]).all()  # all status >= 1 now
    # multiple shards actually used
    assert sum(1 for s in ss.stats() if s["keys"] > 0) >= 4


def test_snapshot_roundtrip(tmp_path):
    ss = SeenSet.local(4, TTL)
    urls = [f"https://www.gov.uk/s{i}" for i in range(100)]
    ds = dig(*urls)
    ss.set(ds[:50], 1, 0.0)
    ss.incr(ds[50:], 0.0)
    ss.snapshot(str(tmp_path / "snap"))
    ss2 = SeenSet.local(4, TTL)
    ss2.load(str(tmp_path / "snap"))
    assert (ss2.get(ds, 1.0) == ss.get(ds, 1.0)).all()


@pytest.mark.usefixtures("ray_session")
def test_actor_path_matches_local():
    ss = SeenSet.actors(num_shards=4, ttl_seconds=TTL, namespace="t1")
    local = SeenSet.local(4, TTL)
    urls = [f"https://www.gov.uk/q{i}" for i in range(200)]
    ds = dig(*urls)
    for impl in (ss, local):
        impl.set(ds[:100], 1, 0.0)
        impl.incr(ds[100:150], 0.0)
    assert (ss.get(ds, 0.0) == local.get(ds, 0.0)).all()
    assert (ss.enqueue_gate(ds, 0.0) == local.enqueue_gate(ds, 0.0)).all()
    assert ss.health() == ["ok"] * 4
    ss.shutdown()


def test_empty_batches_round_trip():
    """Empty input must return empty TYPED arrays, never None (an empty
    post-split frontier crashed the max_crawl_retries<1 path)."""
    ss = SeenSet.local(4, TTL)
    assert ss.get([], 0.0).dtype == np.int64 and len(ss.get([], 0.0)) == 0
    assert ss.incr([], 0.0).dtype == np.int64
    assert ss.exists([], 0.0).dtype == bool
    assert ss.enqueue_gate([], 0.0).dtype == bool
    assert ss.ttl([], 0.0).dtype == np.float64
    ss.set([], 1, 0.0)  # no-op, no crash


def test_load_replaces_state():
    """Snapshot load REPLACES shard state (merge would let stale digests
    survive a resume and suppress re-publishes)."""
    sh = SeenShard(0, TTL)
    stale = dig("https://www.gov.uk/stale")
    sh.set_batch(stale, 1, 0.0)
    fresh = SeenShard(1, TTL)
    fresh.set_batch(dig("https://www.gov.uk/fresh"), 1, 0.0)
    sh.load_table(fresh.snapshot_table())
    assert sh.get_batch(stale, 0.0)[0] == 0          # stale digest gone
    assert not sh.exists_batch(stale, 0.0)[0]        # cuckoo rebuilt too
    assert sh.get_batch(dig("https://www.gov.uk/fresh"), 0.0)[0] == 1


def test_cuckoo_prefilter_consistent_after_expiry():
    """The cuckoo IS consulted on reads (deletion-aware pre-filter): after
    TTL expiry deletes keys, reads must stay exact, and the cuckoo count
    must reflect the deletions."""
    sh = SeenShard(0, TTL)
    ds = dig(*[f"https://www.gov.uk/x{i}" for i in range(300)])
    sh.set_batch(ds, 1, 0.0)
    assert sh.cuckoo.count == 300
    assert sh.exists_batch(ds, 0.0).all()
    # expire half by advancing the logical clock past their TTL
    later = TTL + 1.0
    sh.set_batch(ds[:150], 2, later)  # refresh first half at `later`
    assert (~sh.exists_batch(ds[150:], later)).all()
    assert sh.exists_batch(ds[:150], later).all()
    got = sh.get_batch(ds, later)
    assert (got[:150] == 2).all() and (got[150:] == 0).all()
    assert sh.cuckoo.count == 150  # expired keys deleted from the cuckoo


def test_cuckoo_overflow_falls_back_exact():
    """When the cuckoo overflows (insert failures) it stops being a
    definite-miss filter; reads must fall back to bloom+dict and stay
    exact.  Auto-grow normally prevents saturation entirely, so disable
    it here to force the lossy-filter regime."""
    sh = SeenShard(0, TTL, expected_keys=64)  # tiny filter
    sh._ensure_capacity = lambda n: None  # force saturation (no growth)
    ds = dig(*[f"https://www.gov.uk/o{i}" for i in range(2000)])
    sh.set_batch(ds, 1, 0.0)
    assert sh.cuckoo_overflow > 0  # filter actually overflowed
    assert (sh.get_batch(ds, 0.0) == 1).all()
    assert sh.exists_batch(ds, 0.0).all()


def test_filters_autogrow_past_expected_keys():
    """Inserting far beyond expected_keys must keep the cuckoo exact
    (overflow == 0, auto-grown) and reads correct — saturation once cost
    ~4ms/key in the 500-kick eviction loop."""
    sh = SeenShard(0, TTL, expected_keys=64)
    ds = dig(*[f"https://www.gov.uk/g{i}" for i in range(5000)])
    sh.set_batch(ds, 1, 0.0)
    assert sh.cuckoo_overflow == 0
    assert sh.cuckoo.count == 5000  # no duplicate fingerprints from growth
    assert sh.cuckoo.load_factor <= 2 / 3 + 1e-9
    assert (sh.get_batch(ds, 0.0) == 1).all()
    miss = dig(*[f"https://www.gov.uk/m{i}" for i in range(50)])
    assert not sh.exists_batch(miss, 0.0).any()
