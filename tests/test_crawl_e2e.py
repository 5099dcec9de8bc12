"""End-to-end crawl parity: the Ray Data engine vs the sequential oracle
(FIXTURES.md F8 goldens) — final seen set, crawl order, mirror contents —
plus politeness budgets and checkpoint/resume."""

import shutil

import pytest

from govuk_crawler_worker_ray.config import CrawlConfig
from govuk_crawler_worker_ray.corpusgen import ROOT_URLS, generate_corpus
from govuk_crawler_worker_ray.pipelines.crawl import CrawlEngine, run_crawl
from govuk_crawler_worker_ray.reference_oracle import crawl_oracle


@pytest.fixture(scope="module")
def fixture():
    fx = generate_corpus(200, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    return fx, cfg, oracle


def _order(res):
    return list(zip(res.crawl_order["round"].to_pylist(),
                    res.crawl_order["url"].to_pylist()))


def _check_parity(res, oracle):
    assert _order(res) == [(r, u) for r, _, u in oracle.crawl_order]
    st = res.seen.to_table()
    assert dict(zip(st["digest"].to_pylist(),
                    st["status"].to_pylist())) == oracle.seen
    mt = res.mirror_table()
    eng_m = {p: (u, b) for p, u, b in zip(mt["mirror_path"].to_pylist(),
                                          mt["url"].to_pylist(),
                                          mt["body"].to_pylist())}
    assert eng_m == oracle.mirror


def test_local_engine_matches_oracle(fixture, tmp_path):
    fx, cfg, oracle = fixture
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "out"),
                    use_ray=False)
    _check_parity(res, oracle)
    assert res.metrics[0]["frontier"] == len(fx.seeds)


def test_politeness_budget_defers(fixture, tmp_path):
    fx, _, _ = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), per_host_budget=7,
                      max_rounds=80)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "budget"),
                    use_ray=False)
    assert _order(res) == [(r, u) for r, _, u in oracle.crawl_order]
    assert any(m["deferred"] > 0 for m in res.metrics)
    # budget respected every round
    for m in res.metrics:
        assert m["fetched"] <= 7 * 3 + 7  # three hosts + margin


@pytest.mark.usefixtures("ray_session")
def test_ray_engine_matches_oracle(fixture, tmp_path):
    fx, cfg, oracle = fixture
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "ray_out"),
                      use_ray=True, small_round_threshold=0)
    try:
        res = eng.run(fx.seeds)
        _check_parity(res, oracle)
        # the lazy Dataset mirror path (scale path: narrow max-okey
        # aggregate + one body join) must equal the oracle too.
        # Shut the engine down FIRST (idempotent): the persistent fetch
        # pool reserves the tiny test session's CPUs and would starve
        # the Ray Data tasks the mirror join schedules.
        eng.shutdown()
        md = res.mirror_dataset()
        eng_m = {}
        for b in md.iter_batches(batch_format="pyarrow"):
            for p, u, bd in zip(b["mirror_path"].to_pylist(),
                                b["url"].to_pylist(),
                                b["body"].to_pylist()):
                eng_m[p] = (u, bd)
        assert eng_m == oracle.mirror
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_resume_from_checkpoint(fixture, tmp_path):
    """Kill the crawl after N rounds; a resumed engine must complete with
    identical goldens (checkpoint atomicity, SURVEY.md §7.4)."""
    fx, cfg, oracle = fixture
    out = str(tmp_path / "resume_out")
    cfg_short = CrawlConfig(root_urls=list(ROOT_URLS), max_rounds=3)
    eng = CrawlEngine(fx.corpus, cfg_short, out, use_ray=True,
                      small_round_threshold=10**9)  # local fast path
    eng.run(fx.seeds)
    eng.shutdown()
    # fresh engine, fresh (empty) seen shards; resume from disk
    eng2 = CrawlEngine(fx.corpus, cfg, out, use_ray=True,
                       small_round_threshold=10**9)
    try:
        res = eng2.run(fx.seeds, resume=True)
        _check_parity(res, oracle)
        assert res.rounds == len(res.metrics)
    finally:
        eng2.shutdown()


def test_dup_frontier_rows_handled(tmp_path):
    """The flaky seed is republished while requeued: duplicate frontier
    rows with the same digest must interleave like the sequential
    reference (workflow.go:86,107)."""
    fx = generate_corpus(60, 7)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "dup"),
                    use_ray=False)
    # the flaky seed must appear at least twice in the crawl order
    flaky = [u for _, u in _order(res) if u.endswith("flaky-seed")]
    assert len(flaky) >= 1
    _check_parity(res, oracle)


@pytest.mark.usefixtures("ray_session")
def test_ray_engine_parity_medium(tmp_path):
    """Pool path with MANY concurrent chunks per round: candidates stage
    worker->shard out of order and must still replay in discovery order
    (the shard-side sort).  Small rounds never exercise this."""
    fx = generate_corpus(1500, 11)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), crawler_threads=4,
                      fetch_batch_size=128)  # force multi-chunk rounds
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "med"),
                      use_ray=True, small_round_threshold=8)
    try:
        res = eng.run(fx.seeds)
        assert _order(res) == [(r, u) for r, _, u in oracle.crawl_order]
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
    finally:
        eng.shutdown()


def test_crash_leftovers_cleared_on_resume(tmp_path):
    """A crashed round attempt leaves partial fetched parts; resume must
    clear them or they leak into the mirror (stale-part bug)."""
    import os

    import pyarrow.parquet as pq_

    fx = generate_corpus(120, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    out = str(tmp_path / "crash")
    cfg3 = CrawlConfig(root_urls=list(ROOT_URLS), max_rounds=3)
    run_crawl(fx.corpus, fx.seeds, cfg3, out, use_ray=False)
    # simulate a crashed round=3 attempt: stale part with bogus rows
    rdir = os.path.join(out, "round=3", "fetched")
    os.makedirs(rdir, exist_ok=True)
    stale = pq_.read_table(os.path.join(out, "round=0", "fetched",
                                        "part-local.parquet"))
    pq_.write_table(stale, os.path.join(rdir, "part-stale.parquet"))
    res = run_crawl(fx.corpus, fx.seeds, cfg, out, use_ray=False,
                    resume=True)
    _check_parity(res, oracle)


def test_combined_features_parity(tmp_path):
    """All engine features at once — robots + politeness budget + 429
    give-up + sparse checkpoints + mid-crawl TTL — against the oracle."""
    fx = generate_corpus(250, 99)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), respect_robots=True,
                      per_host_budget=25, give_up_429_after=2,
                      checkpoint_every=3, ttl_expire_seconds=20.0,
                      seconds_per_round=1.0, max_rounds=25)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "combo"),
                    use_ray=False)
    assert _order(res) == [(r, u) for r, _, u in oracle.crawl_order]
    assert sum(m["robots_excluded"] for m in res.metrics) > 0
    assert any(m["deferred"] > 0 for m in res.metrics)


def test_seed_priorities_order(tmp_path):
    """Higher-priority seeds are crawled first (the north rule's priority
    queue; the reference publishes everything at priority 0 —
    queue_connection.go:129 — so default behavior is unchanged FIFO)."""
    fx = generate_corpus(60, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    pr = [0, 0, 5, 0]  # example.com root gets priority 5
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg, seed_priorities=pr)
    from govuk_crawler_worker_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "prio"),
                      use_ray=False)
    res = eng.run(fx.seeds, seed_priorities=pr)
    order = _order(res)
    assert order == [(r, u) for r, _, u in oracle.crawl_order]
    # the priority-5 seed is the FIRST fetch of round 0
    assert order[0][1] == "https://example.com/"


def test_mirror_rejected_page_counted_fetched(tmp_path):
    """A fetched, content-accepted page whose mirror path errors (second
    percent-decode fails: /conformance/mirror-err%25zz) is counted as
    FETCHED and appears in crawl order, but is rejected by the write
    stage and never mirrored or extracted (workflow.go:162-170 ordering
    vs CrawlURL)."""
    fx = generate_corpus(60, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "merr"),
                    use_ray=False)
    bad = "https://www.gov.uk/conformance/mirror-err%25zz"
    assert bad in [u for _, u in _order(res)]
    assert bad in [u for _, _, u in oracle.crawl_order]
    _check_parity(res, oracle)
    assert all(bad != u for u, _ in oracle.mirror.values())
    # engine metrics count it as both fetched and rejected
    tot_fetched = sum(m["fetched"] for m in res.metrics)
    assert tot_fetched == len(oracle.crawl_order)


def test_host_token_budget_429_backoff(tmp_path):
    """Per-host politeness token bucket (SURVEY §4 rate-limiting row): a
    host that returns 429 gets ZERO tokens the next round (its rows
    defer) while other hosts keep fetching; the feature is off by
    default so reference parity is unaffected (see the parity tests)."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.schemas import CORPUS_SCHEMA

    def page(url, host, status=200, spans=None, transient=False):
        spans = spans or [{"kind": "text", "text": "body", "media_ref": "",
                           "offset": 0}]
        return dict(url=url, host=host, status_code=status,
                    content_type="text/html; charset=utf-8", spans=spans,
                    body="<p>body</p>", redirect_location=None,
                    transient=transient)

    link = lambda u: {"kind": "link", "text": "l", "media_ref": u,  # noqa
                      "offset": 0}
    rows = [
        page("https://www.gov.uk/", "www.gov.uk",
             spans=[link("https://www.gov.uk/a"),
                    link("https://www.gov.uk/b")]),
        page("https://www.gov.uk/a", "www.gov.uk"),
        page("https://www.gov.uk/b", "www.gov.uk"),
        # slow host root 429s on the first attempt, succeeds on retry
        page("https://slow.gov.uk/", "slow.gov.uk", status=429,
             transient=True),
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    cfg = CrawlConfig(
        root_urls=["https://www.gov.uk/", "https://slow.gov.uk/"],
        host_token_budget=2, max_rounds=10)
    res = run_crawl(corpus, ["https://www.gov.uk/",
                             "https://slow.gov.uk/"],
                    cfg, str(tmp_path / "tok"), use_ray=False)
    order = _order(res)
    # round 0: both roots attempted, slow 429s -> requeued
    assert res.metrics[0]["requeued"] == 1
    # round 1: slow host in back-off (its retry DEFERS) while www.gov.uk
    # keeps fetching its round-1 links
    assert res.metrics[1]["deferred"] >= 1
    r1_hosts = {u.split("/")[2] for r, u in order if r == 1}
    assert r1_hosts == {"www.gov.uk"}
    assert "slow.gov.uk" not in {u.split("/")[2] for r, u in order
                                 if r <= 1}
    # the slow root is eventually fetched once the back-off clears
    slow_rounds = [r for r, u in order if u == "https://slow.gov.uk/"]
    assert slow_rounds and slow_rounds[0] >= 2
    # every www.gov.uk page got through
    assert {u for _, u in order if "www.gov.uk" in u} == {
        "https://www.gov.uk/", "https://www.gov.uk/a",
        "https://www.gov.uk/b"}


@pytest.mark.usefixtures("ray_session")
def test_storage_frontier_matches_oracle(fixture, tmp_path):
    """frontier_on_storage: winners go shard->parquet with seqs from the
    ordering-key exchange and fetch runs from file refs — goldens (crawl
    order incl. seqs, seen set, mirror) must be BIT-identical to the
    oracle and to the in-memory path."""
    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "sto"), use_ray=True)
    try:
        res = eng.run(fx.seeds)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
        mt = res.mirror_table()
        eng_m = {p: (u, b) for p, u, b in zip(
            mt["mirror_path"].to_pylist(), mt["url"].to_pylist(),
            mt["body"].to_pylist())}
        assert eng_m == oracle.mirror
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_storage_frontier_single_shard(fixture, tmp_path):
    """S == 1 regression: Ray returns a BARE ref (not a tuple) from
    .options(num_returns=1), which used to crash the rank exchange."""
    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True,
                      num_seen_shards=1)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "sto1"), use_ray=True)
    try:
        res = eng.run(fx.seeds)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_storage_frontier_resume(fixture, tmp_path):
    """Storage-mode checkpoint/resume: manifest carries the frontier
    part paths; a fresh engine resumes and completes with identical
    goldens."""
    fx, cfg0, oracle = fixture
    out = str(tmp_path / "sto_resume")
    cfg_short = CrawlConfig(root_urls=list(ROOT_URLS), max_rounds=3,
                            frontier_on_storage=True)
    eng = CrawlEngine(fx.corpus, cfg_short, out, use_ray=True)
    eng.run(fx.seeds)
    eng.shutdown()
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True)
    eng2 = CrawlEngine(fx.corpus, cfg, out, use_ray=True)
    try:
        res = eng2.run(fx.seeds, resume=True)
        assert [(r, u) for r, _, u in oracle.crawl_order] == \
            list(zip(res.crawl_order["round"].to_pylist(),
                     res.crawl_order["url"].to_pylist()))
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
    finally:
        eng2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_storage_budget_matches_oracle(fixture, tmp_path):
    """Politeness budgets in storage mode (ROADMAP #2): the distributed
    per-(subsegment, host) cumcount exchange must reproduce the
    in-memory gate exactly — order incl. seqs, seen set, and per-round
    deferral counts all match the sequential oracle."""
    fx, _, _ = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), per_host_budget=7,
                      max_rounds=80, frontier_on_storage=True)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    cfg_mem = CrawlConfig(root_urls=list(ROOT_URLS), per_host_budget=7,
                          max_rounds=80)
    mem = run_crawl(fx.corpus, fx.seeds, cfg_mem,
                    str(tmp_path / "bud_mem"), use_ray=False)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "bud_sto"),
                      use_ray=True)
    try:
        res = eng.run(fx.seeds)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
        assert any(m["deferred"] > 0 for m in res.metrics)
        assert ([m["deferred"] for m in res.metrics]
                == [m["deferred"] for m in mem.metrics])
        assert ([m["fetched"] for m in res.metrics]
                == [m["fetched"] for m in mem.metrics])
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_storage_token_budget_matches_memory(tmp_path):
    """Token-bucket politeness (429 back-off) in storage mode must match
    the in-memory path round for round: carry-over tokens, zero-token
    back-off for 429'd hosts, and deferral of part rows."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.schemas import CORPUS_SCHEMA

    def page(url, host, status=200, spans=None, transient=False):
        spans = spans or [{"kind": "text", "text": "body",
                           "media_ref": "", "offset": 0}]
        return dict(url=url, host=host, status_code=status,
                    content_type="text/html; charset=utf-8", spans=spans,
                    body="<p>body</p>", redirect_location=None,
                    transient=transient)

    link = lambda u: {"kind": "link", "text": "l", "media_ref": u,  # noqa
                      "offset": 0}
    rows = [
        page("https://www.gov.uk/", "www.gov.uk",
             spans=[link(f"https://www.gov.uk/p{i}") for i in range(6)]),
        *[page(f"https://www.gov.uk/p{i}", "www.gov.uk")
          for i in range(6)],
        page("https://slow.gov.uk/", "slow.gov.uk", status=429,
             transient=True),
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    seeds = ["https://www.gov.uk/", "https://slow.gov.uk/"]
    cfg_mem = CrawlConfig(root_urls=seeds, host_token_budget=2,
                          max_rounds=12)
    mem = run_crawl(corpus, seeds, cfg_mem, str(tmp_path / "tok_mem"),
                    use_ray=False)
    cfg_sto = CrawlConfig(root_urls=seeds, host_token_budget=2,
                          max_rounds=12, frontier_on_storage=True)
    eng = CrawlEngine(corpus, cfg_sto, str(tmp_path / "tok_sto"),
                      use_ray=True)
    try:
        res = eng.run(seeds)
        assert _order(res) == _order(mem)
        assert (res.crawl_order["seq"].to_pylist()
                == mem.crawl_order["seq"].to_pylist())
        st, sm = res.seen.to_table(), mem.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == \
            dict(zip(sm["digest"].to_pylist(),
                     sm["status"].to_pylist()))
        assert any(m["deferred"] > 0 for m in res.metrics)
        for key in ("deferred", "fetched", "requeued"):
            assert ([m[key] for m in res.metrics]
                    == [m[key] for m in mem.metrics]), key
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_storage_frontier_parity_medium(tmp_path):
    """Storage rounds at multi-part scale: enough winners per round that
    every shard writes parts and the rank exchange crosses partition
    boundaries; order/seen goldens must still match the oracle."""
    fx = generate_corpus(1500, 11)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), crawler_threads=4,
                      fetch_batch_size=128,  # force many parts/chunks
                      frontier_on_storage=True)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "sto_med"),
                      use_ray=True)
    try:
        res = eng.run(fx.seeds)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_seed_priorities_order_storage(tmp_path):
    """Seed priorities in frontier-on-storage mode: the driver renumbers
    the prioritized rows into the reserved negative-seq range, so every
    seq-ordered consumer (budget thresholds, replay, rank exchange,
    order assembly) processes them first with no new ordering key.
    Full parity (order, seen, mirror) against the oracle, including a
    transient-5xx seed whose priority survives the requeue into a
    round that already has storage parts."""
    fx = generate_corpus(60, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True)
    # seeds = ROOT_URLS + the flaky (transient-5xx) conformance seed:
    # prioritize example.com's root AND the flaky seed (requeue carrier)
    pr = [0] * len(fx.seeds)
    pr[2] = 5
    pr[-1] = 3
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg, seed_priorities=pr)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "prio_sto"),
                      use_ray=True)
    try:
        res = eng.run(fx.seeds, seed_priorities=pr)
        order = _order(res)
        assert order == [(r, u) for r, _, u in oracle.crawl_order]
        assert order[0][1] == "https://example.com/"
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_resume_storage_checkpoint_with_empty_parts(tmp_path):
    """A storage round can checkpoint ZERO frontier parts while its
    driver rows are non-empty (requeue-only retry-tail round: seed 11's
    round 4).  Resuming such a checkpoint through run() with the AUTO
    config must detect storage mode from the manifest KEY, not the part
    list's truthiness — the in-memory fallback would silently drop
    every storage round from crawl_order."""
    import json
    import os

    fx = generate_corpus(60, 11)
    cfg_full = CrawlConfig(root_urls=list(ROOT_URLS),
                           frontier_on_storage=True, checkpoint_every=1)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg_full)
    out = str(tmp_path / "sto_empty_parts")
    cfg_cut = CrawlConfig(root_urls=list(ROOT_URLS),
                          frontier_on_storage=True, checkpoint_every=1,
                          max_rounds=5)
    eng = CrawlEngine(fx.corpus, cfg_cut, out, use_ray=True)
    eng.run(fx.seeds)
    eng.shutdown()
    with open(os.path.join(out, "round=4", "manifest.json")) as f:
        man = json.load(f)
    assert man["frontier_parts"] == []  # the precondition under test
    # resume with the AUTO default: mode must come from the manifest
    cfg_auto = CrawlConfig(root_urls=list(ROOT_URLS), checkpoint_every=1)
    assert cfg_auto.frontier_on_storage is None
    eng2 = CrawlEngine(fx.corpus, cfg_auto, out, use_ray=True)
    try:
        res = eng2.run(fx.seeds, resume=True)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
    finally:
        eng2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_priority_seed_respects_429_backoff_storage(tmp_path):
    """A PRIORITIZED seed whose host is 429-backed-off must still be
    deferred in storage mode: priority rows carry negative seqs
    (renumbered by _apply_priorities before the budget gate), so the
    zero-availability threshold sentinel must sit below every possible
    seq — a -1 sentinel would wrongly admit them.  Round-for-round
    metric parity against the in-memory gate is the spec."""
    import pyarrow as pa

    from govuk_crawler_worker_ray.schemas import CORPUS_SCHEMA

    def page(url, host, status=200, spans=None, transient=False):
        spans = spans or [{"kind": "text", "text": "body",
                           "media_ref": "", "offset": 0}]
        return dict(url=url, host=host, status_code=status,
                    content_type="text/html; charset=utf-8", spans=spans,
                    body="<p>body</p>", redirect_location=None,
                    transient=transient)

    link = lambda u: {"kind": "link", "text": "l", "media_ref": u,  # noqa
                      "offset": 0}
    rows = [
        page("https://www.gov.uk/", "www.gov.uk",
             spans=[link(f"https://www.gov.uk/p{i}") for i in range(6)]),
        *[page(f"https://www.gov.uk/p{i}", "www.gov.uk")
          for i in range(6)],
        page("https://slow.gov.uk/", "slow.gov.uk", status=429,
             transient=True),
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    seeds = ["https://www.gov.uk/", "https://slow.gov.uk/"]
    pr = [0, 5]  # the 429 seed is the prioritized one
    cfg_mem = CrawlConfig(root_urls=seeds, host_token_budget=2,
                          max_rounds=12)
    mem = run_crawl(corpus, seeds, cfg_mem, str(tmp_path / "pb_mem"),
                    use_ray=False, seed_priorities=pr)
    cfg_sto = CrawlConfig(root_urls=seeds, host_token_budget=2,
                          max_rounds=12, frontier_on_storage=True)
    eng = CrawlEngine(corpus, cfg_sto, str(tmp_path / "pb_sto"),
                      use_ray=True)
    try:
        res = eng.run(seeds, seed_priorities=pr)
        assert _order(res) == _order(mem)
        for key in ("deferred", "fetched", "requeued"):
            assert ([m[key] for m in res.metrics]
                    == [m[key] for m in mem.metrics]), key
        st, sm = res.seen.to_table(), mem.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == \
            dict(zip(sm["digest"].to_pylist(),
                     sm["status"].to_pylist()))
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_seed_priorities_storage_uniform_goldens(fixture, tmp_path):
    """All-zero priorities leave the storage path bit-identical (the
    renumber is skipped): seq values still match the oracle exactly."""
    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True)
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "prio_uni"),
                      use_ray=True)
    try:
        res = eng.run(fx.seeds, seed_priorities=[0] * len(fx.seeds))
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_auto_storage_switch_parity(fixture, tmp_path):
    """frontier_on_storage=None (the default) hands off to storage
    rounds mid-crawl once a round's frontier exceeds
    storage_auto_threshold: goldens stay bit-identical to the oracle,
    and the later rounds really do run on storage (manifest carries
    frontier part paths)."""
    import json
    import os

    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS),
                      storage_auto_threshold=10)
    assert cfg.frontier_on_storage is None
    out = str(tmp_path / "auto_sw")
    eng = CrawlEngine(fx.corpus, cfg, out, use_ray=True)
    try:
        res = eng.run(fx.seeds)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
        st = res.seen.to_table()
        assert dict(zip(st["digest"].to_pylist(),
                        st["status"].to_pylist())) == oracle.seen
        switched = False
        for d in os.listdir(out):
            mp = os.path.join(out, d, "manifest.json")
            if d.startswith("round=") and os.path.exists(mp):
                with open(mp) as f:
                    if json.load(f).get("frontier_parts"):
                        switched = True
        assert switched, "crawl never handed off to storage rounds"
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_auto_storage_switch_resume(fixture, tmp_path):
    """A crawl interrupted AFTER the auto hand-off resumes down the
    storage path (the checkpoint's frontier parts route the resume) and
    completes with oracle-identical order."""
    fx, _, oracle = fixture
    out = str(tmp_path / "auto_res")
    cfg_short = CrawlConfig(root_urls=list(ROOT_URLS),
                            storage_auto_threshold=10, max_rounds=3)
    eng = CrawlEngine(fx.corpus, cfg_short, out, use_ray=True)
    eng.run(fx.seeds)
    eng.shutdown()
    cfg = CrawlConfig(root_urls=list(ROOT_URLS),
                      storage_auto_threshold=10)
    eng2 = CrawlEngine(fx.corpus, cfg, out, use_ray=True)
    try:
        res = eng2.run(fx.seeds, resume=True)
        assert [(r, s, u) for r, s, u in zip(
            res.crawl_order["round"].to_pylist(),
            res.crawl_order["seq"].to_pylist(),
            res.crawl_order["url"].to_pylist())] == oracle.crawl_order
    finally:
        eng2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_mirror_compaction_roundtrip(fixture, tmp_path):
    """cfg.compact_fetched_rows: the opt-in post-pass coalesces each
    round's per-chunk fetched parts into <=1 file at test scale, and
    every read-back built on those files — mirror last-write-wins and
    the storage order assembly — is unchanged."""
    import os

    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True,
                      compact_fetched_rows=1 << 20)
    out = str(tmp_path / "compact")
    eng = CrawlEngine(fx.corpus, cfg, out, use_ray=True)
    try:
        res = eng.run(fx.seeds)
        for d in os.listdir(out):
            fdir = os.path.join(out, d, "fetched")
            if d.startswith("round=") and os.path.isdir(fdir):
                n = len([f for f in os.listdir(fdir)
                         if f.endswith(".parquet")])
                assert n <= 1, f"{d}: {n} files after compaction"
        # order read-back from the COMPACTED files
        order2 = eng._order_from_storage(range(res.rounds))
        assert [(r, s, u) for r, s, u in zip(
            order2["round"].to_pylist(), order2["seq"].to_pylist(),
            order2["url"].to_pylist())] == oracle.crawl_order
        mt = res.mirror_table()
        eng_m = {p: (u, b) for p, u, b in zip(
            mt["mirror_path"].to_pylist(), mt["url"].to_pylist(),
            mt["body"].to_pylist())}
        assert eng_m == oracle.mirror
    finally:
        eng.shutdown()


def test_auto_threshold_guard_without_handoff(tmp_path):
    """When the AUTO frontier outgrows storage_auto_threshold but the
    storage hand-off is unavailable (local engine), the crawl fails
    loudly instead of growing the driver-bounded frontier silently."""
    fx = generate_corpus(60, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), storage_auto_threshold=1)
    with pytest.raises(RuntimeError, match="storage_auto_threshold"):
        run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "guard"),
                  use_ray=False)


def test_compact_recovers_from_crash_leftovers(tmp_path):
    """_compact_part_dir's rename swap is self-healing on re-run: a
    stale fetched.old next to a live dir is cleared, and a crash
    BETWEEN the two renames (only fetched.old exists) restores the data
    before compacting — either leftover previously made every later
    compaction of that round raise ENOTEMPTY or skip the round."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from govuk_crawler_worker_ray.pipelines.sink import (
        compact_crawl_rounds,
    )

    def write_round(k: int, vals):
        fdir = tmp_path / f"round={k}" / "fetched"
        fdir.mkdir(parents=True)
        for i, v in enumerate(vals):
            pq.write_table(pa.table({"x": pa.array(v, pa.int64())}),
                           str(fdir / f"part-{i:03d}.parquet"))
        return fdir

    # round 0: stale .old alongside the live dir (crash after the live
    # rename); the live dir is authoritative
    f0 = write_round(0, [[1, 2], [3]])
    shutil.copytree(str(f0), str(f0) + ".old")
    # round 1: only .old (crash between the renames)
    f1 = write_round(1, [[4], [5, 6]])
    os.rename(str(f1), str(f1) + ".old")
    out = compact_crawl_rounds(str(tmp_path), rows_per_file=1 << 20,
                               use_ray=False)
    assert out == {0: 1, 1: 1}
    for fdir, want in ((f0, [1, 2, 3]), (f1, [4, 5, 6])):
        assert not os.path.exists(str(fdir) + ".old")
        files = sorted(os.listdir(str(fdir)))
        assert len(files) == 1
        got = pq.read_table(str(fdir / files[0]))["x"].to_pylist()
        assert got == want


@pytest.mark.usefixtures("ray_session")
def test_readers_selfheal_after_compaction_crash(fixture, tmp_path):
    """A compaction crash between _compact_part_dir's two renames
    leaves a completed round's parts under fetched.old ONLY.  The
    readers that enumerate rounds (storage order assembly,
    mirror_table) previously ran BEFORE _maybe_compact's self-heal on
    resume and silently dropped that round's rows; they now restore
    the crashed swap first (sink.restore_crashed_rounds)."""
    import os

    fx, _, oracle = fixture
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), frontier_on_storage=True)
    out = str(tmp_path / "crash")
    eng = CrawlEngine(fx.corpus, cfg, out, use_ray=True)
    try:
        res = eng.run(fx.seeds)
        # simulate the crash state on a mid-crawl round: data intact
        # under .old, live dir gone, stale tmp from the dead compactor
        victim = os.path.join(out, "round=1", "fetched")
        assert os.path.isdir(victim)
        os.rename(victim, victim + ".old")
        os.makedirs(victim + ".compact", exist_ok=True)

        order2 = eng._order_from_storage(range(res.rounds))
        assert [(r, u) for r, u in zip(
            order2["round"].to_pylist(),
            order2["url"].to_pylist())] == [
                (r, u) for r, _, u in oracle.crawl_order]

        # crash it again for the mirror read-back
        os.rename(victim, victim + ".old")
        mt = res.mirror_table()
        eng_m = {p: (u, b) for p, u, b in zip(
            mt["mirror_path"].to_pylist(), mt["url"].to_pylist(),
            mt["body"].to_pylist())}
        assert eng_m == oracle.mirror
    finally:
        eng.shutdown()
