"""Mirror-tree export, health aggregation, and TTL-driven recrawl."""

import os

from govuk_crawler_worker_ray.config import CrawlConfig
from govuk_crawler_worker_ray.corpusgen import ROOT_URLS, generate_corpus
from govuk_crawler_worker_ray.pipelines.crawl import CrawlEngine, run_crawl
from govuk_crawler_worker_ray.pipelines.mirror import (
    engine_health,
    export_mirror_tree,
)


def test_export_mirror_tree(tmp_path):
    fx = generate_corpus(80, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "out"),
                    use_ray=False)
    root = str(tmp_path / "mirror")
    n = export_mirror_tree(res, root)
    assert n == res.mirror_table().num_rows > 0
    # the root page lands as <host>/index.html with its body
    idx = os.path.join(root, "www.gov.uk", "index.html")
    assert os.path.exists(idx)
    assert (os.stat(idx).st_mode & 0o777) == 0o644
    body = open(idx).read()
    assert body.startswith("<!DOCTYPE html>")


def test_ttl_recrawl(tmp_path):
    """After TTL expiry the seen set forgets Enqueued marks: a second
    crawl with the SAME engine re-fetches everything (the 12h re-crawl
    loop the TTL exists for — main.go:35)."""
    fx = generate_corpus(60, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "a"), use_ray=False)
    r1 = eng.run(fx.seeds, now=0.0)
    n1 = r1.crawl_order.num_rows
    # immediately again: everything still Enqueued => only seeds refetch
    eng.out_dir = str(tmp_path / "b")
    r2 = eng.run(fx.seeds, now=1.0)
    assert r2.crawl_order.num_rows < n1
    # after TTL expiry: full recrawl
    eng.out_dir = str(tmp_path / "c")
    r3 = eng.run(fx.seeds, now=cfg.ttl_expire_seconds + 2.0)
    assert r3.crawl_order.num_rows == n1


def test_engine_health(tmp_path):
    fx = generate_corpus(40, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "h"), use_ray=False)
    assert engine_health(eng) == "ok"


def test_cli_subprocess(tmp_path):
    """The CLI binary surface end-to-end in a fresh process (owns its Ray
    session; env-var config parity with main.go)."""
    import json
    import subprocess
    import sys

    from govuk_crawler_worker_ray.corpusgen import write_fixture

    d = write_fixture(str(tmp_path / "fx"), n_pages=60, seed=7,
                      goldens=False)
    out = subprocess.run(
        [sys.executable, "-m", "govuk_crawler_worker_ray.cli",
         "--corpus", f"{d}/corpus.parquet", "--seeds", f"{d}/seeds.parquet",
         "--out", str(tmp_path / "out"), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "MIRROR_ROOT": str(tmp_path / "m"),
             "CRAWLER_THREADS": "2"},
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 0 and summary["mirror_files"] > 0


def test_mid_crawl_ttl_expiry(tmp_path):
    """With a TTL shorter than the crawl, Enqueued marks expire MID-crawl
    and URLs are re-published and re-fetched; engine rounds advance the
    logical clock (seconds_per_round) exactly like the oracle."""
    fx = generate_corpus(80, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), ttl_expire_seconds=3.0,
                      seconds_per_round=1.0, max_rounds=9)
    from govuk_crawler_worker_ray.reference_oracle import crawl_oracle

    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "ttl"),
                    use_ray=False)
    eng_order = list(zip(res.crawl_order["round"].to_pylist(),
                         res.crawl_order["url"].to_pylist()))
    assert eng_order == [(r, u) for r, _, u in oracle.crawl_order]
    # expiry must actually bite: some URL fetched in 2+ distinct rounds
    from collections import Counter

    per_url = Counter(u for _, u in eng_order)
    assert max(per_url.values()) >= 2

    # frozen-time control: same corpus, long TTL -> strictly fewer
    # refetches
    cfg2 = CrawlConfig(root_urls=list(ROOT_URLS), max_rounds=9)
    res2 = run_crawl(fx.corpus, fx.seeds, cfg2, str(tmp_path / "frozen"),
                     use_ray=False)
    assert res2.crawl_order.num_rows <= res.crawl_order.num_rows


def test_healthcheck_http_endpoint(tmp_path):
    """GET /healthcheck parity (main.go:147-151): JSON, worst status
    wins, 200 when healthy."""
    import json
    import urllib.request

    from govuk_crawler_worker_ray.healthcheck import (
        start_healthcheck_server,
    )

    fx = generate_corpus(40, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    eng = CrawlEngine(fx.corpus, cfg, str(tmp_path / "hc"), use_ray=False)
    srv = start_healthcheck_server(eng, port=18763)
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:18763/healthcheck", timeout=10) as r:
            assert r.status == 200
            payload = json.loads(r.read())
        assert payload["status"] == "ok"
        assert payload["checks"]["seen_set"] == "ok"
        # unknown path -> 404
        import urllib.error
        try:
            urllib.request.urlopen("http://127.0.0.1:18763/nope",
                                   timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
