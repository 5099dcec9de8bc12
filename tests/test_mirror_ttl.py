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
