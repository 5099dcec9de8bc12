"""CLI entry point — the engine's equivalent of the reference binary
(/root/reference/main.go): configuration via the SAME env-var names and
defaults, then a crawl run.

    python -m govuk_crawler_worker_ray.cli \
        --corpus /path/corpus.parquet --out /tmp/crawl_out [--resume]

Env vars honored (main.go:22-38 parity): ROOT_URLS, BLACKLIST_PATHS,
CRAWLER_THREADS, MAX_CRAWL_RETRIES, TTL_EXPIRE_TIME, MIRROR_ROOT.
This is the ONE library surface that owns a Ray session (guarded).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .config import (
    DEFAULT_BLACKLIST,
    DEFAULT_ROOT_URLS,
    CrawlConfig,
    parse_duration,
    split_paths,
    split_root_urls,
)


def config_from_env() -> CrawlConfig:
    env = os.environ
    return CrawlConfig(
        root_urls=split_root_urls(env.get("ROOT_URLS", DEFAULT_ROOT_URLS)),
        blacklist_paths=split_paths(env.get("BLACKLIST_PATHS",
                                            DEFAULT_BLACKLIST)),
        crawler_threads=int(env.get("CRAWLER_THREADS", "4")),
        max_crawl_retries=int(env.get("MAX_CRAWL_RETRIES", "4")),
        ttl_expire_seconds=parse_duration(env.get("TTL_EXPIRE_TIME", "12h")),
        mirror_root=env.get("MIRROR_ROOT") or None,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True,
                    help="corpus parquet (the synthetic origin)")
    ap.add_argument("--seeds", default=None,
                    help="seeds parquet (default: ROOT_URLS)")
    ap.add_argument("--out", required=True, help="checkpoint/output dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--frontier-on-storage", action="store_true",
                    help="storage-resident frontier rounds (the 10^10 "
                         "scale path; see config.frontier_on_storage)")
    ap.add_argument("--host-token-budget", type=int, default=None,
                    help="per-host politeness fetch tokens per round "
                         "with 429 back-off (engine addition)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--healthcheck-port", type=int, default=None,
                    help="serve GET /healthcheck on 127.0.0.1:<port> "
                         "during the crawl (main.go:147-151 parity)")
    args = ap.parse_args(argv)

    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.crawl import CrawlEngine
        from .pipelines.mirror import export_mirror_tree

        cfg = config_from_env()
        if args.max_rounds:
            cfg.max_rounds = args.max_rounds
        if args.frontier_on_storage:
            cfg.frontier_on_storage = True
        if args.host_token_budget is not None:
            cfg.host_token_budget = args.host_token_budget
        corpus = pq.read_table(args.corpus)
        if args.seeds:
            seeds = pq.read_table(args.seeds)["url"].to_pylist()
        else:
            seeds = cfg.root_urls
        eng = CrawlEngine(corpus, cfg, args.out, use_ray=True,
                          small_round_threshold=256)
        hc = None
        if args.healthcheck_port:
            from .healthcheck import start_healthcheck_server

            hc = start_healthcheck_server(eng, args.healthcheck_port)
        res = eng.run(seeds, resume=args.resume)
        if hc is not None:
            hc.shutdown()
        summary = {
            "rounds": res.rounds,
            "fetched": sum(m["fetched"] for m in res.metrics),
            "published": sum(m["published"] for m in res.metrics),
            "out_dir": res.out_dir,
        }
        if cfg.mirror_root:
            summary["mirror_files"] = export_mirror_tree(res,
                                                         cfg.mirror_root)
        eng.shutdown()
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
