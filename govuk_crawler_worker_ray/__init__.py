"""govuk_crawler_worker_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch rebuild of the *capabilities* of alphagov/govuk_crawler_worker
(reference at /root/reference, Go) on top of ray.data.Dataset:

- per-record URL/HTML/content-type operators -> vectorized ``map_batches``
  functions over zero-copy Arrow batches (``functions/``);
- the Redis TTL'd URL-seen set -> sharded stateful Ray actors with a bloom
  pre-filter + cuckoo filter (``state/``);
- the queue-driven crawl loop -> a round-based (BSP) frontier superstep
  pipeline with per-round checkpoints, politeness budgets and metrics
  (``pipelines/crawl.py``);
- plus the large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) the north rule mandates
  (``pipelines/``).

Nothing here calls ``ray.init()``; sessions are owned by the caller
(bench.py, the test fixture, or the driver).
"""

__version__ = "0.1.0"

__all__ = [
    "CrawlConfig", "CrawlEngine", "run_crawl", "SeenSet",
    "generate_corpus", "write_fixture", "crawl_oracle",
]


def __getattr__(name):  # lazy: keep bare import light
    if name in ("CrawlEngine", "run_crawl"):
        from .pipelines import crawl as _c

        return getattr(_c, name)
    if name == "CrawlConfig":
        from .config import CrawlConfig

        return CrawlConfig
    if name == "SeenSet":
        from .state.seen_set import SeenSet

        return SeenSet
    if name in ("generate_corpus", "write_fixture"):
        from . import corpusgen as _g

        return getattr(_g, name)
    if name == "crawl_oracle":
        from .reference_oracle import crawl_oracle

        return crawl_oracle
    raise AttributeError(name)
