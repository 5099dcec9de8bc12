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
