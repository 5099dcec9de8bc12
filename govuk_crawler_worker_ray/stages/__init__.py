"""Ray Data stages: batch transforms (map_batches bodies) and the
stateful actor-pool classes composing the crawl pipeline (SURVEY.md §2.1).
All stages are plain callables over Arrow batches so they run identically
inside Ray Data or on the driver's small-round fast path.
"""
