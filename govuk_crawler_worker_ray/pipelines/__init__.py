"""End-user pipelines: the frontier-superstep crawl loop plus the
training-data operators (dedup, similarity, text analysis, multimodal).
"""
