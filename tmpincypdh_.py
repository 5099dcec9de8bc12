
import multiprocessing as mp, time, sys, json, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def setup():
    global STAGE, FR, CFG, ALLOWED
    import pyarrow.parquet as pq, pyarrow as pa, numpy as np
    from govuk_crawler_worker_ray.config import CrawlConfig
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS
    from govuk_crawler_worker_ray.stages.fetch import CorpusIndex, FetchStage
    from govuk_crawler_worker_ray.state.seen_set import SeenSet
    from govuk_crawler_worker_ray.pipelines.crawl import _allowed_hosts
    from govuk_crawler_worker_ray.functions.urls import (
        digest_hex_batch, netloc_host, parse_url)
    corpus = pq.read_table(sys.argv[2])
    CFG = CrawlConfig(root_urls=list(ROOT_URLS))
    STAGE = FetchStage(CorpusIndex(corpus), CFG,
                       SeenSet.local(8, CFG.ttl_expire_seconds))
    ALLOWED = _allowed_hosts(CFG)
    lo = min(100000, corpus.num_rows - 4096)
    urls = corpus["url"].to_pylist()[lo:lo + 4096]
    digs = digest_hex_batch(urls, CFG.digest)
    FR = pa.table({
        "discovered_seq": pa.array(np.arange(len(urls)), pa.int64()),
        "url": pa.array(urls),
        "host": pa.array([netloc_host(parse_url(u).netloc) for u in urls]),
        "url_digest": pa.array(digs),
        "attempt": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
        "priority": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
        "crawl_count": pa.array(np.zeros(len(urls)), pa.int64())})

def work(wid, dur=6.0):
    import pyarrow.compute as pc, pyarrow.parquet as pq
    from govuk_crawler_worker_ray.stages.publish import (
        extract_candidates_batch, derive_fetch_events)
    out = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < dur:
        f = STAGE(FR, now=0.0)
        pq.write_table(f, f"{out}/gcw_probe_{os.getpid()}.parquet")
        html = f.filter(pc.and_(pc.equal(f["outcome"], "fetched"),
                                pc.equal(f["content_type"], "text/html")))
        extract_candidates_batch(
            html.select(["url", "discovered_seq", "spans"]), CFG, ALLOWED)
        derive_fetch_events(f.select(
            ["url", "host", "url_digest", "discovered_seq", "attempt",
             "priority", "outcome"]))
        n += 1
    return n

def warm(_):
    work(0, dur=0.5)
    return os.getpid()

if __name__ == "__main__":
    k = int(sys.argv[1])
    with mp.Pool(k, initializer=setup) as p:
        p.map(warm, range(k * 4))  # barrier: init + warm every worker
        t0 = time.perf_counter()
        tot = sum(p.map(work, range(k)))
        print(json.dumps({"rate": tot / (time.perf_counter() - t0)}))
