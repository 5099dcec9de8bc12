"""Tests for the training-data pipelines (dedup, similarity, text
analysis, multimodal plumbing) and robots.txt support."""

import numpy as np
import pyarrow as pa
import pytest

from govuk_crawler_worker_ray.state.robots import parse_robots


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs to the hills",
        "the quick brown fox jumps over the lazy dog and runs to the hill",
        "completely different content about der die und das ist in german",
        "el gato que vive en la casa de los vecinos es muy bonito",
        "一些中文内容在这里出现了",
        "the quick brown fox jumps over the lazy dog and runs to the hills",
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en", "de", "es", "zh", "en"], pa.string()),
    })


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_exact_dedup(docs_ds):
    from govuk_crawler_worker_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 5  # 6 docs, one exact dup pair
    dup_row = out[out["n_dups"] == 2]
    assert len(dup_row) == 1
    assert dup_row["doc_id"].iloc[0] == 0  # min doc_id kept


def test_minhash_neardup(docs_ds):
    from govuk_crawler_worker_ray.pipelines.dedup import (
        connected_components,
        minhash_lsh_dedup,
    )

    pairs = minhash_lsh_dedup(docs_ds, threshold=0.5)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    # docs 0/1 near-dup (one word), 0/5 exact, 1/5 near
    assert (0, 5) in got and (0, 1) in got and (1, 5) in got
    assert all(a in (0, 1, 5) and b in (0, 1, 5) for a, b in got)
    comp = connected_components(pairs)
    cd = dict(zip(comp["doc_id"].to_pylist(),
                  comp["component"].to_pylist()))
    assert cd[0] == cd[1] == cd[5] == 0


def test_minhash_scalar_twin_matches_engine(docs_ds):
    """The pure-Python scalar twin (goldens.py — the oracle for
    minhash_neardup / neardup_components) must match the engine's
    vectorized numpy path bit-for-bit: same pairs, same float jaccard,
    same components."""
    from govuk_crawler_worker_ray.goldens import (
        minhash_pairs_scalar,
        neardup_components_scalar,
    )
    from govuk_crawler_worker_ray.pipelines.dedup import (
        connected_components,
        minhash_lsh_dedup,
    )

    t = _docs_table()
    for thr in (0.5, 0.8):
        eng = minhash_lsh_dedup(docs_ds, threshold=thr)
        twin = minhash_pairs_scalar(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist(), threshold=thr)
        assert eng.to_pydict() == twin.to_pydict()
        assert (connected_components(eng).to_pydict()
                == neardup_components_scalar(twin).to_pydict())


def test_minhash_distributed_equals_broadcast(docs_ds):
    """The join shape (no driver collection; ROADMAP #3) must produce
    the exact pair set of the broadcast shape."""
    from govuk_crawler_worker_ray.pipelines.dedup import minhash_lsh_dedup

    small = minhash_lsh_dedup(docs_ds, threshold=0.5, distributed=False)
    big = minhash_lsh_dedup(docs_ds, threshold=0.5, distributed=True)
    assert small.to_pydict() == big.to_pydict()
    auto = minhash_lsh_dedup(docs_ds, threshold=0.5, broadcast_limit=0)
    assert auto.to_pydict() == small.to_pydict()


def test_ngram_jaccard_matches_bruteforce(docs_ds):
    """Prefix-filter SSJoin must equal the all-pairs twin exactly —
    pair set AND float jaccard values (both are quotients of the same
    exact integers)."""
    from govuk_crawler_worker_ray.pipelines.dedup import (
        ngram_jaccard_bruteforce,
        ngram_jaccard_dedup,
    )

    texts = {r["doc_id"]: r["text"]
             for r in _docs_table().to_pylist()}
    for mode in ("prefix", "dense", "bucketed"):
        for t in (0.3, 0.5, 0.9):
            out = ngram_jaccard_dedup(docs_ds, threshold=t, n=3,
                                      mode=mode)
            got = list(zip(out["doc_a"].to_pylist(),
                           out["doc_b"].to_pylist(),
                           out["jaccard"].to_pylist()))
            assert got == ngram_jaccard_bruteforce(texts, t, 3), mode
    # exact dup pair scores exactly 1.0 at any threshold
    out = ngram_jaccard_dedup(docs_ds, threshold=0.999, n=3)
    pairs = set(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist()))
    assert pairs == {(0, 5)}
    assert out["jaccard"].to_pylist() == [1.0]


def test_ngram_prefix_filter_complete():
    """The prefix-filter theorem the SSJoin rests on: for ANY pair with
    J >= t, the two df-ordered prefixes (length |A| - ceil(t|A|) + 1)
    share at least one gram.  Randomized over mutated strings (high
    true-pair density) — a miss here would silently drop pairs."""
    import random

    from govuk_crawler_worker_ray.pipelines.dedup import _gram_ids

    rng = random.Random(42)
    alphabet = "abcdefgh "
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(3, 60)))
            for _ in range(12)]
    texts = list(base)
    for b in base:  # mutated near-dups
        i = rng.randrange(max(len(b), 1))
        texts.append(b[:i] + rng.choice(alphabet) + b[i:])
        texts.append(b + rng.choice(alphabet))
    grams = [_gram_ids(t, 3) for t in texts]
    # global df over distinct grams
    df: dict = {}
    for g in grams:
        for x in g.tolist():
            df[x] = df.get(x, 0) + 1
    for t in (0.3, 0.6, 0.9):
        prefixes = []
        for g in grams:
            sz = len(g)
            if sz == 0:
                prefixes.append(set())
                continue
            p = sz - int(np.ceil(t * sz)) + 1
            ordered = sorted(g.tolist(), key=lambda x: (df[x], x))
            prefixes.append(set(ordered[:p]))
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                a, b = set(grams[i].tolist()), set(grams[j].tolist())
                if not a or not b:
                    continue
                jac = len(a & b) / len(a | b)
                if jac >= t:
                    assert prefixes[i] & prefixes[j], (
                        f"qualifying pair ({i},{j}) J={jac:.3f} at t={t} "
                        "shares no prefix gram")


def test_simhash_close_for_neardups(docs_ds):
    from govuk_crawler_worker_ray.pipelines.dedup import simhash_signatures

    out = simhash_signatures(docs_ds).to_pandas()
    sig = {r.doc_id: int(r.simhash, 16) for r in out.itertuples()}
    assert sig[0] == sig[5]  # identical text => identical signature
    ham01 = bin(sig[0] ^ sig[1]).count("1")
    ham02 = bin(sig[0] ^ sig[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def test_lang_id(docs_ds):
    from govuk_crawler_worker_ray.pipelines.text_analysis import lang_id

    out = lang_id(docs_ds).to_pandas().sort_values("doc_id")
    assert list(out["pred_lang"]) == ["en", "en", "de", "es", "zh", "en"]


def test_knn_and_lsh(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        knn_bruteforce,
        lsh_knn,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 16)).astype(np.float32)
    base[7] = base[0] * 1.1  # near-dup of row 0
    tbl = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    q = base[0].astype(np.float64)
    exact = knn_bruteforce(ds, q, k=5)
    assert exact["vec_id"].to_pylist()[0] == 0  # itself first
    assert exact["vec_id"].to_pylist()[1] == 7  # scaled copy second
    approx = lsh_knn(ds, q, k=5)
    # LSH must find the same top hit (same bucket by construction)
    assert approx["vec_id"].to_pylist()[0] == 0
    assert 7 in approx["vec_id"].to_pylist()


def test_media_kind_block_invariant(docs_ds):
    """synthesize_media_batch must derive kind from the ROW (seed byte),
    never the batch-local index: output must not change when the
    executor re-blocks the input."""
    from govuk_crawler_worker_ray.pipelines.multimodal import media_features

    base = (media_features(docs_ds, decoder="fake").to_pandas()
            .sort_values("media_id").reset_index(drop=True))
    reblocked = (media_features(docs_ds.repartition(5), decoder="fake")
                 .to_pandas().sort_values("media_id")
                 .reset_index(drop=True))
    assert base.equals(reblocked)


def test_kmv_sketch(ray_session):
    """KMV estimate is close to truth, exact under k, and invariant to
    how the input is blocked (mergeability)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sketches import kmv_distinct

    n = 2000
    t = pa.table({
        "event_type": pa.array(["a"] * n + ["b"] * 40, pa.string()),
        "user_id": pa.array([i % 700 for i in range(n)]
                            + [i % 10 for i in range(40)], pa.int64()),
    })
    for blocks in (1, 7):
        out = (kmv_distinct(rd.from_arrow(t).repartition(blocks), k=256)
               .to_pandas().set_index("event_type")["est_distinct"])
        assert out["b"] == 10  # n < k: exact
        assert abs(out["a"] - 700) / 700 < 0.2  # k=256 => ~6.3% stderr
        if blocks == 1:
            first = dict(out)
        else:
            assert dict(out) == first  # block-layout invariant


def test_sampled_quantiles(ray_session):
    """rate=1 keeps every row, so the sampled quantiles ARE the exact
    value_quantiles; at rate<1 the estimate lands within the sample's
    rank-error band of truth; block layout does not change the result
    (the md5 predicate is per-row)."""
    import numpy as np
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        value_quantiles,
    )
    from govuk_crawler_worker_ray.pipelines.sketches import (
        sampled_quantiles,
    )

    n = 4000
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(["a"] * (n // 2) + ["b"] * (n // 2),
                               pa.string()),
        "value": pa.array(
            [((i * 37) % 1000) / 10 for i in range(n)], pa.float64()),
    })
    exact = (value_quantiles(rd.from_arrow(t)).to_pandas()
             .set_index("event_type").sort_index())
    full = (sampled_quantiles(rd.from_arrow(t), rate=1.0).to_pandas()
            .set_index("event_type").sort_index())
    assert full.equals(exact)
    first = None
    for blocks in (1, 7):
        est = (sampled_quantiles(rd.from_arrow(t).repartition(blocks),
                                 rate=1 / 4).to_pandas()
               .set_index("event_type").sort_index())
        if first is None:
            first = est
        else:
            assert est.equals(first)  # block-layout invariant
    # ~500 sampled per group: q50 within a few rank-percent of truth
    rel = np.abs(first["q50_micros"] - exact["q50_micros"]) / 100_000_000
    assert (rel < 0.10).all()


def test_multimodal_plumbing(docs_ds):
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        MediaDecodeStage,
        media_features,
        video_frames,
    )

    feats = media_features(docs_ds, decoder="fake").to_pandas()
    assert len(feats) == 6
    assert set(feats.columns) >= {"media_id", "kind", "width", "height",
                                  "duration_ms", "mean_byte", "n_bytes"}
    assert (feats["n_bytes"] == 4096).all()
    frames = video_frames(docs_ds, num_frames=3).to_pandas()
    assert (frames.groupby("media_id").size() == 3).all()
    # real decoders are stubbed with a clear error
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(decoder="pil")


def test_robots_parsing():
    rules = parse_robots(
        "User-agent: *\nDisallow: /help\nDisallow: /topics/page-\n"
        "Allow: /topics/page-8\n")
    assert not rules.allowed("/help")
    assert not rules.allowed("/help/sub")
    assert not rules.allowed("/topics/page-3")
    assert rules.allowed("/topics/page-8")  # longest match wins
    assert rules.allowed("/guidance/x")
    # UA-specific group overrides *
    ua = parse_robots(
        "User-agent: GOV.UK Crawler Worker\nDisallow: /browse\n\n"
        "User-agent: *\nDisallow: /\n")
    assert not ua.allowed("/browse/x")
    assert ua.allowed("/other")


def test_crawl_with_robots(tmp_path):
    from govuk_crawler_worker_ray.config import CrawlConfig
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS, generate_corpus
    from govuk_crawler_worker_ray.pipelines.crawl import run_crawl
    from govuk_crawler_worker_ray.reference_oracle import crawl_oracle

    fx = generate_corpus(150, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS), respect_robots=True)
    oracle = crawl_oracle(fx.index(), fx.seeds, cfg)
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "robots"),
                    use_ray=False)
    eng_order = list(zip(res.crawl_order["round"].to_pylist(),
                         res.crawl_order["url"].to_pylist()))
    assert eng_order == [(r, u) for r, _, u in oracle.crawl_order]
    assert sum(m["robots_excluded"] for m in res.metrics) > 0
    # nothing under /help on gov.uk was fetched
    assert not any(u.startswith("https://www.gov.uk/help")
                   for _, u in eng_order)


def test_curate_crawl_output(ray_session, tmp_path):
    """Crawl -> curation handoff: one streaming pipeline over the crawl's
    own fetched partitions."""
    from govuk_crawler_worker_ray.config import CrawlConfig
    from govuk_crawler_worker_ray.corpusgen import ROOT_URLS, generate_corpus
    from govuk_crawler_worker_ray.pipelines.crawl import run_crawl
    from govuk_crawler_worker_ray.pipelines.curate import curate_crawl_output

    fx = generate_corpus(120, 42)
    cfg = CrawlConfig(root_urls=list(ROOT_URLS))
    res = run_crawl(fx.corpus, fx.seeds, cfg, str(tmp_path / "crawl"),
                    use_ray=False)
    dest, n = curate_crawl_output(str(tmp_path / "crawl"),
                                  str(tmp_path / "curated"),
                                  min_quality_points=0)
    assert n > 0
    import pyarrow.dataset as pads

    t = pads.dataset(dest, format="parquet").to_table()
    assert set(t.column_names) >= {"doc_id", "text", "quality_points",
                                   "pred_lang", "content_hash"}
    # dedup: all content hashes unique
    hashes = t["content_hash"].to_pylist()
    assert len(hashes) == len(set(hashes))
    # fewer curated docs than fetched html pages (dups + empties removed)
    assert n <= res.crawl_order.num_rows


def test_documents_source_roundtrip(ray_session, tmp_path):
    """Lance-gated document IO falls back to parquet with identical
    schema; .lance paths rewrite transparently."""
    import ray.data as rd

    from govuk_crawler_worker_ray.corpusgen import generate_corpus
    from govuk_crawler_worker_ray.sources import (
        read_documents,
        write_documents,
    )

    fx = generate_corpus(60, 42)
    ds = rd.from_arrow(fx.documents)
    written = write_documents(ds, str(tmp_path / "docs.lance"))
    assert written.endswith(".parquet")  # no lance wheel in container
    back = read_documents(written)
    t = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = fx.documents.to_pandas().sort_values("doc_id").reset_index(
        drop=True)
    assert list(t["doc_id"]) == list(orig["doc_id"])
    assert t["spans"].map(len).sum() == orig["spans"].map(len).sum()


def test_embedding_neardup_matches_bruteforce(ray_session):
    """LSH-bucketed near-dup pairing must produce EXACTLY the brute-force
    pair set on a planted-near-dup fixture (recall engineered ~1-1e-4 at
    threshold 0.95; precision exact via within-bucket cosine verify)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    dim, n_base = 32, 300
    base = rng.standard_normal((n_base, dim))
    rows = [base[i] for i in range(n_base)]
    planted = []
    for i in range(0, 60, 3):  # 20 planted near-dups of base rows
        dup = base[i] + 0.05 * rng.standard_normal(dim)
        planted.append((i, n_base + len(planted)))
        rows.append(dup)
    m = np.stack(rows)
    tbl = pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
    })
    # brute-force truth (float32 round-trip like the pipeline reads)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    s = mn @ mn.T
    ai, bj = np.nonzero(np.triu(s >= 0.95, k=1))
    truth = set(zip(ai.tolist(), bj.tolist()))
    assert len(truth) >= 15  # fixture actually planted qualifying pairs
    got = embedding_neardup_pairs(rd.from_arrow(tbl), threshold=0.95)
    pairs = set(zip(got["vec_a"].to_pylist(), got["vec_b"].to_pylist()))
    assert pairs == truth


def test_scalar_goldens_match_vectorized(docs_ds):
    """The pure-Python scalar twins (goldens.py, the oracle producers)
    must agree with the vectorized batch kernels on every doc."""
    from govuk_crawler_worker_ray.goldens import (
        fingerprint_scalar,
        simhash_scalar,
    )
    from govuk_crawler_worker_ray.pipelines.dedup import simhash_batch
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        fingerprint_batch,
    )

    tbl = _docs_table()
    sh = simhash_batch(tbl)["simhash"].to_pylist()
    fp = fingerprint_batch(tbl)["fingerprint"].to_pylist()
    for i, text in enumerate(tbl["text"].to_pylist()):
        assert sh[i] == f"{simhash_scalar(text):016x}"
        assert fp[i] == f"{fingerprint_scalar(text):016x}"
    # edge cases: empty text and unicode
    for text in ("", "  ", "héllo wörld 中文"):
        t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array([text], pa.string())})
        assert simhash_batch(t2)["simhash"].to_pylist()[0] == \
            f"{simhash_scalar(text):016x}"
        assert fingerprint_batch(t2)["fingerprint"].to_pylist()[0] == \
            f"{fingerprint_scalar(text):016x}"


def test_hashjoin_matches_broadcast(ray_session):
    """The native Dataset.join (hash-shuffle) variant must produce the
    same aggregate as the broadcast-join variant."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        revenue_by_nation,
        revenue_by_nation_hashjoin,
    )

    orders = pa.table({
        "o_custkey": pa.array([1, 2, 2, 3, 9], pa.int64()),
        "o_totalprice": pa.array([10.5, 20.25, 5.0, 7.75, 1.0],
                                 pa.float64()),
    })
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 1, 0], pa.int64()),
    })
    nat = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
    })
    a = (revenue_by_nation(rd.from_arrow(orders), cust, nat)
         .to_pandas().sort_values("n_name").reset_index(drop=True))
    b = (revenue_by_nation_hashjoin(rd.from_arrow(orders),
                                    rd.from_arrow(cust), nat,
                                    num_partitions=2)
         .to_pandas().sort_values("n_name").reset_index(drop=True))
    cols = ["n_name", "n_orders", "revenue_cents"]
    assert a[cols].values.tolist() == b[cols].values.tolist()
    # customer 9 has no dim row: inner join drops it in both variants
    assert a["n_orders"].sum() == 4


def test_connected_components_distributed(ray_session):
    """Min-label propagation over an edge Dataset must equal the
    driver union-find on a multi-component graph with a chain (tests
    multi-round convergence)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        connected_components,
        connected_components_distributed,
    )

    # chain 9-7-5-3-1 (diameter forces >1 round), pair (2,4), singleton
    # edge (10,12), plus a triangle 20-21-22
    pairs = pa.table({
        "doc_a": pa.array([7, 5, 3, 1, 2, 10, 20, 21, 20], pa.int64()),
        "doc_b": pa.array([9, 7, 5, 3, 4, 12, 21, 22, 22], pa.int64()),
    })
    want = connected_components(pairs)
    got = connected_components_distributed(rd.from_arrow(pairs))
    assert got.to_pydict() == want.to_pydict()
    comp = dict(zip(got["doc_id"].to_pylist(),
                    got["component"].to_pylist()))
    assert comp[9] == 1 and comp[4] == 2 and comp[22] == 20


def test_ivf_knn(ray_session, tmp_path):
    """IVF coarse-quantizer ANN: with nprobe == n_clusters it must
    equal brute force exactly; with nprobe < n_clusters it must find a
    planted near-dup and match the pure-Python scalar twin
    (the ann_ivf oracle golden) on a parquet round-trip."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from govuk_crawler_worker_ray.goldens import ann_ivf_scalar
    from govuk_crawler_worker_ray.pipelines.similarity import (
        ivf_knn,
        knn_bruteforce,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((400, 24)).astype(np.float32)
    base[37] = base[0] * 1.1  # planted near-dup of the query row
    tbl = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    q = base[0].astype(np.float64)
    full = ivf_knn(ds, q, k=8, n_clusters=16, nprobe=16)
    assert full.to_pydict() == knn_bruteforce(ds, q, k=8).to_pydict()
    approx = ivf_knn(ds, q, k=8, n_clusters=16, nprobe=4)
    got = approx["vec_id"].to_pylist()
    assert got[0] == 0 and 37 in got  # query row + planted near-dup
    # scalar-twin parity on the exact spec the oracle golden uses
    p = str(tmp_path / "emb.parquet")
    pq.write_table(tbl, p)
    twin = ann_ivf_scalar(p, k=10)
    eng = ivf_knn(rd.read_parquet(p), q, k=10).select(["vec_id", "rank"])
    assert eng.to_pydict() == twin.to_pydict()


def test_ivf_index_matches_scan(ray_session):
    """The persisted IVF layout (assign-once, centroid-sorted ranges)
    must return exactly what the per-query scan (ivf_knn) returns."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        IvfIndex,
        ivf_knn,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((350, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(350), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    idx = IvfIndex.build(ds)
    for qi in (0, 42, 199):
        q = base[qi].astype(np.float64)
        a = ivf_knn(ds, q, k=6)
        b = idx.query(q, k=6)
        assert a.to_pydict() == b.to_pydict()


def test_lsh_index_matches_scan(ray_session):
    """The persisted LSH bucket index must return exactly what the
    per-query scan (lsh_knn) returns — same probe set, scoring, and
    tiebreaks."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        LshIndex,
        lsh_knn,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((300, 24)).astype(np.float32)
    base[11] = base[2] * 0.9  # planted near-dup
    tbl = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    idx = LshIndex.build(ds)
    for qi in (2, 50, 123):
        q = base[qi].astype(np.float64)
        a = lsh_knn(ds, q, k=7)
        b = idx.query(q, k=7)
        assert a.to_pydict() == b.to_pydict()
    assert idx.query(base[2].astype(np.float64), k=3)[
        "vec_id"].to_pylist()[0] == 2


def test_event_op_boundary_semantics(ray_session):
    """Boundary cases the sf oracles never hit at microsecond
    resolution: as-of right-event exactly AT the left ts (match),
    range-join events exactly at lo (in) and hi (out), funnel
    purchases exactly at t0 and t0+window (both convert)."""
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        RANGE_BASE_US,
        RANGE_SPAN_US,
        asof_join_events,
        conversion_funnel,
        range_join_events,
    )

    us = 1_000_000
    day = 86_400 * us

    def ev(rows):
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows],
                              pa.float64()),
        }))

    t0 = RANGE_BASE_US
    # as-of: click exactly at the purchase ts matches (>= semantics);
    # a later click does not
    a = asof_join_events(ev([
        (1, t0, 7, "purchase", 1.0),
        (2, t0, 7, "click", 2.0),        # same instant: matches
        (3, t0 + us, 7, "click", 3.0),   # after: must not match
        (4, t0 - us, 8, "purchase", 1.0),  # user 8 has no click
    ])).to_pandas().set_index("event_id")
    assert a.loc[1, "right_ts_micros"] == t0
    assert a.loc[1, "right_value_micros"] == 2_000_000
    assert a.loc[4, "right_ts_micros"] == -1
    # range join: lo inclusive, hi exclusive
    r = range_join_events(ev([
        (1, t0, 1, "view", 1.0),                      # == lo: in
        (2, t0 + RANGE_SPAN_US, 1, "view", 1.0),      # == hi: out
        (3, t0 + RANGE_SPAN_US - 1, 1, "view", 1.0),  # hi-1us: in
    ])).to_pandas()
    assert r["n_events"].sum() == 2
    # funnel: purchase at exactly t0 and exactly t0+window both convert
    f = conversion_funnel(ev([
        (1, t0, 1, "signup", 0.0),
        (2, t0, 1, "purchase", 0.0),          # same instant converts
        (3, t0, 2, "signup", 0.0),
        (4, t0 + day, 2, "purchase", 0.0),    # == window edge converts
        (5, t0, 3, "signup", 0.0),
        (6, t0 + day + 1, 3, "purchase", 0.0),  # 1us past: no
    ])).to_pandas().set_index("user_id")
    assert f.loc[1, "converted"] == 1
    assert f.loc[2, "converted"] == 1
    assert f.loc[3, "converted"] == 0


def test_asof_user_without_left_events(ray_session):
    """A user with only right-type events yields an empty per-group
    frame; its dtypes must not poison the block schema."""
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        asof_join_events,
    )

    t0 = 1_700_000_000 * 1_000_000
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([t0, t0 + 1, t0 + 2], pa.timestamp("us")),
        "user_id": pa.array([1, 2, 2], pa.int64()),
        "event_type": pa.array(["click", "purchase", "click"],
                               pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    }))
    out = asof_join_events(ds).to_pandas()
    assert list(out["event_id"]) == [2]  # user 1 contributes nothing
    assert out["right_ts_micros"].iloc[0] == -1  # click is AFTER


def test_rollup_pivot_wide_detail(ray_session):
    """Detail tables larger than the default 1024-row map_batches batch
    must still produce exactly one grand-total row (rollup) and one row
    per day (pivot)."""
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        EVENT_TYPES,
        events_pivot,
        events_rollup,
    )

    day_us = 86_400 * 1_000_000
    n_days = 400  # x5 types = 2000 detail rows > 1024
    rows_ts, rows_ty = [], []
    for d in range(n_days):
        for t in EVENT_TYPES:
            rows_ts.append(d * day_us + 1)
            rows_ty.append(t)
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(rows_ty, pa.string()),
        "ts": pa.array(rows_ts, pa.timestamp("us")),
    }))
    r = events_rollup(ds).to_pandas()
    assert (r["event_type"] == "ALL").sum() == 1
    assert r[r["event_type"] == "ALL"]["n_events"].iloc[0] == len(rows_ts)
    p = events_pivot(ds).to_pandas()
    assert len(p) == n_days and p["day"].is_unique
    assert (p[[f"n_{t}" for t in EVENT_TYPES]].to_numpy() == 1).all()


def test_semantic_dedup_drops_planted_neardups(ray_session):
    """SemDeDup on a planted-near-dup fixture: every dropped vector has
    a lower-id same-cluster neighbor at >= threshold (soundness, checked
    exactly with numpy), and every planted dup that shares its
    original's cluster is dropped (completeness on the planted set)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    dim, n_base = 32, 300
    base = rng.standard_normal((n_base, dim))
    rows = [base[i] for i in range(n_base)]
    planted = []
    for i in range(0, 60, 3):  # 20 planted near-dups of base rows
        dup = base[i] + 0.02 * rng.standard_normal(dim)
        planted.append((i, n_base + len(planted)))
        rows.append(dup)
    m = np.stack(rows)
    tbl = pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
    })
    out = semantic_dedup(rd.from_arrow(tbl), threshold=0.95).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(rows)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = mn @ mn.T
    cl = out["cluster"].to_numpy()
    keep = out["keep"].to_numpy()
    for v in np.nonzero(keep == 0)[0]:
        lower_same = np.nonzero((cl[:v] == cl[v]))[0]
        assert (sims[lower_same, v] >= 0.95).any(), v
    dropped = 0
    for orig, dup in planted:
        if cl[orig] == cl[dup] and sims[orig, dup] >= 0.95:
            assert keep[dup] == 0, (orig, dup)
            dropped += 1
    assert dropped >= 15  # the fixture really exercised the drop path


def test_distinctive_terms_paths_agree(ray_session):
    """The broadcast (bounded-vocab) and join (unbounded-vocab) paths of
    distinctive_terms must produce identical rows."""
    import ray.data as rd

    import pandas as pd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        distinctive_terms,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=4)
    key = ["doc_id", "rank", "token", "df"]
    a = (distinctive_terms(ds, distributed=False).to_pandas()[key]
         .sort_values(key).reset_index(drop=True))
    b = (distinctive_terms(ds, distributed=True).to_pandas()[key]
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_pii_scrub_masks_planted_pii(ray_session):
    """The fixture corpus has no PII (vacuous-but-exact oracle), so pin
    the non-vacuous behavior here: the engine kernel must mask planted
    emails/URLs/phones exactly like the same RE2 chain run in DuckDB."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        pii_scrub_batch,
    )

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at bob.smith+x@gov.uk today",
            "see https://example.com/a?b=1 and +44 (0)20 7946 0958 ok",
            "plain text only",
            "two mails a@b.io c@d.org and http://x.y plus 0123456789",
        ], pa.string()),
    })
    got = pii_scrub_batch(tbl).to_pandas()
    assert got["n_emails"].sum() >= 3
    assert got["n_urls"].sum() >= 2
    assert got["n_phones"].sum() >= 2
    assert "<email>" in got["scrubbed_text"][0]
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.sql(entrymod.oracle_sql()["pii_scrub"]).df()
    key = ["doc_id", "scrubbed_text", "n_urls", "n_emails", "n_phones"]
    pd.testing.assert_frame_equal(
        got[key].sort_values("doc_id").reset_index(drop=True),
        want[key].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


def test_pack_offsets_is_exclusive_prefix_sum(ray_session):
    """Random corpus incl. empty docs, multiple buckets: tok_start must
    be the exclusive cumsum of token counts in doc_id order, and the
    sequence span must cover exactly ceil(total/B) sequences."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.packing import pack_offsets

    rng = np.random.default_rng(13)
    texts = []
    for i in range(300):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(
            rng.choice(["a", "bb", "ccc", "dd"], size=n)) if n else "")
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (pack_offsets(rd.from_arrow(tbl).repartition(7),
                        seq_tokens=16, bucket_docs=32)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n_tok = np.array([len(t.split()) for t in texts], dtype=np.int64)
    assert (out["n_tokens"].to_numpy() == n_tok).all()
    want_start = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    assert (out["tok_start"].to_numpy() == want_start).all()
    assert (out["seq_first"].to_numpy() == want_start // 16).all()
    occ = np.maximum(n_tok, 1)
    assert (out["seq_last"].to_numpy()
            == (want_start + occ - 1) // 16).all()


def test_chunk_dedup_matches_bruteforce(ray_session):
    """Random corpus with planted duplicated chunks: the distributed
    result equals a sequential first-occurrence reimplementation."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import chunk_dedup

    rng = np.random.default_rng(21)
    vocab = ["w%d" % i for i in range(12)]
    texts = []
    for i in range(120):
        toks = list(rng.choice(vocab, size=int(rng.integers(1, 30))))
        texts.append(" ".join(toks))
    # plant exact chunk repeats: doc 100.. copy earlier docs
    for i in range(100, 120):
        texts[i] = texts[i - 100]
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = (chunk_dedup(rd.from_arrow(tbl).repartition(5),
                       chunk_tokens=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # sequential truth
    seen, want = set(), {}
    for d, t in enumerate(texts):
        toks = t.split()
        kept = []
        for c in range(0, len(toks), 4):
            ch = " ".join(toks[c:c + 4])
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        if kept:
            want[d] = (" ".join(kept), len(kept))
    assert list(got["doc_id"]) == sorted(want)
    for _, r in got.iterrows():
        wt, wn = want[r["doc_id"]]
        assert r["kept_text"] == wt and r["n_kept"] == wn


def test_deterministic_shuffle_is_stable_permutation(ray_session):
    """shuffle_pos must be a permutation of 0..N-1 and identical across
    different input partitionings."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.packing import (
        deterministic_shuffle,
    )

    tbl = pa.table({"doc_id": pa.array(range(777), pa.int64())})
    a = (deterministic_shuffle(rd.from_arrow(tbl).repartition(3))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (deterministic_shuffle(rd.from_arrow(tbl).repartition(11))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert sorted(a["shuffle_pos"]) == list(range(777))
    assert (a["shuffle_pos"].to_numpy()
            == b["shuffle_pos"].to_numpy()).all()


def test_priority_sample_exact_and_partition_stable(ray_session):
    """priority_sample must equal the scalar priority formula computed
    sequentially, and be identical under any re-partitioning."""
    import hashlib

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sampling import priority_sample

    texts = [("w" * ((i * 37) % 200 + 1)) for i in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = priority_sample(rd.from_arrow(tbl).repartition(7), k=10)
    got2 = priority_sample(rd.from_arrow(tbl).repartition(2), k=10)
    assert got.to_pydict() == got2.to_pydict()
    # sequential truth
    want = []
    for d, t in enumerate(texts):
        w = min(len(t) + 1, (1 << 19) - 1)
        u = int(hashlib.md5(str(d).encode()).hexdigest()[:16], 16) >> 21
        want.append((-((w * (1 << 43)) // (1 + u)), d))
    want = sorted(want)[:10]
    assert got["doc_id"].to_pylist() == [d for _, d in want]
    assert got["priority"].to_pylist() == [-p for p, _ in want]


def test_tfidf_rank_matches_sequential(docs_ds):
    """tfidf_rank's integer scores must equal the sequential
    formula (token-exact tf, idf = (N << 20) // df)."""
    from govuk_crawler_worker_ray.pipelines.text_analysis import tfidf_rank

    terms = ("the", "fox", "casa")
    t = _docs_table()
    texts = t["text"].to_pylist()
    n = len(texts)
    df = {q: sum(1 for x in texts if q in x.split()) for q in terms}
    idf = {q: (n << 20) // df[q] if df[q] else 0 for q in terms}
    want = sorted(
        ((-sum(x.split().count(q) * idf[q] for q in terms), d)
         for d, x in enumerate(texts)))[:4]
    got = tfidf_rank(docs_ds, terms=terms, k=4)
    assert got["doc_id"].to_pylist() == [d for _, d in want]
    assert got["score"].to_pylist() == [-s for s, _ in want]


def _emb_table():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    vecs[3] = 0.0  # zero-vector guard path
    return pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(40)], pa.int32()),
    })


def test_embedding_stats_and_centroids(ray_session):
    """Moments/centroids over the int8 codes must equal the sequential
    quantize-then-sum truth, independent of partitioning."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        embedding_stats,
        label_centroids,
    )

    t = _emb_table()
    # sequential quantization twin
    q = []
    for v in t["embedding"].to_pylist():
        m = max(abs(x) for x in v)
        if m == 0:
            q.append([0] * len(v))
        else:
            q.append([int(np.floor(abs(127 * float(x) / m) + 0.5)
                          * (1 if x >= 0 else -1)) for x in v])
    qm = np.array(q, dtype=np.int64)
    ds = rd.from_arrow(t).repartition(5)
    st = embedding_stats(ds).to_pandas().sort_values("dim")
    assert (st["sum_q"].to_numpy() == qm.sum(axis=0)).all()
    assert (st["n_vecs"] == 40).all()
    assert np.array_equal(st["mean_q"].to_numpy(), qm.sum(axis=0) / 40)
    var = (40 * (qm * qm).sum(axis=0) - qm.sum(axis=0) ** 2) / 1600
    assert np.array_equal(st["var_q"].to_numpy(), var)

    cen = (label_centroids(ds).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    labels = np.array([i % 3 for i in range(40)])
    for lab in (0, 1, 2):
        sub = qm[labels == lab]
        rows = cen[cen["label"] == lab]
        assert (rows["n_vecs"] == len(sub)).all()
        assert np.array_equal(rows["centroid_q"].to_numpy(),
                              sub.sum(axis=0) / len(sub))


def test_semi_and_left_outer_join(ray_session):
    """left_semi keeps exactly the matched customers; left_outer emits
    NULL order columns for unmatched ones."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        customer_order_details,
        customers_with_orders,
    )

    cust = rd.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"], pa.string())}))
    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 3, 9], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_totalprice": pa.array([500000.0, 100.0, 600000.0, 700000.0],
                                 pa.float64())}))
    semi = customers_with_orders(cust, orders, num_partitions=2
                                 ).to_pandas().sort_values("c_custkey")
    assert semi["c_custkey"].tolist() == [1, 3]
    lo = (customer_order_details(cust, orders, num_partitions=2)
          .to_pandas().sort_values(["c_custkey", "o_orderkey"]))
    assert lo["c_custkey"].tolist() == [1, 2, 3, 4]
    assert lo["o_orderkey"].tolist()[0] == 10
    assert lo["o_orderkey"].isna().tolist() == [False, True, False, True]


def test_upsert_latest_ties_and_partition_stable(ray_session):
    """Latest-per-key must break ts ties by event_id and be identical
    under any re-partitioning (the recrawl-merge contract)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import upsert_latest

    ts = pa.array([100, 300, 300, 200, 50, 50], pa.timestamp("us"))
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "event_id": pa.array([10, 11, 12, 20, 30, 31], pa.int64()),
        "ts": ts,
        "event_type": pa.array(list("abcdef"), pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
    })
    got = (upsert_latest(rd.from_arrow(tbl).repartition(4),
                         num_partitions=3)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # user 1: ts tie at 300 -> event_id 12 wins; user 3: tie at 50 -> 31
    assert got["event_id"].tolist() == [12, 20, 31]
    assert got["event_type"].tolist() == ["c", "d", "f"]
    got2 = (upsert_latest(rd.from_arrow(tbl).repartition(1),
                          num_partitions=1)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got.equals(got2)


def test_customer_activity_full_outer_both_sides(ray_session):
    """full_outer must surface keys unique to EITHER side with NULLs
    on the other, and exact integer-cents spend on matches."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        customer_activity,
    )

    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([10.005, 20.0, 5.5], pa.float64())}))
    events = rd.from_arrow(pa.table({
        "user_id": pa.array([2, 2, 9], pa.int64())}))
    got = (customer_activity(orders, events, num_partitions=2)
           .to_pandas().sort_values("o_custkey").reset_index(drop=True))
    assert got["o_custkey"].tolist() == [1, 2, 9]
    # key 1: orders only; key 9: events only; key 2: both
    assert got["order_cnt"].fillna(-1).tolist() == [2, 1, -1]
    assert got["event_cnt"].fillna(-1).tolist() == [-1, 2, 1]
    # floor(10.005*100+0.5)=1001 (double 10.005 is 10.00499..), +2000
    assert got["spend_cents"].fillna(-1).tolist() == [3001, 550, -1]


def test_token_windows_overlap_and_edges(ray_session):
    """Sliding windows: exact token slices at stride < window, tiling
    at stride == window, empty docs emit nothing, bad stride raises."""
    import pytest as _pytest
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        token_windows,
    )

    texts = ["a b c d e f g", "  ", "x y z"]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl).repartition(2)
    got = (token_windows(ds, window=4, stride=2).to_pandas()
           .sort_values(["doc_id", "win_idx"]).reset_index(drop=True))
    # doc 0 (7 tokens, w=4, s=2): 1+ceil(3/2)=3 windows
    assert got[got.doc_id == 0]["win_text"].tolist() == [
        "a b c d", "c d e f", "e f g"]
    assert got[got.doc_id == 0]["n_tokens"].tolist() == [4, 4, 3]
    assert (got.doc_id == 1).sum() == 0  # whitespace-only doc
    assert got[got.doc_id == 2]["win_text"].tolist() == ["x y z"]
    tiled = (token_windows(ds, window=2).to_pandas()
             .sort_values(["doc_id", "win_idx"]).reset_index(drop=True))
    assert tiled[tiled.doc_id == 0]["win_text"].tolist() == [
        "a b", "c d", "e f", "g"]
    with _pytest.raises(ValueError):
        token_windows(ds, window=2, stride=3)


def test_html_extract_text_planted(ray_session):
    """The RE2 kernel chain must strip script/style/comments/tags,
    decode entities in single-pass order (&amp; last), and collapse
    whitespace."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        html_extract_text,
    )

    bodies = [
        "<html><head><script>var x = '<p>no</p>';</script>"
        "<style>p { color: red }</style></head>"
        "<body><!-- hidden --><h1>Title</h1>\n<p>a &amp;lt; b "
        "&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p></body>",
        "plain, no tags",
        "",
    ]
    tbl = pa.table({"url": pa.array(["u1", "u2", "u3"], pa.string()),
                    "body": pa.array(bodies, pa.string())})
    got = (html_extract_text(rd.from_arrow(tbl)).to_pandas()
           .sort_values("url").reset_index(drop=True))
    # single-pass decode: "&amp;lt;" contains no literal "&lt;"
    # substring, so only the final &amp; pass touches it -> "&lt;"
    # stays encoded (the HTML-correct result)
    assert got["text"][0] == ("Title a &lt; b <tag> \"q\" 's' end")
    assert got["text"][1] == "plain, no tags"
    assert got["text"][2] == ""
    assert got["n_chars"].tolist() == [len(got["text"][0]), 14, 0]


def test_running_total_matches_sequential(ray_session):
    """Cumulative per-key sums must equal the sequential prefix sums
    in (ts, event_id) order, under any partitioning."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import running_total

    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([11, 10, 12, 20, 21], pa.int64()),
        "ts": pa.array([200, 200, 100, 50, 40], pa.timestamp("us")),
        "value": pa.array([1.5, 2.0, 0.25, 10.0, 4.0], pa.float64()),
    })
    got = (running_total(rd.from_arrow(tbl).repartition(3),
                         num_partitions=2)
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    # user 1 order: (100,12)=0.25 -> (200,10)+2.0 -> (200,11)+1.5
    assert got["event_id"].tolist() == [12, 10, 11, 21, 20]
    assert got["cum_value_micros"].tolist() == [
        250000, 2250000, 3750000, 4000000, 14000000]


def test_json_field_agg_edges(ray_session):
    """The flat-field RE2 extract must handle spacing, negatives, and
    missing keys (-> 0), matching what a real JSON parser returns on
    this shape."""
    import json

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        json_field_agg,
    )

    props = ['{"k": 5}', '{"k":-3}', '{ "k" : 12 }', '{"other": 9}',
             '{}', '{"k": 7, "j": 1}']
    tbl = pa.table({
        "event_type": pa.array(["a", "a", "b", "b", "b", "a"],
                               pa.string()),
        "props": pa.array(props, pa.string())})
    got = (json_field_agg(rd.from_arrow(tbl).repartition(3))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    # truth via a real parser
    want = {}
    for et, p in zip(tbl["event_type"].to_pylist(), props):
        d = json.loads(p)
        n, k = want.get(et, (0, 0))
        want[et] = (n + 1, k + int(d.get("k", 0)))
    assert got["n_events"].tolist() == [want["a"][0], want["b"][0]]
    assert got["sum_k"].tolist() == [want["a"][1], want["b"][1]]


def test_bloom_semi_join_exact_and_prunes(ray_session):
    """bloom_semi_join must return exactly the left_semi result (false
    positives removed by the verify join), and its prefilter must
    actually drop definite non-members before the exchange."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        bloom_semi_join,
        customers_with_orders,
    )
    from govuk_crawler_worker_ray.state.bloom import BloomFilter

    n = 500
    cust = rd.from_arrow(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(n)], pa.string())}))
    # only keys 0..49 qualify
    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array(range(50), pa.int64()),
        "o_totalprice": pa.array([500000.0] * 50, pa.float64())}))
    got = (bloom_semi_join(cust, orders, num_partitions=2)
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    want = (customers_with_orders(cust, orders, num_partitions=2)
            .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert got.equals(want)
    assert got["c_custkey"].tolist() == list(range(50))
    # the prefilter itself: a 2^20-bit bloom over 50 keys passes all
    # members and (with overwhelming margin) far fewer than all 500
    bf = BloomFilter.empty(1 << 20, 7)
    bf.add_many(np.arange(50, dtype=np.uint64))
    mask = bf.contains_many(np.arange(n, dtype=np.uint64))
    assert mask[:50].all()
    assert mask.sum() < 100  # ~50 expected; fpp at this load is ~0


def test_bloom_from_bits_merge_is_union(ray_session):
    """OR-merging per-batch partial blooms must behave as one filter
    built over the union of keys (the combiner property the
    distributed build relies on)."""
    from govuk_crawler_worker_ray.state.bloom import BloomFilter

    a = BloomFilter.empty(1 << 16, 5)
    b = BloomFilter.empty(1 << 16, 5)
    ka = np.array([1, 2, 3, 1000], dtype=np.uint64)
    kb = np.array([7, 8, 2000], dtype=np.uint64)
    a.add_many(ka)
    b.add_many(kb)
    merged = BloomFilter.from_bits(a.bits | b.bits, 5)
    both = BloomFilter.empty(1 << 16, 5)
    both.add_many(np.concatenate([ka, kb]))
    assert (merged.bits == both.bits).all()
    assert merged.contains_many(np.concatenate([ka, kb])).all()


def test_user_retention_matches_sequential(ray_session):
    """Daily active/new/retained/churned must equal the sequential
    truth on a hand-built activity pattern (gaps, multi-events/day,
    users starting on different days)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        user_retention,
    )

    day_us = 86400 * 1_000_000
    # (user, day) activity: u1 days 0,1,3; u2 days 1,2; u3 day 3
    pairs = [(1, 0), (1, 0), (1, 1), (1, 3), (2, 1), (2, 2), (3, 3)]
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in pairs], pa.int64()),
        "ts": pa.array([d * day_us + 123 for _, d in pairs],
                       pa.timestamp("us")),
    })
    got = (user_retention(rd.from_arrow(tbl).repartition(3),
                          num_partitions=2)
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert got["day"].tolist() == [0, 1, 2, 3]
    assert got["n_active"].tolist() == [1, 2, 1, 2]
    assert got["n_new"].tolist() == [1, 1, 0, 1]      # u1@0, u2@1, u3@3
    assert got["n_retained"].tolist() == [0, 1, 1, 0]  # u1@1, u2@2
    # churn(d) = active(prev present day) - retained(d)
    assert got["n_churned"].tolist() == [0, 0, 1, 1]


def test_ngram_positional_filter_end_to_end_random(ray_session):
    """The PPJoin positional filter must lose NO qualifying pair: the
    full prefix-mode pipeline equals the all-pairs bruteforce on a
    randomized mutation-dense corpus at several thresholds."""
    import random

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        ngram_jaccard_bruteforce,
        ngram_jaccard_dedup,
    )

    rng = random.Random(99)
    alphabet = "abcdef "
    base = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randint(5, 50)))
            for _ in range(10)]
    texts = list(base)
    for b in base:  # insertions + suffixes = many true near-pairs
        i = rng.randrange(max(len(b), 1))
        texts.append(b[:i] + rng.choice(alphabet) + b[i:])
        texts.append(b + rng.choice(alphabet))
    tmap = dict(enumerate(texts))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl).repartition(4)
    for t in (0.35, 0.6, 0.85):
        out = ngram_jaccard_dedup(ds, threshold=t, n=3, mode="prefix")
        got = list(zip(out["doc_a"].to_pylist(),
                       out["doc_b"].to_pylist(),
                       out["jaccard"].to_pylist()))
        assert got == ngram_jaccard_bruteforce(tmap, t, 3), t


def test_ngram_distributed_equals_broadcast(docs_ds):
    """The ngram join shape (no driver pair/gram collection) must
    produce the exact output of the broadcast shape, including the
    float jaccard values."""
    from govuk_crawler_worker_ray.pipelines.dedup import (
        ngram_jaccard_dedup,
    )

    for t in (0.3, 0.8):
        small = ngram_jaccard_dedup(docs_ds, threshold=t, n=3,
                                    mode="prefix", distributed=False)
        big = ngram_jaccard_dedup(docs_ds, threshold=t, n=3,
                                  mode="prefix", distributed=True)
        assert small.to_pydict() == big.to_pydict()
    auto = ngram_jaccard_dedup(docs_ds, threshold=0.3, n=3,
                               mode="prefix", broadcast_limit=0)
    assert auto.to_pydict() == ngram_jaccard_dedup(
        docs_ds, threshold=0.3, n=3, mode="prefix",
        distributed=False).to_pydict()


def test_salted_skew_join_matches_plain_join(ray_session):
    """salted_skew_join is semantically the plain inner join: the salt
    fan-out/replication must be invisible in the output, for every
    hot-set size (nothing hot, one mega-key hot, everything hot) and
    for differently-named key columns."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        salted_skew_join,
    )

    rng = np.random.default_rng(7)
    # mega-key 0 holds ~80% of fact rows; keys 1..9 share the rest
    keys = np.where(rng.random(400) < 0.8, 0,
                    rng.integers(1, 10, 400)).astype(np.int64)
    fact = pa.table({
        "k": pa.array(keys),
        "row_id": pa.array(np.arange(400, dtype=np.int64)),
    })
    dim = pa.table({
        "dk": pa.array(np.arange(10, dtype=np.int64)),
        "payload": pa.array([f"p{i}" for i in range(10)]),
    })
    exp = (fact.to_pandas()
           .merge(dim.to_pandas(), left_on="k", right_on="dk")
           .drop(columns=["dk"])
           .sort_values(["row_id"]).reset_index(drop=True))

    for hot_frac in (0.5, 0.01, 0.999999):
        out = salted_skew_join(
            rd.from_arrow(fact).repartition(5), rd.from_arrow(dim),
            on="k", right_on="dk", spread_col="row_id",
            num_salts=4, hot_frac=hot_frac)
        got = (pa.concat_tables(
            out.iter_batches(batch_format="pyarrow")).to_pandas()
            .sort_values(["row_id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "row_id", "payload"]],
            exp[["k", "row_id", "payload"]], check_like=True)


def test_hll_sketch(ray_session):
    """HLL estimate is within the m=64 error envelope in the raw-
    estimator regime, block-layout invariant (mergeable registers),
    and the rho extraction matches a direct bit count."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sketches import (
        _hll_rho,
        hll_distinct,
    )

    # rho spec: first 1-bit position in the 56-bit hex suffix
    assert _hll_rho("f" + "0" * 13) == 1
    assert _hll_rho("8" + "0" * 13) == 1
    assert _hll_rho("4" + "0" * 13) == 2
    assert _hll_rho("1" + "0" * 13) == 4
    assert _hll_rho("01" + "0" * 12) == 8
    assert _hll_rho("0" * 14) == 57
    for h in ("a3f0c2d4e5b697a1", "0007fc31ab02de44"):
        v = int(h[:14], 16)
        assert _hll_rho(h[:14]) == 57 - v.bit_length()

    n = 6000
    t = pa.table({
        "event_type": pa.array(["a"] * n + ["b"] * n, pa.string()),
        "user_id": pa.array([i % 3000 for i in range(n)]
                            + [i % 900 for i in range(n)], pa.int64()),
    })
    first = None
    for blocks in (1, 7):
        out = (hll_distinct(rd.from_arrow(t).repartition(blocks))
               .to_pandas().set_index("event_type")["est_distinct"])
        # stderr ~ 1.04/sqrt(64) = 13%; allow 3 sigma
        assert abs(out["a"] - 3000) / 3000 < 0.4
        assert abs(out["b"] - 900) / 900 < 0.4
        if first is None:
            first = dict(out)
        else:
            assert dict(out) == first  # mergeability


def test_cms_heavy_hitters(docs_ds):
    """CMS candidate set is a superset of the exact heavy hitters
    (one-sided error), every estimate >= the true count, and the
    output is block-layout invariant (mergeable cells)."""
    import pandas as pd
    import pyarrow.compute as pc

    from govuk_crawler_worker_ray.pipelines.sketches import (
        cms_heavy_hitters,
    )
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        heavy_hitters,
    )

    exact = heavy_hitters(docs_ds, pct=1).to_pandas()
    base = (cms_heavy_hitters(docs_ds, pct=1).to_pandas()
            .sort_values("token").reset_index(drop=True))
    assert set(exact["token"]) <= set(base["token"])
    truth = dict(zip(exact["token"], exact["n_occurrences"]))
    for t, est in zip(base["token"], base["est_count"]):
        if t in truth:
            assert est >= truth[t]
    reblocked = (cms_heavy_hitters(docs_ds.repartition(5), pct=1)
                 .to_pandas().sort_values("token")
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(base, reblocked)


def test_inverted_index(docs_ds):
    """Postings reconstruct exact per-doc term frequencies, df matches
    the posting length, order is doc_id-ascending, and the build is
    block-layout invariant."""
    import pandas as pd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        inverted_index,
    )

    base = (inverted_index(docs_ds).to_pandas()
            .sort_values("token").reset_index(drop=True))
    docs = pa.concat_tables(
        docs_ds.iter_batches(batch_format="pyarrow")).to_pandas()
    truth: dict = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        for tok in text.split():
            truth[(tok, did)] = truth.get((tok, did), 0) + 1
    for _, row in base.iterrows():
        entries = [e.split(":") for e in row["postings"].split(",")]
        dids = [int(d) for d, _ in entries]
        assert dids == sorted(dids)
        assert row["df"] == len(entries)
        for d, tf in entries:
            assert truth[(row["token"], int(d))] == int(tf)
    n_pairs = sum(1 for _ in truth)
    assert int(base["df"].sum()) == n_pairs
    reblocked = (inverted_index(docs_ds.repartition(5)).to_pandas()
                 .sort_values("token").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, reblocked)


def test_hard_negatives(ray_session):
    """Top-k cross-label integer-dot neighbors match a pure-numpy
    reference exactly (scores, membership, tie order) and are
    block-layout invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import (
        _quantize_codes,
        hard_negatives,
    )

    rng = np.random.default_rng(3)
    n, dim = 120, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })
    q, _, _, _ = _quantize_codes(t["embedding"])
    codes = q.reshape(n, dim)
    labels = np.arange(n) % 4
    rows = []
    for p in range(8):
        dots = codes[p] @ codes.T
        ok = (labels != labels[p]) & (np.arange(n) != p)
        cand = np.flatnonzero(ok)
        top = cand[np.lexsort((cand, -dots[cand]))][:5]
        for r, nb in enumerate(top, 1):
            rows.append((p, int(nb), int(dots[nb]), r))
    exp = pd.DataFrame(rows, columns=["probe_id", "neighbor_id",
                                      "dot", "rank"])
    for blocks in (1, 6):
        got = (hard_negatives(rd.from_arrow(t).repartition(blocks),
                              n_probes=8, k=5).to_pandas())
        pd.testing.assert_frame_equal(
            got.sort_values(["probe_id", "rank"]).reset_index(drop=True),
            exp.astype(got.dtypes.to_dict()), check_dtype=False)


def test_vocab_encode(docs_ds):
    """Encoded sequences decode back to the original token stream for
    in-vocab tokens, OOV ids are exactly the non-top-V tokens, and the
    encoding is block-layout invariant."""
    import pandas as pd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        vocab_encode,
    )

    V = 8
    base = (vocab_encode(docs_ds, vocab_size=V).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    docs = pa.concat_tables(
        docs_ds.iter_batches(batch_format="pyarrow")).to_pandas()
    counts: dict = {}
    for text in docs["text"]:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    rank = sorted(counts, key=lambda t: (-counts[t], t))[:V]
    vocab = {t: i for i, t in enumerate(rank)}
    by_doc = dict(zip(docs["doc_id"], docs["text"]))
    for _, row in base.iterrows():
        toks = by_doc[row["doc_id"]].split()
        ids = [int(i) for i in row["ids_csv"].split(",")] if row[
            "ids_csv"] else []
        assert len(ids) == len(toks)
        for t, i in zip(toks, ids):
            assert i == vocab.get(t, -1)
    reblocked = (vocab_encode(docs_ds.repartition(5), vocab_size=V)
                 .to_pandas().sort_values("doc_id")
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(base, reblocked)


def test_dup_spans_planted(ray_session):
    """A planted 8-gram shared by two docs is reported at BOTH its
    1-based positions with n_docs == 2; a third doc with no shared
    8-gram yields nothing; block layout does not change the result."""
    import pandas as pd
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import dup_spans

    shared = "a b c d e f g h"            # the planted 8-gram
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"x1 x2 {shared} y1 y2",      # gram starts at token 3
            f"{shared} z1",               # gram starts at token 1
            "u1 u2 u3 u4 u5 u6 u7 u8 u9",  # unique tokens, no overlap
        ], pa.string()),
    })
    out = (dup_spans(rd.from_arrow(tbl)).to_pandas()
           .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    assert out.to_dict("list") == {
        "doc_id": [1, 2], "pos": [3, 1], "n_docs": [2, 2]}
    reblocked = (dup_spans(rd.from_arrow(tbl).repartition(3)).to_pandas()
                 .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, reblocked)
    # merge_limit=0 forces the distributed-groupby scale path; it must
    # agree with the single-task-merge fast path bit for bit
    scale = (dup_spans(rd.from_arrow(tbl).repartition(3), merge_limit=0)
             .to_pandas()
             .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, scale)
    # and broadcast_limit=0 on top forces the join fallback inside it
    joined = (dup_spans(rd.from_arrow(tbl), merge_limit=0,
                        broadcast_limit=0)
              .to_pandas()
              .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, joined)


def test_global_rank_matches_sequential(docs_ds):
    """Distributed two-phase rank equals the driver-side
    row_number() over (n_tokens DESC, doc_id ASC), is a dense 1..N
    permutation, and is block-layout invariant."""
    import pandas as pd

    from govuk_crawler_worker_ray.pipelines.relational import global_rank

    out = (global_rank(docs_ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pa.concat_tables(
        docs_ds.iter_batches(batch_format="pyarrow")).to_pandas()
    docs["n_tokens"] = [len(t.split()) for t in docs["text"]]
    expected = docs.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]).reset_index()
    exp_pos = {r["doc_id"]: i + 1 for i, r in expected.iterrows()}
    assert sorted(out["pos"]) == list(range(1, len(docs) + 1))
    for _, row in out.iterrows():
        assert row["pos"] == exp_pos[row["doc_id"]]
    reblocked = (global_rank(docs_ds.repartition(4)).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, reblocked)


def test_length_outliers_fences(ray_session):
    """Tukey fences with exact quantile_disc semantics: one extreme
    doc among uniform lengths is flagged, the uniform ones are not."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        length_outliers,
    )

    texts = ["w " * 10] * 9 + ["w " * 500]   # nine 10-token, one 500
    tbl = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([t.strip() for t in texts], pa.string()),
    })
    out = length_outliers(rd.from_arrow(tbl)).to_pandas()
    flagged = set(out[out["is_outlier"]]["doc_id"])
    assert flagged == {9}


def test_degree_stats_counts(ray_session):
    """Out/in degrees over a tiny graph, zeros for one-sided nodes."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import degree_stats

    edges = pa.table({
        "src": pa.array(["a", "a", "b"], pa.string()),
        "dst": pa.array(["b", "c", "c"], pa.string()),
    })
    out = (degree_stats(rd.from_arrow(edges)).to_pandas()
           .set_index("url"))
    assert out.loc["a", "out_degree"] == 2 and out.loc[
        "a", "in_degree"] == 0
    assert out.loc["b", "out_degree"] == 1 and out.loc[
        "b", "in_degree"] == 1
    assert out.loc["c", "out_degree"] == 0 and out.loc[
        "c", "in_degree"] == 2


def test_pmi_collocations_planted(ray_session):
    """A bigram always occurring together scores the maximum PMI ratio
    (c_xy == c_x == c_y  =>  score == SCALE * n_tok // c_y); a bigram
    of two independently-frequent tokens scores lower."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        pmi_collocations,
    )

    # "hong kong" always adjacent (5x); "of the" from frequent parts
    doc = ("hong kong . " * 5) + ("of x " * 10) + ("the y " * 10) + \
          ("of the " * 5)
    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([doc.strip()], pa.string()),
    })
    out = pmi_collocations(rd.from_arrow(tbl), min_count=5).to_pandas()
    out = out.set_index(out["w1"] + " " + out["w2"])
    hk = out.loc["hong kong"]
    n_tok = int(out["c_x"].iloc[0] * 0 + sum(
        len(t.split()) for t in [doc.strip()]))
    assert hk["c_xy"] == hk["c_x"] == hk["c_y"] == 5
    assert hk["pmi_ratio_micros"] == 1_000_000 * n_tok // 5
    assert out.loc["of the", "pmi_ratio_micros"] < hk["pmi_ratio_micros"]


def _spans_table():
    sp_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    rows = [
        [{"kind": "text", "text": "hello", "media_ref": None,
          "offset": 0},
         {"kind": "img", "text": "", "media_ref": "/a.png",
          "offset": 1},
         {"kind": "link", "text": "x", "media_ref": "/b",
          "offset": 2}],
        [],                                        # span-free doc
        [{"kind": "text", "text": "ab", "media_ref": None,
          "offset": 0}],
    ]
    return pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
        "spans": pa.array(rows, sp_type),
    })


def test_span_stats_interleaved(ray_session):
    """Zero-copy span flatten: counts and text chars per doc, including
    a span-free doc (all zeros) — and block-layout invariance."""
    import pandas as pd
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import span_stats

    out = (span_stats(rd.from_arrow(_spans_table())).to_pandas()
           .set_index("doc_id"))
    assert out.loc["d1"].tolist() == [3, 1, 2, 6]   # 5+0+1 chars
    assert out.loc["d2"].tolist() == [0, 0, 0, 0]
    assert out.loc["d3"].tolist() == [1, 1, 0, 2]
    reblocked = (span_stats(rd.from_arrow(_spans_table())
                            .repartition(3)).to_pandas()
                 .set_index("doc_id"))
    pd.testing.assert_frame_equal(out.sort_index(),
                                  reblocked.sort_index())


def test_media_manifest_order_and_nulls(ray_session):
    """Only media-carrying spans survive, with their original span
    offsets (the reference's span-sequence order invariant)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        media_manifest,
    )

    out = (media_manifest(rd.from_arrow(_spans_table())).to_pandas()
           .sort_values(["doc_id", "span_offset"])
           .reset_index(drop=True))
    assert out.to_dict("list") == {
        "doc_id": ["d1", "d1"],
        "span_offset": [1, 2],
        "kind": ["img", "link"],
        "media_ref": ["/a.png", "/b"],
    }


def test_span_text_reconstruction(ray_session):
    """Interleaved -> plain text: non-empty span texts join in offset
    order; a doc with no text spans keeps its row as ''."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import span_text

    sp_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    rows = [
        # offsets deliberately out of storage order
        [{"kind": "text", "text": "world", "media_ref": None,
          "offset": 2},
         {"kind": "img", "text": "", "media_ref": "/a.png",
          "offset": 1},
         {"kind": "text", "text": "hello", "media_ref": None,
          "offset": 0}],
        [{"kind": "img", "text": "", "media_ref": "/b.png",
          "offset": 0}],
    ]
    tbl = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array(rows, sp_type),
    })
    out = (span_text(rd.from_arrow(tbl)).to_pandas()
           .set_index("doc_id"))
    assert out.loc["d1", "text"] == "hello world"
    assert out.loc["d2", "text"] == ""


def test_media_context_planted(ray_session):
    """Nearest strictly-preceding/following NON-EMPTY text-kind span
    per media span; '' at document edges; non-text spans with text
    (link anchors) never count as context."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        media_context,
    )

    sp_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    rows = [
        # img at edge (no prev), link anchor text must NOT be context
        [{"kind": "img", "text": "", "media_ref": "/a.png",
          "offset": 0},
         {"kind": "link", "text": "anchor", "media_ref": "/l",
          "offset": 1},
         {"kind": "text", "text": "cap1", "media_ref": None,
          "offset": 2},
         {"kind": "img", "text": "", "media_ref": "/b.png",
          "offset": 3},
         {"kind": "text", "text": "", "media_ref": None,
          "offset": 4},                      # empty text: skipped
         {"kind": "text", "text": "cap2", "media_ref": None,
          "offset": 5}],
        [],
    ]
    tbl = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array(rows, sp_type),
    })
    out = (media_context(rd.from_arrow(tbl)).to_pandas()
           .sort_values("span_offset").reset_index(drop=True))
    assert out["media_ref"].tolist() == ["/a.png", "/l", "/b.png"]
    assert out["prev_text"].tolist() == ["", "", "cap1"]
    assert out["next_text"].tolist() == ["cap1", "cap1", "cap2"]


def test_media_dedup_first_occurrence(ray_session):
    """Asset groups count every reference and keep the (doc_id, offset)
    lexicographic first — across blocks."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import media_dedup

    sp_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    mk = lambda ref, off: {"kind": "img", "text": "",
                           "media_ref": ref, "offset": off}
    rows = [
        [mk("/x.png", 5), mk("/y.png", 0)],
        [mk("/x.png", 0)],
        [mk("/x.png", 1)],
    ]
    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "a2"], pa.string()),
        "spans": pa.array(rows, sp_type),
    })
    out = (media_dedup(rd.from_arrow(tbl).repartition(3)).to_pandas()
           .set_index("media_ref"))
    assert int(out.loc["/x.png", "n_refs"]) == 3
    # 'a' sorts before 'a2' and 'b'; within doc a, offset 5 is its only
    assert out.loc["/x.png", "first_doc_id"] == "a"
    assert int(out.loc["/x.png", "first_offset"]) == 5
    assert out.loc["/y.png", "first_doc_id"] == "a"
    assert int(out.loc["/y.png", "first_offset"]) == 0


def test_knn_join_exact_ties(ray_session):
    """Every vector gets exactly min(k, n-1) neighbors; never itself;
    ties on equal dot break toward the smaller neighbor id; block
    layout cannot change the result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.similarity import knn_join

    rng = np.random.default_rng(7)
    n, d = 40, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[3] = vecs[2]          # planted exact duplicate pair
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    out = knn_join(rd.from_arrow(tbl), k=5).to_pandas()
    assert len(out) == n * 5
    assert (out["vec_id"] != out["neighbor_id"]).all()
    g = out.sort_values(["vec_id", "rank"]).groupby("vec_id")
    # within each probe, dots non-increasing; equal dots => id ascending
    for _, grp in g:
        dd = grp["dot"].to_numpy()
        assert (np.diff(dd) <= 0).all()
        for i in range(len(dd) - 1):
            if dd[i] == dd[i + 1]:
                assert grp["neighbor_id"].iloc[i] < \
                    grp["neighbor_id"].iloc[i + 1]
    # the planted duplicate is its twin's rank-1 neighbor
    top2 = out[(out["vec_id"] == 2) & (out["rank"] == 1)]
    assert top2["neighbor_id"].iloc[0] == 3
    re = (knn_join(rd.from_arrow(tbl).repartition(5), k=5)
          .to_pandas().sort_values(["vec_id", "rank"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.sort_values(["vec_id", "rank"]).reset_index(drop=True), re)


def test_triangle_count_planted(ray_session):
    """Two triangles sharing an edge, plus a dangling edge: W and T are
    hand-countable; duplicate/reversed/self edges collapse away."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import triangle_count

    # K3 on {a,b,c} + K3 on {b,c,d} sharing edge (b,c); tail (d,e).
    # Duplicates/reversals/self-loops must not change anything.
    edges = pa.table({
        "src": pa.array(["a", "b", "a", "b", "c", "d", "d", "c", "e",
                         "a"], pa.string()),
        "dst": pa.array(["b", "c", "c", "d", "d", "e", "b", "b", "d",
                         "a"], pa.string()),
    })
    out = triangle_count(rd.from_arrow(edges).repartition(3)).to_pandas()
    # distinct canonical edges: ab ac bc bd cd de; degrees a2 b3 c3
    # d3 e1 -> wedges 1+3+3+3+0 = 10; triangles abc, bcd = 2
    assert int(out["n_wedges"].iloc[0]) == 10
    assert int(out["n_triangles"].iloc[0]) == 2
    assert int(out["gcc_ppm"].iloc[0]) == (3_000_000 * 2) // 10


def test_partitioned_write_resume(ray_session, tmp_path):
    """Round-trip equality + resume semantics: a rerun skips every
    finished bucket; deleting one bucket rewrites ONLY that bucket."""
    import os

    import pandas as pd
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sink import (
        read_partitioned,
        write_partitioned,
    )

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(40)],
                         pa.string()),
    })
    dest = str(tmp_path / "sink")
    ds = rd.from_arrow(tbl).repartition(4)
    r1 = write_partitioned(ds, dest, key="doc_id").to_pandas()
    assert not r1["skipped"].any()
    assert int(r1["n_rows"].sum()) == 40

    back = (read_partitioned(dest, columns=["doc_id", "text"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, tbl.to_pandas())

    # full rerun: every bucket skipped
    r2 = write_partitioned(ds, dest, key="doc_id").to_pandas()
    assert r2["skipped"].all()

    # delete one bucket: only it is rewritten
    victim = r1["bucket"].iloc[0]
    os.remove(os.path.join(dest, f"bucket={victim}", "part-0.parquet"))
    r3 = (write_partitioned(ds, dest, key="doc_id").to_pandas()
          .set_index("bucket"))
    assert not r3.loc[victim, "skipped"]
    assert r3.drop(index=victim)["skipped"].all()
    back2 = read_partitioned(dest).to_pandas()
    assert len(back2) == 40


def test_tiny_inputs_survive_hash_joins(ray_session):
    """Regression: ray 2.49's hash groupby/join emit ZERO-SCHEMA empty
    blocks for key-less partitions; when a join side is smaller than
    its partition count, pyarrow's per-partition join raised
    ArrowInvalid ("No match for FieldRef").  Every iterative /
    groupby-fed join must survive inputs of one row and zero rows
    (blocks.nonempty_blocks guards — the dup-free corpus / seed-only
    frontier / one-customer regime)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        connected_components_distributed,
        minhash_lsh_dedup,
    )
    from govuk_crawler_worker_ray.pipelines.graph import pagerank
    from govuk_crawler_worker_ray.pipelines.relational import (
        customer_activity,
    )
    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        distinctive_terms,
    )

    # one-edge and zero-edge dup graphs
    one = rd.from_arrow(pa.table({
        "doc_a": pa.array([1], pa.int64()),
        "doc_b": pa.array([2], pa.int64())}))
    got = connected_components_distributed(one)
    assert got.to_pydict() == {"doc_id": [1, 2], "component": [1, 1]}
    zero = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    assert connected_components_distributed(zero).num_rows == 0

    # one-edge pagerank through the DISTRIBUTED join path: b gets a's
    # contribution, a decays to base
    pr = pagerank(rd.from_arrow(pa.table({
        "src": pa.array(["a"]), "dst": pa.array(["b"])})),
        iterations=2, distributed=True)
    ranks = {r["url"]: r["rank_micros"] for r in pr.take_all()}
    assert ranks["a"] == 150_000 and ranks["b"] > ranks["a"]

    # two identical docs through the DISTRIBUTED minhash verify path
    txt = "the quick brown fox jumps over the lazy dog again and again"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([txt, txt])}))
    pairs = minhash_lsh_dedup(docs, distributed=True)
    assert pairs.num_rows == 1

    # distinctive terms over a 2-doc corpus, forced distributed join
    small = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the quick brown fox",
                          "lazy dog sleeps here"])}))
    assert distinctive_terms(small, distributed=True).count() == 6

    # full-outer activity with one order and zero events
    orders = rd.from_arrow(pa.table({
        "o_custkey": pa.array([7], pa.int64()),
        "o_totalprice": pa.array([10.0], pa.float64())}))
    events = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64())}))
    act = customer_activity(orders, events).to_pandas()
    assert len(act) == 1 and int(act["spend_cents"].iloc[0]) == 1000


def test_source_cap(ray_session):
    """Per-source cap keeps exactly `cap` docs per source, ranked by
    md5(doc_id), and the kept set is identical under different block
    layouts (the determinism contract)."""
    import hashlib

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sampling import source_cap

    ids = list(range(12))
    srcs = ["a"] * 6 + ["b"] * 5 + ["c"]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(srcs, pa.string())})

    def run(nblocks):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        df = source_cap(ds, cap=3).to_pandas()
        return df.sort_values(["source", "rank"]).reset_index(drop=True)

    got = run(1)
    assert got.groupby("source")["rank"].max().to_dict() == {
        "a": 3, "b": 3, "c": 1}
    # expected winners: md5(str(doc_id)) ascending within each source
    for src, members in (("a", ids[:6]), ("b", ids[6:11])):
        want = sorted(members,
                      key=lambda d: (hashlib.md5(str(d).encode())
                                     .hexdigest(), d))[:3]
        kept = got[got["source"] == src]["doc_id"].tolist()
        assert sorted(kept) == sorted(want)
    # layout-independence
    assert run(5).equals(got)


def test_event_transitions(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        event_transitions,
    )

    ts = pa.array([1, 2, 3, 1, 2], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": ts,
        "event_id": pa.array([10, 11, 12, 20, 21], pa.int64()),
        "event_type": pa.array(["view", "click", "view",
                                "view", "click"], pa.string()),
    }))
    got = {(r["src_type"], r["dst_type"]): r["n_trans"]
           for r in event_transitions(ev, num_partitions=3).take_all()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}

    # a NULL src event_type is a legal group (SQL GROUP BY keeps it);
    # Ray 2.49's groupby cannot sort a null string key, so the
    # operator sentinel-codes it across the exchange — pin the
    # round-trip back to a real Arrow null
    ev2 = rd.from_arrow(pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
        "event_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array([None, "click"], pa.string()),
    }))
    rows = event_transitions(ev2, num_partitions=2).take_all()
    assert [(r["src_type"], r["dst_type"], r["n_trans"])
            for r in rows] == [(None, "click", 1)]


def test_orders_cube(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import orders_cube

    orders = rd.from_arrow(pa.table({
        "o_orderstatus": pa.array(["O", "O", "F"], pa.string()),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH",
                                     "1-URGENT"], pa.string()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
    }))
    df = orders_cube(orders).to_pandas()
    key = df.set_index(["o_orderstatus", "o_orderpriority"])
    assert len(df) == 3 + 2 + 2 + 1  # detail + 2 subtotals + total
    assert key.loc[("ALL", "ALL"), "revenue_cents"] == 6000
    assert key.loc[("O", "ALL"), "n_orders"] == 2
    assert key.loc[("ALL", "1-URGENT"), "revenue_cents"] == 4000
    assert key.loc[("F", "1-URGENT"), "n_orders"] == 1


def test_corr_stats(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import corr_stats

    li = rd.from_arrow(pa.table({
        "l_returnflag": pa.array(["A", "A", "R"], pa.string()),
        "l_quantity": pa.array([2.0, 4.0, 10.0], pa.float64()),
        "l_discount": pa.array([0.05, 0.10, 0.00], pa.float64()),
    })).repartition(2)
    rows = {r["l_returnflag"]: r
            for r in corr_stats(li).take_all()}
    a = rows["A"]
    assert (a["n_rows"], a["sum_qty"], a["sum_disc"]) == (2, 6, 15)
    assert a["sum_qty_disc"] == 2 * 5 + 4 * 10
    assert a["sum_qty_sq"] == 4 + 16 and a["sum_disc_sq"] == 25 + 100
    assert rows["R"]["sum_disc"] == 0


def test_pagerank_broadcast_matches_distributed(ray_session):
    """The numpy fast path and the Dataset join path are bit-identical
    (same integer update, np.add.at accumulation)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import pagerank

    edges = pa.table({
        "src": pa.array(["a", "a", "b", "c", "d", "d"]),
        "dst": pa.array(["b", "c", "c", "a", "a", "b"])})

    def ranks(**kw):
        out = pagerank(rd.from_arrow(edges), iterations=3, **kw)
        if hasattr(out, "take_all"):
            rows = out.take_all()
        else:
            rows = out.to_pylist()
        return sorted((r["url"], r["rank_micros"]) for r in rows)

    assert ranks(distributed=False) == ranks(distributed=True)


def test_mm_quality_gate(ray_session):
    """Keeps text-bearing interleaved docs; drops all-media galleries
    and sub-threshold text; media_ppm is exact integer floor ppm."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        mm_quality_gate,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    docs = pa.table({
        "doc_id": pa.array(["good", "gallery", "tiny"], pa.string()),
        "spans": pa.array([
            [sp("text", "x" * 30, None, 0),
             sp("image", None, "m:1", 1),
             sp("text", "y" * 30, None, 2)],
            [sp("image", None, "m:2", 0),
             sp("image", None, "m:3", 1),
             sp("text", "z" * 40, None, 2)],   # 2/3 media > 600000 ppm
            [sp("text", "hi", None, 0)],        # < 20 chars
        ], pa.list_(span_t)),
    })
    got = mm_quality_gate(rd.from_arrow(docs)).to_pandas()
    assert got["doc_id"].tolist() == ["good"]
    row = got.iloc[0]
    assert (row["n_spans"], row["n_media_spans"],
            row["text_chars"], row["media_ppm"]) == (3, 1, 60, 333333)


def test_interleaved_dedup(ray_session):
    """Docs with byte-identical ordered (kind, text, media_ref) span
    sequences collapse to one group (min doc_id wins); differing
    media_ref or span order separates them; offset order is enforced
    even when the stored list is shuffled."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_dedup,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    seq = [sp("text", "hello", None, 0), sp("image", None, "m:1", 1)]
    shuffled = [seq[1], seq[0]]               # same sequence, stored
    other = [sp("text", "hello", None, 0),    # out of offset order
             sp("image", None, "m:2", 1)]     # different media_ref
    docs = pa.table({
        "doc_id": pa.array(["b", "a", "c"], pa.string()),
        "spans": pa.array([seq, shuffled, other], pa.list_(span_t)),
    })
    got = (interleaved_dedup(rd.from_arrow(docs)).to_pandas()
           .sort_values("min_doc_id").reset_index(drop=True))
    assert got["n_docs"].tolist() == [2, 1]
    assert got["min_doc_id"].tolist() == ["a", "c"]


def test_bfs_depth_broadcast_matches_distributed(ray_session):
    """The CSR-array fast path and the level-synchronous join path
    compute identical min-hop depths (cycle, unreachable node,
    multi-seed tie)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import bfs_depth

    edges = pa.table({
        "src": pa.array(["a", "b", "c", "d", "x"]),
        "dst": pa.array(["b", "c", "a", "c", "y"])})
    seeds = pa.table({"url": pa.array(["a", "d"])})

    def depths(**kw):
        out = bfs_depth(rd.from_arrow(edges), rd.from_arrow(seeds), **kw)
        rows = out.take_all() if hasattr(out, "take_all") \
            else out.to_pylist()
        return sorted((r["url"], r["depth"]) for r in rows)

    want = [("a", 0), ("b", 1), ("c", 1), ("d", 0)]
    assert depths(distributed=False) == want
    assert depths(distributed=True) == want


def test_span_transitions_offset_order(ray_session):
    """Kind bigrams follow OFFSET order, not storage order; pairs never
    cross document boundaries; single-span docs contribute nothing."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        span_transitions,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])

    def sp(kind, off):
        return {"kind": kind, "text": None, "media_ref": None,
                "offset": off}

    docs = pa.table({
        "doc_id": pa.array(["a", "b", "c"], pa.string()),
        "spans": pa.array([
            # stored image-first, but offsets say text -> image -> text
            [sp("image", 1), sp("text", 0), sp("text", 2)],
            [sp("text", 0), sp("text", 1)],
            [sp("image", 0)],                 # no pair
        ], pa.list_(span_t)),
    })
    got = (span_transitions(rd.from_arrow(docs).repartition(2))
           .to_pandas().sort_values(["kind_from", "kind_to"])
           .reset_index(drop=True))
    want = {("image", "text"): 1, ("text", "image"): 1,
            ("text", "text"): 1}
    assert {(r.kind_from, r.kind_to): r.n
            for r in got.itertuples()} == want


def test_snapshot_diff(ray_session):
    """added/removed/changed classified per key; unchanged pages never
    appear; empty sides degrade to all-added / all-removed."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import snapshot_diff

    prior = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "old body", "gone", "also same"],
                         pa.string())})
    new = pa.table({
        "doc_id": pa.array([1, 2, 4, 9], pa.int64()),
        "text": pa.array(["same", "new body", "also same", "brand new"],
                         pa.string())})

    got = (snapshot_diff(rd.from_arrow(new).repartition(2),
                         rd.from_arrow(prior).repartition(3))
           .to_pandas().set_index("doc_id")["change"].to_dict())
    assert got == {2: "changed", 3: "removed", 9: "added"}
    # merge_limit=0 forces the full_outer exchange path: same delta
    via_join = (snapshot_diff(rd.from_arrow(new),
                              rd.from_arrow(prior), merge_limit=0)
                .to_pandas().set_index("doc_id")["change"].to_dict())
    assert via_join == got

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    all_removed = snapshot_diff(empty, rd.from_arrow(prior)).to_pandas()
    assert sorted(all_removed["doc_id"]) == [1, 2, 3, 4]
    assert (all_removed["change"] == "removed").all()
    all_added = snapshot_diff(rd.from_arrow(new), empty).to_pandas()
    assert sorted(all_added["doc_id"]) == [1, 2, 4, 9]
    assert (all_added["change"] == "added").all()
    empty2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert snapshot_diff(empty, empty2).count() == 0

    # string keys flow through untouched (the north-rule doc_id shape)
    sprior = pa.table({"doc_id": pa.array(["x", "y"], pa.string()),
                       "text": pa.array(["a", "b"], pa.string())})
    snew = pa.table({"doc_id": pa.array(["y", "z"], pa.string()),
                     "text": pa.array(["B", "c"], pa.string())})
    sgot = (snapshot_diff(rd.from_arrow(snew), rd.from_arrow(sprior))
            .to_pandas().set_index("doc_id")["change"].to_dict())
    assert sgot == {"x": "removed", "y": "changed", "z": "added"}


def test_snapshot_diff_randomized_matches_bruteforce(ray_session):
    """Both snapshot_diff paths against a pure-Python dict diff over
    seeded random snapshots (duplicated texts, disjoint keys, empty
    strings, heavy overlap)."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import snapshot_diff

    rng = np.random.default_rng(23)
    for trial in range(3):
        texts = ["", "x", "yy", "shared body", f"t{trial}"]
        n_keys = [int(k) for k in rng.choice(40, size=25, replace=False)]
        p_keys = [int(k) for k in rng.choice(40, size=25, replace=False)]
        n_txt = [texts[i] for i in rng.integers(0, len(texts), 25)]
        p_txt = [texts[i] for i in rng.integers(0, len(texts), 25)]
        new = pa.table({"doc_id": pa.array(n_keys, pa.int64()),
                        "text": pa.array(n_txt, pa.string())})
        prior = pa.table({"doc_id": pa.array(p_keys, pa.int64()),
                          "text": pa.array(p_txt, pa.string())})

        def h(s):
            return hashlib.md5(s.encode()).hexdigest()

        nd = dict(zip(n_keys, (h(t) for t in n_txt)))
        pd_ = dict(zip(p_keys, (h(t) for t in p_txt)))
        want = {}
        for k in set(nd) | set(pd_):
            if k not in pd_:
                want[k] = "added"
            elif k not in nd:
                want[k] = "removed"
            elif nd[k] != pd_[k]:
                want[k] = "changed"
        for ml in (8_000_000, 0):   # merge-task path, then join path
            got = (snapshot_diff(rd.from_arrow(new).repartition(3),
                                 rd.from_arrow(prior).repartition(2),
                                 merge_limit=ml)
                   .to_pandas().set_index("doc_id")["change"].to_dict())
            assert got == want, (trial, ml)


def test_span_transitions_randomized_matches_bruteforce(ray_session):
    """span_transitions against a pure-Python offset-sorted bigram
    count over seeded random interleaved docs (shuffled storage order,
    null kinds, empty docs)."""
    from collections import Counter

    import numpy as np
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        span_transitions,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    rng = np.random.default_rng(31)
    kinds = ["text", "image", "audio", None]
    docs, want = [], Counter()
    for d in range(30):
        n = int(rng.integers(0, 6))
        ks = [kinds[i] for i in rng.integers(0, len(kinds), n)]
        for a, b in zip(ks, ks[1:]):
            want[(a, b)] += 1
        order = rng.permutation(n)
        docs.append([{"kind": ks[i], "text": None, "media_ref": None,
                      "offset": int(i)} for i in order])
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(30)], pa.string()),
        "spans": pa.array(docs, pa.list_(span_t)),
    })
    import pandas as pd

    got = span_transitions(rd.from_arrow(tbl).repartition(4)).to_pandas()
    got_map = {}
    for r in got.itertuples():
        kf = None if pd.isna(r.kind_from) else r.kind_from
        kt = None if pd.isna(r.kind_to) else r.kind_to
        got_map[(kf, kt)] = r.n
    assert got_map == dict(want)


def test_minhash_incremental_planted(ray_session):
    """Cross-side near-dups surface (exact dup at jaccard 1.0, a
    one-token edit above threshold); same-side near-dups and
    dissimilar cross pairs never appear; overlapping id spaces are
    kept apart by the side tag."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        minhash_incremental,
    )

    # 60 distinct tokens: a one-token edit changes 5 of 56 shingles,
    # jaccard = 51/61 ~ 0.836 >= 0.8 (20 tokens would give ~0.52)
    base = " ".join(f"tok{i:02d}" for i in range(60))
    prior = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            base,                                   # near-dup target
            "totally different words entirely here about other things "
            "and more of them to fill the shingle window",
            base + " phi",                          # prior-side near-dup of 1
        ], pa.string())})
    new = pa.table({
        "doc_id": pa.array([1, 10, 11], pa.int64()),   # id 1 overlaps
        "text": pa.array([
            base,                                   # exact dup of prior 1
            base.replace("tok30", "edited"),        # near-dup of prior 1
            "unrelated new content about crawling the web at scale "
            "with ray data and arrow batches for a while longer",
        ], pa.string())})
    got = minhash_incremental(
        rd.from_arrow(new).repartition(2),
        rd.from_arrow(prior)).to_pandas()
    pairs = set(zip(got["doc_new"], got["doc_prior"]))
    # every cross pair against prior 1 and its prior twin 3
    assert (1, 1) in pairs and (10, 1) in pairs
    assert (1, 3) in pairs and (10, 3) in pairs
    assert len(got) == 4
    exact = got[(got["doc_new"] == 1) & (got["doc_prior"] == 1)]
    assert float(exact["jaccard"].iloc[0]) == 1.0
    # prior-prior pair (1,3) is same-side: absent by construction
    assert (got["jaccard"] >= 0.8).all()


def test_triangle_count_broadcast_matches_distributed(ray_session):
    """The numpy census fast path, the join plan, and the
    over-wedge-budget fallback all produce the identical
    (n_wedges, n_triangles, gcc_ppm) row on a messy random graph
    (duplicates, reversals, self-loops)."""
    import numpy as np
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import triangle_count

    rng = np.random.default_rng(11)
    s = rng.integers(0, 60, 400)
    d = rng.integers(0, 60, 400)
    edges = pa.table({
        "src": pa.array([f"u{x}" for x in s], pa.string()),
        "dst": pa.array([f"u{x}" for x in d], pa.string())})

    def census(**kw):
        out = triangle_count(rd.from_arrow(edges).repartition(3), **kw)
        return out.to_pydict()

    fast = census(distributed=False)
    assert fast == census(distributed=True)
    # a wedge budget of 1 forces the broadcast path to decline and
    # fall through to the join plan — same numbers
    assert fast == census(distributed=False, wedge_budget=1)
    assert fast["n_triangles"][0] > 0       # non-degenerate fixture


def test_incremental_dedup_broadcast_matches_join(ray_session):
    """The broadcast is_in fast path and the native left_anti join
    keep the identical survivor set; an empty prior run keeps
    everything (one row per distinct new text)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.dedup import (
        incremental_dedup,
    )

    prior_tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["p0", "p1", "p2", "shared"], pa.string())})
    new_tbl = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(["shared", "n0", "n0", "n1"], pa.string())})

    def run(**kw):
        out = incremental_dedup(rd.from_arrow(new_tbl).repartition(2),
                                rd.from_arrow(prior_tbl),
                                **kw).to_pandas()
        return (out.sort_values("content_hash")
                .reset_index(drop=True))

    a, b = run(distributed=False), run(distributed=True)
    assert a.equals(b)
    by_id = a.set_index("doc_id")
    assert sorted(a["doc_id"]) == [11, 13]   # "shared" dropped
    assert int(by_id.loc[11, "n_dups"]) == 2  # both n0 rows collapse

    empty_prior = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    kept = incremental_dedup(rd.from_arrow(new_tbl), empty_prior,
                             distributed=False).to_pandas()
    assert len(kept) == 3
    assert int(kept["n_dups"].sum()) == 4


def test_lang_mix(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import lang_mix

    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s1", "s1", "s2"], pa.string()),
        "lang": pa.array(["en", "en", "de", "zh"], pa.string()),
    })).repartition(2)
    got = {(r["source"], r["lang"]): (r["n_docs"], r["share_ppm"])
           for r in lang_mix(docs).take_all()}
    assert got == {("s1", "en"): (2, 666666), ("s1", "de"): (1, 333333),
                   ("s2", "zh"): (1, 1000000)}


def test_domain_mix(ray_session):
    """Hand-computed sqrt flattening: tokens 9/1 -> isqrt 3/1 ->
    weights 750000/250000 ppm vs raw shares 900000/100000 (the small
    domain is upweighted); all integer floor division."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import domain_mix

    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        "text": pa.array(["a b c d e", "f g h i", "x"], pa.string()),
    })).repartition(2)
    got = {r["source"]: (r["n_docs"], r["n_tokens"],
                         r["token_share_ppm"], r["weight_ppm"])
           for r in domain_mix(docs).take_all()}
    assert got == {"s1": (2, 9, 900000, 750000),
                   "s2": (1, 1, 100000, 250000)}


def test_domain_mix_sample(ray_session):
    """tokens s1=9, s2=1 -> isqrt 3/1, tot 4.  budget 2: quotas
    s1 = 3*2//4 = 1, s2 = 2//4 = 0 -> exactly the lowest-md5 s1 doc
    survives.  budget 8: quotas 6/2 -> everything survives (rank
    bounded by n_docs)."""
    import hashlib

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sampling import (
        domain_mix_sample,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "source": pa.array(["s1", "s1", "s1", "s2"], pa.string()),
        "text": pa.array(["w x y z", "p q r s", "m", "k"], pa.string()),
    })).repartition(2)
    got = {r["doc_id"]: (r["source"], r["rank"])
           for r in domain_mix_sample(docs, budget_docs=2).take_all()}
    first_s1 = min(["a", "b", "c"],
                   key=lambda d: (hashlib.md5(d.encode()).hexdigest(), d))
    assert got == {first_s1: ("s1", 1)}
    got8 = {r["doc_id"] for r in
            domain_mix_sample(docs, budget_docs=8).take_all()}
    assert got8 == {"a", "b", "c", "d"}


def test_cdc_chunk_stats(ray_session):
    """Engine == scalar twin exactly, plus the CDC property the op
    exists for: a prefix INSERTION leaves later chunks aligned (the
    shifted copy still shares dup chunks with the original), which
    fixed-window chunking would destroy."""
    import ray.data as rd

    from govuk_crawler_worker_ray.goldens import cdc_stats_scalar
    from govuk_crawler_worker_ray.pipelines.dedup import cdc_chunk_stats

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the long synthetic corpus paragraph " * 8)
    other = ("completely different content with its own byte stream "
             "statistics, unrelated to the fox paragraph entirely " * 8)
    ids = [1, 2, 3, 4]
    texts = [base, base, "zzz-inserted-prefix " + base, other]
    got = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_ppm"])
           for r in cdc_chunk_stats(
               rd.from_arrow(pa.table({
                   "doc_id": pa.array(ids, pa.int64()),
                   "text": pa.array(texts, pa.string()),
               })).repartition(2)).take_all()}
    want_t = cdc_stats_scalar(ids, texts)
    want = {d: (n, du, p) for d, n, du, p in zip(
        want_t["doc_id"].to_pylist(), want_t["n_chunks"].to_pylist(),
        want_t["n_dup_chunks"].to_pylist(),
        want_t["dup_ppm"].to_pylist())}
    assert got == want
    assert got[1][2] == 1_000_000        # identical docs: fully dup
    assert got[3][1] > 0                 # shifted copy re-aligns
    assert got[4][1] == 0                # unrelated: no dup chunks

    # the distributed-join fallback (heavily-duplicated corpus above
    # broadcast_limit) must agree with the broadcast path bit-exactly,
    # including docs with zero dup chunks (the union-of-partials shape)
    got_j = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"],
                           r["dup_ppm"])
             for r in cdc_chunk_stats(
                 rd.from_arrow(pa.table({
                     "doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string()),
                 })).repartition(2), broadcast_limit=0).take_all()}
    assert got_j == want

    # empty and sub-window docs survive both paths (one empty chunk /
    # one whole-doc chunk per spec)
    ids2, texts2 = [7, 8, 9], ["", "abc", ""]
    want2_t = cdc_stats_scalar(ids2, texts2)
    want2 = {d: (n, du, p) for d, n, du, p in zip(
        want2_t["doc_id"].to_pylist(), want2_t["n_chunks"].to_pylist(),
        want2_t["n_dup_chunks"].to_pylist(),
        want2_t["dup_ppm"].to_pylist())}
    for bl in (2_000_000, 0):
        got2 = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"],
                              r["dup_ppm"])
                for r in cdc_chunk_stats(
                    rd.from_arrow(pa.table({
                        "doc_id": pa.array(ids2, pa.int64()),
                        "text": pa.array(texts2, pa.string()),
                    })), broadcast_limit=bl).take_all()}
        assert got2 == want2, bl
    assert want2[7] == (1, 1, 1_000_000)  # two empty docs share the
    assert want2[8] == (1, 0, 0)          # empty chunk; "abc" unique


def test_gap_fill_hourly(ray_session):
    """Missing hours appear with n_events = 0 across every type; the
    grid spans the GLOBAL min..max bucket."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        gap_fill_hourly,
    )

    h = 3600 * 1_000_000
    ev = rd.from_arrow(pa.table({
        "ts": pa.array([0 * h, 2 * h, 1 * h], pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b"], pa.string()),
    }))
    got = {(r["event_type"], r["bucket"]): r["n_events"]
           for r in gap_fill_hourly(ev).take_all()}
    assert got == {("a", 0): 1, ("a", 1): 0, ("a", 2): 1,
                   ("b", 0): 0, ("b", 1): 1, ("b", 2): 0}


def test_moving_avg(ray_session):
    """k=3 ROWS frame: ramp-up windows at the head, exact integer
    micros throughout."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import moving_avg

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
    })).repartition(2)
    rows = sorted(moving_avg(ev).take_all(),
                  key=lambda r: r["event_id"])
    assert [r["win_sum_micros"] for r in rows] == [
        1_000_000, 3_000_000, 7_000_000, 14_000_000]
    assert [r["win_n"] for r in rows] == [1, 2, 3, 3]
    assert [r["avg_micros"] for r in rows] == [
        1_000_000, 1_500_000, 2_333_333, 4_666_666]


def test_table_profile(ray_session):
    """Nulls counted, native-type extrema (numeric min is numeric, not
    lexicographic), inapplicable sides NULL."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        table_profile,
    )

    t = pa.table({
        "doc_id": pa.array([9, 10, None], pa.int64()),
        "n_chars": pa.array([5, 2, 7], pa.int64()),
        "text": pa.array(["b", None, "a"], pa.string()),
        "lang": pa.array(["en", "de", "en"], pa.string()),
        "source": pa.array(["s", "s", "s"], pa.string()),
    })
    got = {r["column"]: r for r in table_profile(
        rd.from_arrow(t).repartition(2)).take_all()}
    d = got["doc_id"]
    assert (d["n_rows"], d["n_nulls"], d["min_int"], d["max_int"]) == \
        (3, 1, "9", "10")  # numeric agg first: 9 < 10, not '10' < '9'
    assert d["min_str"] == "" and d["max_str"] == ""
    x = got["text"]
    assert (x["n_nulls"], x["min_str"], x["max_str"]) == (1, "a", "b")
    assert x["min_int"] == ""


def test_winsorize(ray_session):
    """Exact quantile_disc thresholds over the distinct-value
    histogram; clip is two vectorized compares."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import winsorize

    vals = [float(i) for i in range(1, 21)]  # 1..20
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(range(20), pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(3)
    got = {r["event_id"]: r["clipped_micros"]
           for r in winsorize(ev, lo=0.25, hi=0.75).take_all()}
    # quantile_disc(.25) of 1..20 = element ceil(.25*20)-1 = idx 4 -> 5
    # quantile_disc(.75) = idx 14 -> 15
    assert got[0] == 5_000_000 and got[3] == 5_000_000
    assert got[4] == 5_000_000      # value 5 at the low threshold
    assert got[9] == 10_000_000     # untouched middle
    assert got[19] == 15_000_000    # clipped high


def test_assemble_features(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        assemble_features,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the fox " * 30, "x"], pa.string()),
        "lang": pa.array(["en", "de"], pa.string()),
    }))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "label": pa.array([7, 9], pa.int32()),
    }))
    got = {r["doc_id"]: r for r in
           assemble_features(docs, emb, num_partitions=2).take_all()}
    assert got[0]["n_tokens"] == 60 and got[0]["label"] == 7
    assert got[0]["quality_points"] == 10  # len ok + stopwords + punct
    assert got[1]["quality_points"] == 2   # only punct sanity
    assert got[1]["lang"] == "de"


def test_compact_files(ray_session, tmp_path):
    """Compaction is lossless and actually reduces file count."""
    import glob

    import pyarrow.parquet as pqt
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.sink import compact_files

    src = str(tmp_path / "shattered")
    rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "n_chars": pa.array(range(100), pa.int64()),
    })).repartition(25).write_parquet(src)
    assert len(glob.glob(src + "/*.parquet")) >= 10
    dest = str(tmp_path / "compacted")
    back = compact_files(src, dest, rows_per_file=50).to_pandas()
    assert len(glob.glob(dest + "/*.parquet")) <= 4
    assert sorted(back["doc_id"].tolist()) == list(range(100))


def test_c4_curation_recipe(ray_session):
    """The composite applies the gate on the SCRUBBED text, dedups by
    scrubbed content (two docs differing only in masked PII collapse),
    keeps the min doc_id, and tags the split."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.recipes import c4_curation

    base = ("the and of a to in is " * 20).strip()      # quality 10
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "text": pa.array([
            base + " contact alice@example.com",        # dup after
            base + " contact bob@sample.org",           # scrubbing
            "short",                                    # gated out
        ], pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
    }))
    got = c4_curation(docs).to_pandas()
    assert got["doc_id"].tolist() == [1]   # min doc_id of the dup pair
    assert got["quality_points"].iloc[0] >= 6
    assert got["split"].iloc[0] in {"train", "val", "test"}


def test_interleaved_curation(ray_session):
    """Gate + winner-only keep: a gated-out gallery vanishes, the dup
    pair keeps only its min doc_id, and an all-gated-out corpus
    returns a typed empty relation (no join crash)."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_curation,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    good = [sp("text", "x" * 40, None, 0), sp("image", None, "m:1", 1)]
    docs = pa.table({
        "doc_id": pa.array(["b", "a", "gallery"], pa.string()),
        "spans": pa.array([
            good, list(good),                       # exact dup pair
            [sp("image", None, "m:2", 0)],          # gated out
        ], pa.list_(span_t)),
    })
    got = interleaved_curation(rd.from_arrow(docs)).to_pandas()
    assert got["doc_id"].tolist() == ["a"]

    empty = pa.table({
        "doc_id": pa.array(["g"], pa.string()),
        "spans": pa.array([[sp("image", None, "m:9", 0)]],
                          pa.list_(span_t)),
    })
    assert interleaved_curation(rd.from_arrow(empty)).count() == 0


def test_review_fixes_session9(ray_session, tmp_path):
    """Regressions from the session-9 review: winsorize on an empty
    input returns a typed empty relation; interleaved_dedup excludes
    zero-span docs (oracle unnest semantics); compact_files refuses
    overlapping src/dest; pagerank/bfs_depth return a Dataset from the
    broadcast path too."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.graph import (
        bfs_depth,
        pagerank,
    )
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_dedup,
    )
    from govuk_crawler_worker_ray.pipelines.relational import winsorize
    from govuk_crawler_worker_ray.pipelines.sink import compact_files

    empty_ev = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64())}))
    w = winsorize(empty_ev)
    assert isinstance(w, rd.Dataset) and w.count() == 0

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array(["has", "none"], pa.string()),
        "spans": pa.array(
            [[{"kind": "text", "text": "x", "media_ref": None,
               "offset": 0}], []], pa.list_(span_t)),
    })
    dd = interleaved_dedup(rd.from_arrow(docs)).to_pandas()
    assert dd["min_doc_id"].tolist() == ["has"]  # zero-span excluded

    src = str(tmp_path / "t")
    rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())})
                  ).write_parquet(src)
    for bad in (src, str(tmp_path / "t" / "sub"), str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps"):
            compact_files(src, bad)

    e = rd.from_arrow(pa.table({"src": pa.array(["a"]),
                                "dst": pa.array(["b"])}))
    assert isinstance(pagerank(e, iterations=1), rd.Dataset)
    s = rd.from_arrow(pa.table({"url": pa.array(["a"])}))
    assert isinstance(bfs_depth(e, s), rd.Dataset)


def test_percent_rank_docs(ray_session):
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.relational import (
        percent_rank_docs,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", "a b", "a"], pa.string()),
    }))
    got = {r["doc_id"]: (r["pos"], r["pct_ppm"])
           for r in percent_rank_docs(docs).take_all()}
    assert got == {1: (1, 0), 2: (2, 500000), 3: (3, 1000000)}


def test_advice_r4_fixes(ray_session):
    """Round-4 ADVICE regressions: interleaved_dedup aligns per-doc
    span slices through list_parent_indices (null spans entries and
    non-zero-offset slices are legal Arrow); event_transitions keeps
    NULL src_type groups (SQL GROUP BY semantics); nonempty_blocks
    survives the loss of Ray's private bundle APIs via its public
    fallback."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines import blocks
    from govuk_crawler_worker_ray.pipelines.multimodal import (
        interleaved_dedup,
    )
    from govuk_crawler_worker_ray.pipelines.relational import (
        event_transitions,
    )

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    seq = [sp("text", "hello", None, 0), sp("image", None, "m:1", 1)]
    other = [sp("text", "bye", None, 0)]
    docs = pa.table({
        "doc_id": pa.array(["a", "nullsp", "b", "c"], pa.string()),
        "spans": pa.array([seq, None, other, seq], pa.list_(span_t)),
    })
    # a NULL spans entry between valid ones, AND a sliced table whose
    # ListArray offsets do not start at 0 — both must digest the same
    # sequences as the contiguous layout (list_flatten is rebased and
    # null-skipping; raw offsets are neither)
    for tbl in (docs, docs.slice(1).combine_chunks()):
        got = (interleaved_dedup(rd.from_arrow(tbl)).to_pandas()
               .sort_values("min_doc_id").reset_index(drop=True))
        assert "nullsp" not in set(got["min_doc_id"])
        by_min = dict(zip(got["min_doc_id"], got["n_docs"]))
        if tbl is docs:
            assert by_min == {"a": 2, "b": 1}
        else:
            assert by_min == {"b": 1, "c": 1}

    ts = pa.array([1, 2, 3, 4], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": ts,
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "event_type": pa.array(["view", None, "view", "click"],
                               pa.string()),
    }))
    got = {(r["src_type"], r["dst_type"]): r["n_trans"]
           for r in event_transitions(ev, num_partitions=2).take_all()}
    # the NULL src row (view->NULL's successor: NULL->view) is a kept
    # group; view->NULL itself is filtered (dst IS NOT NULL), matching
    # the oracle's LEAD + WHERE shape
    assert got == {(None, "view"): 1, ("view", "click"): 1}

    src = rd.from_arrow(pa.table({"k": pa.array(["x", "y"]),
                                  "v": pa.array([1, 2], pa.int64())}))
    from ray.data.aggregate import Count
    grp = src.groupby("k").aggregate(Count(alias_name="n"))
    import ray.data.dataset as rds
    orig = rds.MaterializedDataset.iter_internal_ref_bundles

    # simulate a Ray upgrade that removes the PRIVATE bundle API while
    # the public to_arrow_refs keeps working: raise only for the call
    # from blocks.py (in 2.49 to_arrow_refs happens to delegate to the
    # same private method internally — a future Ray would reimplement
    # the public API, not drop it)
    def gated(self):
        import inspect

        if inspect.stack()[1].filename.endswith("blocks.py"):
            raise AttributeError("simulated removal")
        return orig(self)

    try:
        rds.MaterializedDataset.iter_internal_ref_bundles = gated
        out = blocks.nonempty_blocks(grp)
        assert out is not None and out.count() == 2
        # the fallback must normalize relations of ANY size: no
        # zero-row (possibly zero-schema) block survives
        for bd in out.materialize().iter_internal_ref_bundles():
            for _, meta in bd.blocks:
                assert meta.num_rows
        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
        assert blocks.nonempty_blocks(empty) is None
    finally:
        rds.MaterializedDataset.iter_internal_ref_bundles = orig


def test_driver_histogram_guard(ray_session):
    """The shared driver-side histogram guard (global_rank / winsorize /
    quality_filter route through it) fails loudly past the bound
    instead of pulling an uncompressible key domain onto the driver."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from govuk_crawler_worker_ray.pipelines.blocks import (
        driver_histogram,
    )

    agg = (rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
           .groupby("k").aggregate(Count(alias_name="n")))
    with pytest.raises(ValueError, match="histogram-compressible"):
        driver_histogram(agg, "test_op", bound=2)
    h = driver_histogram(agg, "test_op", bound=3)
    assert len(h) == 3


def test_ngram_bucketed_middle_regime(ray_session, monkeypatch):
    """Planted MIDDLE-regime corpus (large alphabet x dense
    similarity): mode="bucketed" equals the all-pairs bruteforce, with
    multiple size blocks (tiny _BUCKET_ROWS), the block-level size
    filter skipping far buckets, AND both block-pair kernels (the
    inverted-index count on the sparse CJK corpus; the dense local
    matmul on a small-alphabet template corpus where the cost model
    flips)."""
    import random

    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines import dedup

    rng = random.Random(7)
    # large alphabet: CJK-range codepoints inflate distinct trigrams
    # far past _DENSE_MAX_ALPHABET; dense similarity: mutation families
    alpha = [chr(0x4E00 + i) for i in range(600)]
    texts = []
    for _ in range(12):
        base = "".join(rng.choice(alpha)
                       for _ in range(rng.randint(20, 120)))
        texts.append(base)
        for _ in range(3):  # near-dup family
            i = rng.randrange(len(base))
            texts.append(base[:i] + rng.choice(alpha) + base[i:])
    # plus short outliers the block size filter prunes against the rest
    texts.extend("".join(rng.choice(alpha) for _ in range(4))
                 for _ in range(6))
    tmap = dict(enumerate(texts))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(4)
    monkeypatch.setattr(dedup, "_BUCKET_ROWS", 8)
    want = {t: dedup.ngram_jaccard_bruteforce(tmap, t, 3)
            for t in (0.4, 0.7)}
    for t in (0.4, 0.7):
        out = dedup.ngram_jaccard_dedup(ds, threshold=t, n=3,
                                        mode="bucketed")
        got = list(zip(out["doc_a"].to_pylist(),
                       out["doc_b"].to_pylist(),
                       out["jaccard"].to_pylist()))
        assert got == want[t], t
    # dense-kernel coverage: a tiny-alphabet template corpus makes the
    # cost model pick the local matmul inside the same bucketed path
    t2 = ["abcabcabc" + "abc" * k for k in range(8)] * 2
    tmap2 = dict(enumerate(t2))
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(t2)), pa.int64()),
        "text": pa.array(t2, pa.string())}))
    out = dedup.ngram_jaccard_dedup(ds2, threshold=0.4, n=3,
                                    mode="bucketed")
    got = list(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist(),
                   out["jaccard"].to_pylist()))
    assert got == dedup.ngram_jaccard_bruteforce(tmap2, 0.4, 3)


def test_advice_r5_null_source_groups(ray_session):
    """Round-5 ADVICE: source_token_detail's per-batch pandas combiner
    must keep NULL-source docs as their own group (dropna=False),
    matching the domain_mix / lang_mix DuckDB twins' GROUP BY source
    (SQL keeps NULL groups) — the same latent parity gap
    event_transitions fixed for src_type."""
    import ray.data as rd

    from govuk_crawler_worker_ray.pipelines.text_analysis import (
        domain_mix,
        source_token_detail,
    )

    t = pa.table({
        "source": pa.array(["a", None, "a", None, "b"]),
        "text": pa.array(["x y", "one two three", "z", "w", "q r s t"]),
    })
    det = {r["source"]: (r["n_docs"], r["n_tokens"])
           for r in source_token_detail(rd.from_arrow(t)).take_all()}
    assert det == {"a": (2, 3), "b": (1, 4), None: (2, 4)}
    # the downstream mixers consume the NULL group without crashing
    # and its exact-ppm shares cover it
    mix = {r["source"]: r["token_share_ppm"]
           for r in domain_mix(rd.from_arrow(t)).take_all()}
    assert mix[None] == 4 * 1_000_000 // 11
