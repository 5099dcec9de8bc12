"""Pure-Python sequential oracle of the reference crawl semantics.

This is the golden producer (FIXTURES.md F8): a direct, single-threaded
transcription of the reference's per-item journey (SURVEY.md §3.2) over
the synthetic corpus, against which the Ray Data engine's round-based
pipeline is compared (final seen set, crawl order, mirror contents).

Control flow mirrors /root/reference/workflow.go + http_crawler/crawler.go;
scalar semantics come from ``functions`` (themselves pinned by the
reference's unit specs in tests/test_urls.py, tests/test_extract.py).
Extraction here uses the HTML path — the engine uses the span path — so
oracle-vs-engine equality also re-proves span/html extraction parity on
every page of every crawl.

Ordering model: the queue-driven FIFO loop is serialized as BSP rounds
(SURVEY.md §3.4, §7.4): requeued/deferred rows keep their discovery seq
and therefore precede newly published links in the next round.  This is
the deterministic serialization the north rule's "reproduces crawl
ordering" is defined against (the reference's own order is racy across
its 4 fetch goroutines).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .functions.content_types import (
    ACCEPTED_CONTENT_TYPES,
    HTML,
    parse_content_type,
)
from .functions.extract import extract_links_from_html
from .functions.redirects import is_redirect, synthesize_redirect_body
from .functions.urls import (
    has_params,
    is_allowed_host,
    is_blacklisted,
    netloc_host,
    parse_url,
    publish_gate_params,
    relative_file_path,
    url_digest,
)


@dataclass
class OracleResult:
    # (round, seq, url) for every successful, content-accepted fetch
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    # mirror_path -> (url, body); last write wins (filesystem semantics)
    mirror: dict[str, tuple[str, str]] = field(default_factory=dict)
    # digest hex -> final status
    seen: dict[str, int] = field(default_factory=dict)
    # URLs published to the frontier, in publish order
    published: list[str] = field(default_factory=list)
    # per-round outcome counters
    metrics: list[dict] = field(default_factory=list)
    rounds: int = 0


def _digest(url: str, cfg: CrawlConfig) -> str:
    return url_digest(url, cfg.digest).hex()


def oracle_fetch(row: dict | None, attempt: int):
    """Status dispatch of http_crawler/crawler.go:84-109 against a corpus
    row.  ``attempt`` is the 1-based fetch ordinal for this URL;
    transient rows succeed from the second attempt on (deterministic
    stand-in for flaky origins).

    Returns (outcome, content_type, body, spans):
    outcome in {ok, requeue_429, requeue_5xx, not_found, error}.
    """
    if row is None:
        # no such origin resource: connection-level error -> reject
        return ("error", None, None, None)
    status = int(row["status_code"])
    if row.get("transient") and attempt >= 2:
        status = 200
    if status == 429:
        return ("requeue_429", None, None, None)
    if 500 <= status <= 599:
        return ("requeue_5xx", None, None, None)
    if status == 404:
        return ("not_found", None, None, None)
    if is_redirect(status):
        loc = row["redirect_location"] or ""
        body = synthesize_redirect_body(loc)
        spans = [{"kind": "link", "text": loc, "media_ref": loc,
                  "offset": 0}]
        return ("ok", "text/html", body, spans)
    return ("ok", row["content_type"], row["body"] or "", row["spans"])


def crawl_oracle(
    corpus: dict[str, dict],
    seeds: list[str],
    cfg: CrawlConfig,
    seed_priorities: list[int] | None = None,
) -> OracleResult:
    """Run the full crawl sequentially.  ``corpus`` maps exact URL string
    -> corpus row dict (schemas.CORPUS_SCHEMA fields)."""
    res = OracleResult()
    allowed_hosts = []
    for r in cfg.root_urls:
        p = parse_url(r)
        if p is not None:
            allowed_hosts.append(netloc_host(p.netloc))
    seen = res.seen
    robots = {}
    if cfg.respect_robots:
        from .functions.urls import host_only
        from .state.robots import parse_robots, robots_url

        for h in allowed_hosts:
            row = corpus.get(robots_url(host_only(h)))
            if row is not None:
                robots[host_only(h)] = parse_robots(row["body"] or "")

    # Logical TTL clock: entries written at round k expire once the
    # clock passes write_time + ttl; with seconds_per_round > 0 this can
    # happen MID-crawl (the reference's 12h TTL against a long crawl).
    expiry: dict[str, float] = {}

    def seen_get(d: str, now_t: float) -> int:
        if d in seen and expiry.get(d, float("inf")) <= now_t:
            del seen[d]
        return seen.get(d, 0)

    def seen_put(d: str, v: int, now_t: float) -> None:
        seen[d] = v
        expiry[d] = now_t + cfg.ttl_expire_seconds

    # frontier rows: (seq, url, attempt_so_far, priority)
    pr = seed_priorities or [0] * len(seeds)
    frontier = [(i, u, 0, int(pr[i])) for i, u in enumerate(seeds)]
    next_seq = len(seeds)
    rnd = 0
    while frontier and rnd < cfg.max_rounds:
        t_now = rnd * cfg.seconds_per_round
        frontier.sort(key=lambda t: (-t[3], t[0]))  # priority desc, FIFO
        m = {"round": rnd, "frontier": len(frontier), "fetched": 0,
             "published": 0, "blacklisted": 0, "rejected": 0,
             "requeued": 0, "non_accepted": 0, "deferred": 0,
             "aborted_retries": 0, "robots_excluded": 0}
        process, deferred = [], []
        if cfg.per_host_budget is not None:
            per_host: dict[str, int] = {}
            for row in frontier:
                p = parse_url(row[1])
                h = netloc_host(p.netloc) if p else ""
                if per_host.get(h, 0) < cfg.per_host_budget:
                    per_host[h] = per_host.get(h, 0) + 1
                    process.append(row)
                else:
                    deferred.append(row)
            m["deferred"] = len(deferred)
        else:
            process = frontier
        next_frontier: list[tuple[int, str, int]] = list(deferred)

        for seq, url, attempt, prio in process:
            # P1 ReadFromQueue: blacklist gate (workflow.go:40-44)
            if is_blacklisted(url, cfg.blacklist_paths):
                m["blacklisted"] += 1
                continue
            # P2 CrawlURL (workflow.go:77-143)
            parts = parse_url(url)
            if parts is None:
                m["rejected"] += 1
                continue
            if robots:
                from .functions.urls import host_only

                rules = robots.get(host_only(netloc_host(parts.netloc)))
                if rules is not None and not rules.allowed(parts.path):
                    m["robots_excluded"] += 1
                    continue
            d = _digest(url, cfg)
            crawl_count = seen_get(d, t_now)
            if crawl_count > cfg.max_crawl_retries:
                m["aborted_retries"] += 1
                continue
            host = netloc_host(parts.netloc)
            if not is_allowed_host(host, allowed_hosts):
                m["rejected"] += 1  # ErrCannotCrawlURL (crawler.go:55-57)
                continue
            outcome, ct, body, _spans = oracle_fetch(corpus.get(url),
                                                     attempt + 1)
            if outcome == "requeue_429":
                if (cfg.give_up_429_after is not None
                        and attempt + 1 > cfg.give_up_429_after):
                    m["rejected"] += 1
                    continue
                next_frontier.append((seq, url, attempt + 1, prio))
                m["requeued"] += 1
                continue
            if outcome == "requeue_5xx":
                seen_put(d, seen_get(d, t_now) + 1, t_now)  # INCR
                next_frontier.append((seq, url, attempt + 1, prio))
                m["requeued"] += 1
                continue
            if outcome in ("not_found", "error"):
                m["rejected"] += 1
                continue
            mime = parse_content_type(ct)
            if mime not in ACCEPTED_CONTENT_TYPES:
                # ack + reset to ReadyToEnqueue (workflow.go:129-140)
                seen_put(d, 0, t_now)
                m["non_accepted"] += 1
                continue
            m["fetched"] += 1
            res.crawl_order.append((rnd, seq, url))
            # P3 WriteItemToDisk (workflow.go:153-216)
            if not has_params(url):
                mp = relative_file_path(url, mime)
                if mp is None:
                    m["rejected"] += 1
                    continue
                res.mirror[mp] = (url, body)
            if mime != HTML:
                continue  # ack, not forwarded (workflow.go:201-207)
            # P4 ExtractURLs (workflow.go:218-252) — HTML path
            links = extract_links_from_html(body, parts.scheme, host,
                                            allowed_hosts,
                                            cfg.blacklist_paths)
            if links is None:
                m["rejected"] += 1
                continue
            # P5 PublishURLs (workflow.go:254-296)
            for link in links:
                if not publish_gate_params(link):
                    continue
                dl = _digest(link, cfg)
                if seen_get(dl, t_now) >= 1:
                    continue
                seen_put(dl, 1, t_now)
                next_frontier.append((next_seq, link, 0, 0))
                next_seq += 1
                res.published.append(link)
                m["published"] += 1
            # P6 ack
        res.metrics.append(m)
        frontier = next_frontier
        rnd += 1
    res.rounds = rnd
    return res
