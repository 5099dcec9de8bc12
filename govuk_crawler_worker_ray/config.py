"""Crawler configuration.

Field names/defaults mirror the reference's env-var table
(/root/reference/main.go:22-38) so a user of the reference can map their
deployment config 1:1.  Parsing of ``BLACKLIST_PATHS`` reproduces
``splitPaths`` (/root/reference/main.go:154-167) — a comma split with NO
trimming (the reference's "trim" loop copies verbatim).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_BLACKLIST = "/search,/government/uploads"
DEFAULT_ROOT_URLS = "https://www.gov.uk/"

# Seen-set status encoding (/root/reference/workflow.go:18-19); values > 1
# are 5XX retry counters produced by INCR (/root/reference/workflow.go:107).
READY_TO_ENQUEUE = 0
ENQUEUED = 1

VERSION_NUMBER = "0.2.0"  # /root/reference/main.go:40


def split_paths(paths: str) -> list[str]:
    """Comma-split with no trimming (/root/reference/main.go:154-167)."""
    return paths.split(",")


def split_root_urls(urls: str) -> list[str]:
    """ROOT_URLS parsing (/root/reference/main.go:76-86): comma split."""
    return [u for u in urls.split(",") if u]


_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)(h|m|s|ms)")
_DURATION_UNITS = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}


def parse_duration(s: str) -> float:
    """Go-style duration string ("12h", "30m", "1h30m") -> seconds
    (TTL_EXPIRE_TIME parse, /root/reference/main.go:88-91)."""
    parts = _DURATION_RE.findall(s)
    if not parts or "".join(n + u for n, u in parts) != s:
        raise ValueError(f"invalid duration: {s!r}")
    return sum(float(n) * _DURATION_UNITS[u] for n, u in parts)


@dataclass
class CrawlConfig:
    """All knobs of the engine, reference-parity defaults."""

    root_urls: list[str] = field(
        default_factory=lambda: split_root_urls(DEFAULT_ROOT_URLS))
    blacklist_paths: list[str] = field(
        default_factory=lambda: split_paths(DEFAULT_BLACKLIST))
    # CRAWLER_THREADS (/root/reference/main.go:26) -> fetch actor-pool size.
    crawler_threads: int = 4
    # MAX_CRAWL_RETRIES (/root/reference/main.go:29, workflow.go:93-98).
    max_crawl_retries: int = 4
    # TTL_EXPIRE_TIME (/root/reference/main.go:35) in seconds (logical time).
    ttl_expire_seconds: float = 12 * 3600.0
    # Seen-set shard count (north rule: sharded bloom/cuckoo seen set).
    num_seen_shards: int = 8
    # Politeness: max fetches per host per round (north rule; the reference
    # has only the global 429 back-off, workflow.go:108-114). None = no cap.
    per_host_budget: int | None = None
    # Politeness token bucket (north rule's per-host rate limiting as a
    # REAL budget, SURVEY.md §4 rate-limiting row): each host accrues
    # this many fetch tokens per round (unused tokens carry over up to
    # 2x), and a host that returned ANY 429 in round k gets zero tokens
    # in round k+1 — a per-host back-off, unlike the reference's global
    # 5s sleep (workflow.go:109-114).  None = feature off (parity mode).
    host_token_budget: int | None = None
    # Honor robots.txt (north-rule addition; absent in the reference).
    respect_robots: bool = False
    # Round cap for the superstep loop (safety net; 429 rows requeue forever
    # in the reference, workflow.go:108-117).
    max_rounds: int = 50
    # Give up on a URL after this many 429 attempts (engine addition; None =
    # retry forever like the reference, which only counts 5XXs).
    give_up_429_after: int | None = None
    # Write frontier/seen checkpoints every K rounds (1 = every round).
    # Crash recovery resumes from the last checkpointed round.
    checkpoint_every: int = 1
    # Frontier-on-storage rounds (the 10^10 scale path): publish winners
    # are written per SHARD to round=k/frontier/*.parquet with globally
    # dense seqs assigned by a shard-to-shard ordering-key exchange, and
    # fetch work is dispatched as file refs — the driver never holds a
    # round's frontier or winner set (only requeue/dup rows and file
    # paths).  Crawl ordering and the seen set are bit-identical to the
    # default path (tested); politeness budgets and seed priorities work
    # in both modes.  None (the default) = AUTO: start in-memory and
    # hand off to storage rounds the first time a round's frontier
    # exceeds storage_auto_threshold rows, so the driver-bounded path
    # can't silently be shipped to a 1e10 frontier.  True/False force a
    # mode.
    frontier_on_storage: bool | None = None
    # Auto-switch threshold (rows in one round's frontier) for
    # frontier_on_storage=None.  ~56 bytes/narrow row -> the default
    # caps driver frontier memory near 250 MB before handing off.
    storage_auto_threshold: int = 4_000_000
    # Opt-in mirror-sink compaction post-pass: when set, each
    # round=k/fetched directory's per-chunk parts are coalesced into
    # ~this-many-row files at the end of the crawl (order-preserving;
    # see sink.compact_crawl_rounds).  None = off.
    compact_fetched_rows: int | None = None
    # Logical seconds the clock advances per crawl round (0 = frozen
    # time).  The reference's wall clock moves during a crawl, so TTL'd
    # seen entries can expire MID-crawl and re-open URLs; rounds are the
    # engine's time steps.
    seconds_per_round: float = 0.0
    # Digest algorithm for seen-set keys. The reference keys on
    # md5(exact-url-string) (/root/reference/ttl_hash_set/ttl_hash_set.go:202-204);
    # the north rule mandates sha1(canonicalized url). "sha1" is the default
    # scale path; "md5" gives byte-parity with reference fixtures.
    digest: str = "sha1"
    canonicalize: bool = False  # canonicalize before digesting (north rule)
    # Ray sizing knobs.
    fetch_batch_size: int = 4096
    gate_batch_size: int = 16384
    mirror_root: str | None = None  # MIRROR_ROOT (main.go:33,72-74)
    # Fetch-request identity (http_crawler/crawler.go:64-75); carried for
    # API parity — the sandbox fetch is a corpus lookup, a real deployment
    # sets these as HTTP headers/auth exactly like the reference.
    basic_auth_username: str = ""   # BASIC_AUTH_USERNAME (main.go:24)
    basic_auth_password: str = ""   # BASIC_AUTH_PASSWORD (main.go:23)
    rate_limit_token: str = ""      # RATE_LIMIT_TOKEN (main.go:37)


def user_agent(hostname: str = "localhost",
               version: str = VERSION_NUMBER) -> str:
    """The reference's UA string (http_crawler/crawler.go:74-75)."""
    return f"GOV.UK Crawler Worker/{version} on host '{hostname}'"
