"""The driver consumes bench.py's single JSON line — pin the contract."""

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = {**os.environ, "GRAFT_SF_DIR": "/root/testdata/sf0.001",
           "RAY_GRAFT_CPUS": "4", "GCW_BENCH_PAGES": "120",
           "GCW_REST_SEC": "0"}
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    # the driver's tail window is ~2 KB; round 3 overflowed it
    # (BENCH_r03 parsed:null) — pin the final line compact forever
    assert len(last) < 1800, f"final line too long: {len(last)} chars"
    d = json.loads(last)
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["num_cpus"] == 4 and d["sf"] == 0.001
    assert "crawl" in d["queries"]
    assert d["crawl_detail"]["fetched"] > 0
    # the FULL per-query map lands in bench_queries.json
    with open("/root/repo/bench_queries.json") as f:
        qfile = json.load(f)
    assert d["n_queries"] == len(qfile["queries"])
    assert set(d["queries"]) <= set(qfile["queries"])
    assert qfile["crawl_detail"]["fetched"] == d["crawl_detail"]["fetched"]
