"""The driver consumes bench.py's single JSON line — pin the contract."""

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = {**os.environ, "GRAFT_SF_DIR": "/root/testdata/sf0.001",
           "RAY_GRAFT_CPUS": "4", "GCW_BENCH_PAGES": "120"}
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=500,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["num_cpus"] == 4 and d["sf"] == 0.001
    assert "crawl" in d["queries"]
    assert d["crawl_detail"]["fetched"] > 0
