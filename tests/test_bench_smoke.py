"""bench.py smoke: the driver's benchmark harness must run end-to-end and
emit the one-line JSON contract (tiny corpus, subprocess with its own Ray
session — never inside the pytest session)."""

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS="4",
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        KG_BENCH_REPLICATE="5",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus", "kg"):
        assert key in payload, key
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert payload["kg"]["docs"] == 5 * 492
    assert len(payload["queries"]) >= 10
