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
        KG_BENCH_REPS="1",  # contract smoke, not a measurement
        KG_BENCH_MINHASH_REPLICATE="2",
        KG_BENCH_QUERY_LIMIT="12",  # contract smoke: cap the 130+ sweep
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


def test_stage_walls_parser():
    """The per-stage attribution parser must extract operator elapsed
    times (with unit conversion and duplicate-name disambiguation) from
    the ``Dataset.stats()`` text format."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _stage_walls

    stats = (
        "Operator 1 ReadParquet->SplitBlocks(16): 16 tasks executed, "
        "16 blocks produced in 3.71s\n"
        "* Remote wall time: 1ms min, 2ms max\n"
        "Operator 2 Sort: executed in 250ms\n"
        "Operator 3 Sort: executed in 1.5s\n"
        "Operator 4 Write: 4 tasks executed, 4 blocks produced in 120ms\n"
    )
    walls = _stage_walls(stats)
    assert walls["ReadParquet->SplitBlocks(16)"] == 3.71
    assert walls["Sort"] == 0.25 and walls["Sort#2"] == 1.5
    assert walls["Write"] == 0.12
    assert _stage_walls("no operators here") == {}
