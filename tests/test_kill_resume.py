"""True kill/resume: SIGKILL a checkpointed extract mid-run in a separate
process, then resume and assert (a) completed partitions are not
reprocessed and (b) the final graph equals the unkilled result."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

SCRIPT = r"""
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from knowledge_graph_construction_ray.state.checkpoint import extract_to_checkpoint
extract_to_checkpoint(sys.argv[1], sys.argv[2])
ray.shutdown()
"""


@pytest.mark.timeout(300)
def test_sigkill_mid_extract_then_resume(ray_session, fixture_corpus, tmp_path, oracle_graph):
    from knowledge_graph_construction_ray.state.checkpoint import (
        merge_from_checkpoint,
        run_checkpointed,
        split_docs_to_files,
    )

    input_dir = tmp_path / "docs"
    split_docs_to_files(fixture_corpus, str(input_dir), num_files=8)
    ckpt = tmp_path / "work" / "ckpt"
    lineage_dir = ckpt / "_lineage"

    # launch the extract in its own Ray session, 1.2 s/partition, 2 CPUs
    env = dict(os.environ, KG_EXTRACT_SLOWDOWN="1.2", RAY_ADDRESS="local",
               PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT, str(input_dir), str(ckpt)],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait until SOME (but not all 8) partitions committed, then SIGKILL
    deadline = time.time() + 240
    while time.time() < deadline:
        done = len(list(lineage_dir.glob("part-*.json"))) if lineage_dir.exists() else 0
        if 1 <= done <= 6:
            break
        if proc.poll() is not None:
            pytest.fail("extract subprocess finished before it could be killed")
        time.sleep(0.2)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    committed = sorted(p.name for p in lineage_dir.glob("part-*.json"))
    assert 1 <= len(committed) <= 6, committed
    mtimes = {
        p.name: p.stat().st_mtime_ns
        for p in (ckpt / "elements").glob("part-*.parquet")
        if (lineage_dir / p.name.replace(".parquet", ".json")).exists()
    }

    # resume in THIS session (no slowdown): only the missing partitions run
    os.environ.pop("KG_EXTRACT_SLOWDOWN", None)
    report = run_checkpointed(str(input_dir), str(tmp_path / "work"))
    assert report["extract"]["skipped"] == len(committed)
    assert report["extract"]["processed"] == 8 - len(committed)
    for name, mtime in mtimes.items():
        assert (ckpt / "elements" / name).stat().st_mtime_ns == mtime

    # final graph identical to the oracle despite the kill
    assert report["merge"]["nodes"] == len(oracle_graph.nodes)
    assert report["merge"]["edges"] == len(oracle_graph.edges)
