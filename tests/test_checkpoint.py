"""M6: per-partition checkpointing, lineage, metrics, kill/resume."""

import json
import os
from pathlib import Path

import pytest

from knowledge_graph_construction_ray.state.checkpoint import (
    extract_to_checkpoint,
    merge_from_checkpoint,
    read_metrics,
    run_checkpointed,
    split_docs_to_files,
)


@pytest.fixture()
def workdirs(tmp_path, fixture_corpus):
    input_dir = tmp_path / "docs"
    split_docs_to_files(fixture_corpus, str(input_dir), num_files=6)
    return str(input_dir), str(tmp_path / "work")


def _graph_tables(out_dir):
    import pyarrow.parquet as pq

    nodes = pq.read_table(os.path.join(out_dir, "nodes")).to_pandas()
    edges = pq.read_table(os.path.join(out_dir, "edges")).to_pandas()
    return nodes, edges


def test_checkpointed_run_matches_oracle(ray_session, workdirs, oracle_graph):
    input_dir, work = workdirs
    report = run_checkpointed(input_dir, work)
    assert report["extract"] == {"total": 6, "processed": 6, "skipped": 0}
    assert report["merge"]["skipped"] is False
    nodes, edges = _graph_tables(report["out_dir"])
    expected_nodes = oracle_graph.nodes_table().to_pandas()
    assert len(nodes) == len(expected_nodes)
    got = {(t.src_label, t.src_name, t.rel, t.dst_label, t.dst_name) for t in edges.itertuples()}
    assert got == set(oracle_graph.edges)


def test_resume_skips_completed_partitions(ray_session, workdirs):
    input_dir, work = workdirs
    ckpt = os.path.join(work, "ckpt")

    # simulate a killed run: process everything, then delete TWO partitions'
    # lineage records (their tasks "didn't commit")
    first = extract_to_checkpoint(input_dir, ckpt)
    assert first["processed"] == 6
    victims = ["docs-00002", "docs-00004"]
    for pid in victims:
        (Path(ckpt) / "_lineage" / f"part-{pid}.json").unlink()

    # record mtimes of the COMMITTED partitions' element files
    committed = {
        p.name: p.stat().st_mtime_ns
        for p in (Path(ckpt) / "elements").glob("part-*.parquet")
        if p.stem.replace("part-", "") not in victims
    }
    resumed = extract_to_checkpoint(input_dir, ckpt)
    assert resumed == {"total": 6, "processed": 2, "skipped": 4}
    for name, mtime in committed.items():
        assert (Path(ckpt) / "elements" / name).stat().st_mtime_ns == mtime

    # stale input fingerprint forces reprocessing of just that partition
    lp = Path(ckpt) / "_lineage" / "part-docs-00000.json"
    rec = json.loads(lp.read_text())
    rec["input"]["bytes"] += 1
    lp.write_text(json.dumps(rec))
    assert extract_to_checkpoint(input_dir, ckpt)["processed"] == 1


def test_merge_done_marker_idempotent(ray_session, workdirs):
    input_dir, work = workdirs
    report = run_checkpointed(input_dir, work)
    again = merge_from_checkpoint(
        os.path.join(work, "ckpt"), report["out_dir"]
    )
    assert again["skipped"] is True
    assert again["nodes"] == report["merge"]["nodes"]


def test_per_partition_metrics_emitted(ray_session, workdirs):
    input_dir, work = workdirs
    run_checkpointed(input_dir, work)
    metrics = read_metrics(work)
    assert len(metrics) == 6
    m = metrics[0]
    assert m["rows_in"] > 0 and m["elements_out"] > 0 and m["bytes_in"] > 0
    assert m["nodes_out"] + m["edges_out"] == m["elements_out"]
    assert 1 <= len(m["hot_keys"]) <= 5
    assert m["doc_id_range"][0] <= m["doc_id_range"][1]
