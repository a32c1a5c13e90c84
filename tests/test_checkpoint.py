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
    assert report["extract"] == {"total": 6, "processed": 6, "skipped": 0, "pruned": 0}
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
    assert resumed == {"total": 6, "processed": 2, "skipped": 4, "pruned": 0}
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


def test_merge_options_invalidate_marker(ray_session, workdirs):
    """Re-running with different merge options must NOT return the cached
    graph (the marker keys on options, not just partitions)."""
    input_dir, work = workdirs
    first = run_checkpointed(input_dir, work)
    assert first["merge"]["skipped"] is False
    again = run_checkpointed(input_dir, work, canonicalize=True, salted=True)
    assert again["merge"]["skipped"] is False
    assert again["merge"]["nodes"] == first["merge"]["nodes"] - 1  # variant merged
    # same options again → cached
    third = run_checkpointed(input_dir, work, canonicalize=True, salted=True)
    assert third["merge"]["skipped"] is True


def test_recompute_replaces_stale_outputs(ray_session, workdirs):
    """A recompute must not append beside the previous run's part files."""
    input_dir, work = workdirs
    first = run_checkpointed(input_dir, work)
    n1, _ = _graph_tables(first["out_dir"])
    # force a recompute with identical data (different options)
    second = run_checkpointed(input_dir, work, salted=True)
    n2, e2 = _graph_tables(second["out_dir"])
    assert len(n2) == len(n1)  # no duplicated rows from stale part files
    assert len(e2) == second["merge"]["edges"]


def test_removed_input_partition_is_pruned(ray_session, workdirs):
    """Deleting an input partition removes its data from the graph on the
    next run (orphan lineage/elements are pruned, marker invalidated)."""
    input_dir, work = workdirs
    first = run_checkpointed(input_dir, work)
    victim = Path(input_dir) / "docs-00002.parquet"
    victim.unlink()
    second = run_checkpointed(input_dir, work)
    assert second["extract"]["pruned"] == 1
    assert second["extract"]["total"] == 5
    assert second["merge"]["skipped"] is False
    assert second["merge"]["nodes"] < first["merge"]["nodes"]
    ckpt = Path(work) / "ckpt"
    assert not (ckpt / "elements" / "part-docs-00002.parquet").exists()
    assert not (ckpt / "_lineage" / "part-docs-00002.json").exists()


def test_same_size_content_rewrite_invalidates(ray_session, workdirs):
    """Overwriting an input partition with same-size different content
    (mtime changes) forces reprocessing."""
    import shutil
    import time

    input_dir, work = workdirs
    run_checkpointed(input_dir, work)
    src = Path(input_dir) / "docs-00000.parquet"
    payload = src.read_bytes()
    time.sleep(0.01)
    src.write_bytes(payload)  # identical bytes, new mtime
    again = extract_to_checkpoint(input_dir, str(Path(work) / "ckpt"))
    assert again["processed"] == 1
