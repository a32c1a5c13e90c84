"""Per-partition checkpointing, lineage and metrics (north_rule: a killed
``ray job submit`` run resumes without reprocessing completed blocks).

The reference has NO checkpointing — a rerun starts with a full DB wipe
(neo4j_loader.py:64) and failed batches are silently skipped (278-282).
Here the extract phase commits per input partition:

* partition unit = one input parquet/lance fragment (the natural unit at
  100 TB scale);
* each partition's elements are written ATOMICALLY (tmp file + rename) to
  ``ckpt/elements/part-{pid}.parquet``; the commit point is the lineage
  record ``ckpt/_lineage/part-{pid}.json`` (doc-id range, row counts,
  input fingerprint, stage version, wall time) written after the data;
* per-partition metrics (rows in/out, bytes, wall, top-k hot merge keys)
  land in ``ckpt/_metrics/part-{pid}.json`` — the skew observability the
  north_rule asks for;
* a resume scans the lineage manifest and schedules ONLY partitions whose
  fingerprint is missing/stale; because each Ray task commits its own
  partition, a kill loses at most the in-flight tasks.

Phase B (merge shuffle → sorted nodes/edges) is one all-to-all job over the
union of committed elements; it is idempotent and guarded by a done-marker.
The disk barrier between phases doubles as the map/reduce boundary the
shuffle would materialize anyway.

The extract tasks here run as a Dataset over partition *specs* (one row per
file) rather than a Dataset over rows — this is the deliberate, documented
drop to per-partition granularity that the Dataset row model cannot
express: atomic per-partition commit requires task == partition.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..merge import fold_frame
from ..stages.records import extract_elements

STAGE_VERSION = 1  # bump to invalidate prior checkpoints on semantic change


def _fingerprint(path: str) -> dict[str, Any]:
    st = os.stat(path)
    meta = pq.read_metadata(path)
    # mtime guards against same-size same-rowcount content rewrites
    return {
        "path": str(path),
        "bytes": st.st_size,
        "rows": meta.num_rows,
        "mtime_ns": st.st_mtime_ns,
    }


def _lineage_path(ckpt_dir: str, pid: str) -> Path:
    return Path(ckpt_dir) / "_lineage" / f"part-{pid}.json"


def lineage_valid(ckpt_dir: str, pid: str, fp: dict[str, Any]) -> bool:
    p = _lineage_path(ckpt_dir, pid)
    if not p.exists():
        return False
    try:
        rec = json.loads(p.read_text())
    except json.JSONDecodeError:
        return False
    return (
        rec.get("stage_version") == STAGE_VERSION
        and rec.get("input") == fp
        and (Path(ckpt_dir) / "elements" / f"part-{pid}.parquet").exists()
    )


def _process_partition(ckpt_dir: str):
    """One extract task per input partition, with atomic commit."""

    def process(batch: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for _, row in batch.iterrows():
            pid, path, fp = row["pid"], row["path"], json.loads(row["fp"])
            t0 = time.perf_counter()
            # chaos/test hook: slow each partition down so kill tests can
            # interrupt a run between per-partition commits
            slowdown = float(os.environ.get("KG_EXTRACT_SLOWDOWN", "0"))
            if slowdown:
                time.sleep(slowdown)
            table = pq.read_table(path)
            elements = extract_elements(table)
            raw = elements.to_pandas()
            # hot keys BEFORE the combiner fold — the actual skew signal
            hot_raw = raw["merge_key"].value_counts().head(5)
            # local combiner before the shuffle-phase write
            folded = fold_frame(raw)
            edir = Path(ckpt_dir) / "elements"
            edir.mkdir(parents=True, exist_ok=True)
            tmp = edir / f".part-{pid}.tmp.parquet"
            final = edir / f"part-{pid}.parquet"
            from ..schema import ELEMENTS_SCHEMA

            pq.write_table(
                pa.Table.from_pandas(
                    folded, schema=ELEMENTS_SCHEMA, preserve_index=False
                ),
                tmp,
            )
            os.replace(tmp, final)  # atomic data commit
            wall = time.perf_counter() - t0
            doc_ids = table.column("doc_id").to_pylist()
            hot = hot_raw
            lineage = {
                "pid": pid,
                "input": fp,
                "stage_version": STAGE_VERSION,
                "rows_in": len(table),
                "elements_out": len(folded),
                "doc_id_range": [min(doc_ids), max(doc_ids)] if doc_ids else None,
                "wall_s": round(wall, 4),
            }
            metrics = {
                **lineage,
                "bytes_in": fp["bytes"],
                "nodes_out": int((folded["kind"] == "node").sum()),
                "edges_out": int((folded["kind"] == "edge").sum()),
                "hot_keys": {str(k): int(v) for k, v in hot.items()},
            }
            ldir = Path(ckpt_dir) / "_lineage"
            mdir = Path(ckpt_dir) / "_metrics"
            ldir.mkdir(parents=True, exist_ok=True)
            mdir.mkdir(parents=True, exist_ok=True)
            (mdir / f"part-{pid}.json").write_text(json.dumps(metrics))
            # the lineage record is the commit point — written last
            ltmp = ldir / f".part-{pid}.tmp.json"
            ltmp.write_text(json.dumps(lineage))
            os.replace(ltmp, _lineage_path(ckpt_dir, pid))
            out_rows.append(lineage)
        return pd.DataFrame(
            {
                "pid": [r["pid"] for r in out_rows],
                "rows_in": [r["rows_in"] for r in out_rows],
                "elements_out": [r["elements_out"] for r in out_rows],
                "wall_s": [r["wall_s"] for r in out_rows],
            }
        )

    return process


def list_partitions(input_dir: str) -> list[dict[str, Any]]:
    files = sorted(
        str(p) for p in Path(input_dir).glob("*.parquet") if p.is_file()
    )
    if not files:
        raise FileNotFoundError(f"no parquet partitions under {input_dir}")
    return [
        {"pid": Path(f).stem, "path": f, "fp": json.dumps(_fingerprint(f))}
        for f in files
    ]


def _prune_orphans(ckpt_dir: str, live_pids: set[str]) -> int:
    """Remove checkpoint state for partitions no longer present in the
    input directory — otherwise their elements would feed the merge forever
    (the pruned lineage changes the manifest hash, invalidating the merge
    marker)."""
    pruned = 0
    lineage_dir = Path(ckpt_dir) / "_lineage"
    if not lineage_dir.exists():
        return 0
    for p in lineage_dir.glob("part-*.json"):
        pid = p.stem.replace("part-", "", 1)
        if pid not in live_pids:
            p.unlink(missing_ok=True)
            (Path(ckpt_dir) / "elements" / f"part-{pid}.parquet").unlink(missing_ok=True)
            (Path(ckpt_dir) / "_metrics" / f"part-{pid}.json").unlink(missing_ok=True)
            pruned += 1
    return pruned


def extract_to_checkpoint(input_dir: str, ckpt_dir: str) -> dict[str, Any]:
    """Phase A.  Returns {'total': n, 'processed': k, 'skipped': n-k,
    'pruned': orphans removed}."""
    import ray.data as rd

    parts = list_partitions(input_dir)
    pruned = _prune_orphans(ckpt_dir, {p["pid"] for p in parts})
    pending = [
        p for p in parts
        if not lineage_valid(ckpt_dir, p["pid"], json.loads(p["fp"]))
    ]
    if pending:
        (
            rd.from_pandas(pd.DataFrame(pending))
            .repartition(len(pending))
            .map_batches(
                _process_partition(ckpt_dir),
                batch_format="pandas",
                batch_size=1,
                num_cpus=1,
            )
            .materialize()  # tiny lineage summaries only
        )
    return {
        "total": len(parts),
        "processed": len(pending),
        "skipped": len(parts) - len(pending),
        "pruned": pruned,
    }


def merge_from_checkpoint(
    ckpt_dir: str,
    out_dir: str,
    *,
    canonicalize: bool = False,
    salted: bool = False,
    num_buckets: int = 64,
) -> dict[str, Any]:
    """Phase B: committed elements → merge shuffle → sorted nodes/edges
    parquet under ``out_dir``.  Idempotent; guarded by a done-marker that
    records which partitions fed it AND the merge options used (a stale
    marker — changed partitions or changed options — forces a clean
    recompute into emptied output dirs)."""
    import shutil

    import ray.data as rd

    from ..pipelines.kg import merge_and_finalize

    lineage_dir = Path(ckpt_dir) / "_lineage"
    lineage_files = sorted(lineage_dir.glob("part-*.json"))
    pids = [p.stem.replace("part-", "", 1) for p in lineage_files]
    # the marker must key on WHAT was merged: a re-extracted partition
    # changes its lineage record and therefore this digest, and different
    # merge options produce a different graph from the same elements
    import hashlib

    digest = hashlib.sha256()
    for p in lineage_files:
        digest.update(p.read_bytes())
    manifest_hash = digest.hexdigest()
    options = {
        "canonicalize": canonicalize,
        "salted": salted,
        "num_buckets": num_buckets,
    }
    marker = Path(out_dir) / "_SUCCESS.json"
    if marker.exists():
        try:
            done = json.loads(marker.read_text())
            if (
                done.get("manifest_hash") == manifest_hash
                and done.get("stage_version") == STAGE_VERSION
                and done.get("options") == options
            ):
                return {**done, "skipped": True}
        except json.JSONDecodeError:
            pass
    # clean recompute: Ray's write_parquet appends uniquely-named part
    # files, so stale outputs must be removed first (and the stale marker,
    # so a kill mid-rewrite can't leave a valid-looking marker over mixed
    # outputs)
    marker.unlink(missing_ok=True)
    shutil.rmtree(os.path.join(out_dir, "nodes"), ignore_errors=True)
    shutil.rmtree(os.path.join(out_dir, "edges"), ignore_errors=True)
    files = [str(Path(ckpt_dir) / "elements" / f"part-{pid}.parquet") for pid in pids]
    elements = rd.read_parquet(files)
    merged, nodes, edges = merge_and_finalize(
        elements,
        num_buckets=num_buckets,
        salted=salted,
        canonicalize=canonicalize,
    )
    counts = (
        merged.map_batches(
            lambda df: pd.DataFrame(
                {"n": [(df["kind"] == "node").sum()], "e": [(df["kind"] == "edge").sum()]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sum()
    )
    nodes.write_parquet(os.path.join(out_dir, "nodes"))
    edges.write_parquet(os.path.join(out_dir, "edges"))
    done = {
        "pids": pids,
        "manifest_hash": manifest_hash,
        "stage_version": STAGE_VERSION,
        "options": options,
        "nodes": int(counts["n"]),
        "edges": int(counts["e"]),
    }
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text(json.dumps(done))
    return {**done, "skipped": False}


def run_checkpointed(
    input_dir: str, work_dir: str, **merge_kwargs: Any
) -> dict[str, Any]:
    """End-to-end resumable run: extract (per-partition commits) + merge
    (done-marker).  ``work_dir`` holds ``ckpt/`` and ``graph/``."""
    ckpt = os.path.join(work_dir, "ckpt")
    out = os.path.join(work_dir, "graph")
    a = extract_to_checkpoint(input_dir, ckpt)
    b = merge_from_checkpoint(ckpt, out, **merge_kwargs)
    return {"extract": a, "merge": b, "out_dir": out}


def read_metrics(work_dir: str) -> list[dict[str, Any]]:
    mdir = Path(work_dir) / "ckpt" / "_metrics"
    return [json.loads(p.read_text()) for p in sorted(mdir.glob("part-*.json"))]


def split_docs_to_files(table: pa.Table, input_dir: str, num_files: int) -> list[str]:
    """Test/bench helper: shard a docs table into deterministic partition
    files (the role input fragments play at scale)."""
    Path(input_dir).mkdir(parents=True, exist_ok=True)
    n = table.num_rows
    step = max(1, (n + num_files - 1) // num_files)
    out = []
    for i, start in enumerate(range(0, n, step)):
        path = str(Path(input_dir) / f"docs-{i:05d}.parquet")
        pq.write_table(table.slice(start, step), path)
        out.append(path)
    return out
