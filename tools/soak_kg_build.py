#!/usr/bin/env python
"""Memory-pressure soak of the FUSED KG build (write_graph_sorted) at 10×
the bench corpus: 19.68M docs (×40000 replicated fixtures) streamed through
extract → narrow range exchange → per-bucket fold+write.

What it evidences for the 100 TB design:

- the streaming executor + object-store backpressure hold when the
  in-flight element stream is ~10× the bench (no OOM, no spill failure);
- the fused writer's bytes-at-rest stay bounded: only the combiner
  partials are materialized (boundary sampling), the folded buckets go
  straight to part files;
- docs/s within the noise band of the 2M-doc headline shows cost is
  linear in corpus size (no superlinear coordination term).

Usage: python tools/soak_kg_build.py [num_cpus] [replicate]
Records go to BASELINE.md (standalone — outside the per-round bench.py
time budget).
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 32
replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 40000

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
import ray.data as rd  # noqa: E402
from ray.data import DataContext  # noqa: E402
from ray.data.context import ShuffleStrategy  # noqa: E402

ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

from knowledge_graph_construction_ray.fixtures import write_corpus  # noqa: E402
from knowledge_graph_construction_ray.materialize import write_graph_sorted  # noqa: E402

CORPUS = f"/tmp/kg_soak_corpus_x{replicate}.pqdir"
OUT = "/tmp/kg_soak_out"

if not os.path.exists(CORPUS):
    t0 = time.perf_counter()
    write_corpus(CORPUS + ".tmp", replicate=replicate, files=256)
    os.replace(CORPUS + ".tmp", CORPUS)
    print(f"corpus written in {time.perf_counter() - t0:.1f}s", flush=True)

import pyarrow.dataset as pads  # noqa: E402

n_docs = sum(f.metadata.num_rows for f in pads.dataset(CORPUS).get_fragments())
shutil.rmtree(OUT, ignore_errors=True)
t0 = time.perf_counter()
stats = write_graph_sorted(
    rd.read_parquet(CORPUS, override_num_blocks=256),
    f"{OUT}/nodes",
    f"{OUT}/edges",
    num_buckets=256,
)
wall = time.perf_counter() - t0
print({
    "docs": n_docs,
    "wall_s": round(wall, 1),
    "docs_per_sec": round(n_docs / wall, 1),
    "nodes": stats["nodes"],
    "edges": stats["edges"],
    "buckets": stats["buckets"],
}, flush=True)
ray.shutdown()
