"""Incremental-ingest dedup scale check: build the MinHash band index
over a large standing corpus ONCE, then dedup a small new batch against
it — the wall must be ingest-batch-sized, not corpus-sized, while the
pairs stay exactly the full pipeline's pairs restricted to new docs.

Corpus: bench.py's ×R minhash corpus (per-replica token suffixes keep
cross-replica Jaccard ≈ 0, preserving the planted near-dup structure).
The "new batch" is one extra replica slice whose docs duplicate a slice
of the standing corpus — so every new doc has a real near-dup to find.

Run:  python tools/bench_minhash_index.py [--replicate 100] [--batch 2500] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2500)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import ray.data as rd

    os.environ.setdefault("KG_BENCH_MINHASH_REPLICATE", str(args.replicate))
    import bench

    bench.MINHASH_REPLICATE = args.replicate
    corpus_path, n_total = bench._ensure_minhash_corpus()

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    old = rd.read_parquet(corpus_path, override_num_blocks=max(16, args.cpus))

    # new batch: near-dups of the first --batch docs (light edit so the
    # pair is a genuine near-dup, not an exact dup), fresh ids
    head = pd.read_parquet(corpus_path, columns=["doc_id", "text"]).head(args.batch)
    new = pd.DataFrame(
        {
            "doc_id": head["doc_id"].to_numpy() + 1_000_000_000,
            "text": head["text"] + " ingest-edit suffix tokens",
        }
    )

    index_dir = f"/tmp/kg_minhash_index_x{args.replicate}"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    build_minhash_index(old, index_dir)
    t_build = time.time() - t0

    stats: dict = {}
    t0 = time.time()
    pairs = query_minhash_index(
        rd.from_pandas(new), index_dir, old, threshold=0.5, stats_out=stats,
        num_partitions=4,  # candidate volume is batch-scaled — session-
        # sized join aggregator pools would be pure actor-startup wall
    )
    t_query = time.time() - t0

    # every new doc must find its standing-corpus original
    found = set(pairs["a"]) | set(pairs["b"])
    recall = sum(1 for d in new["doc_id"] if d in found) / len(new)

    # honest comparison: the full-recompute path over old ∪ new (what a
    # non-incremental pipeline would re-run on every ingest)
    from knowledge_graph_construction_ray.stages.dedupe import (
        minhash_candidate_pairs,
        verify_pairs_distributed,
    )

    both = old.union(rd.from_pandas(new)).materialize()
    t0 = time.time()
    full_pairs = verify_pairs_distributed(
        minhash_candidate_pairs(both), both, 0.5
    ).count()
    t_full = time.time() - t0

    print(
        json.dumps(
            {
                "corpus_docs": n_total,
                "batch_docs": int(len(new)),
                "build_sec": round(t_build, 2),
                "query_sec": round(t_query, 2),
                "verified_pairs": int(len(pairs)),
                "planted_recall": round(recall, 4),
                "occupied_buckets": stats.get("occupied_buckets"),
                "full_recompute_sec": round(t_full, 2),
                "full_recompute_pairs": int(full_pairs),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
