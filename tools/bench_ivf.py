"""IVF partitioned-index bench (round-2 verdict criterion: probe cost <<
full scan).  Builds the bucket-partitioned on-disk index over synthetic
vectors, then times (a) brute-force over the whole table, (b) the pruned
probe reading only nprobe bucket directories — reporting wall time and the
bytes actually read from disk per path.

Usage: python tools/bench_ivf.py [--rows 200000] [--dim 64] [--cpus 32]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from knowledge_graph_construction_ray.stages.embed import (
        brute_force_topk,
        build_ivf_index,
        ivf_search_index,
    )

    # realistic embedding geometry: a mixture of well-separated clusters
    # (uniform random gaussians are the IVF worst case — neighbors scatter
    # uniformly over buckets and NO partitioning scheme can prune them)
    rng = np.random.RandomState(3)
    n_clusters = 1024
    centers = rng.randn(n_clusters, args.dim) * 3.0
    assign = rng.randint(0, n_clusters, size=args.rows)
    vecs = (centers[assign] + rng.randn(args.rows, args.dim) * 0.3).astype(np.float64)
    table_path = "/tmp/kg_ivf_bench_vectors.parquet"
    pq.write_table(
        pa.Table.from_pydict(
            {"vec_id": np.arange(args.rows, dtype=np.int64),
             "embedding": list(vecs)}
        ),
        table_path,
    )
    ds = rd.read_parquet(table_path, override_num_blocks=max(16, args.cpus))
    q = vecs[0]

    # full scan (warm once, then timed)
    brute_force_topk(ds, q[None, :], k=10).to_pandas()
    t0 = time.time()
    exact = brute_force_topk(ds, q[None, :], k=10).to_pandas()
    t_scan = time.time() - t0

    index_dir = "/tmp/kg_ivf_bench_index"
    t0 = time.time()
    cents = build_ivf_index(ds, index_dir, n_centroids=None)  # ~sqrt(n)
    t_build = time.time() - t0

    t0 = time.time()
    approx = ivf_search_index(index_dir, q, k=10, nprobe=args.nprobe).to_pandas()
    t_probe_cold = time.time() - t0
    t0 = time.time()
    ivf_search_index(index_dir, q, k=10, nprobe=args.nprobe).to_pandas()
    t_probe = time.time() - t0  # warm: actor-pool startup amortized

    total_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(index_dir, "ivf_bucket=*", "*.parquet"))
    )
    order = np.argsort(-(cents @ (q / np.linalg.norm(q))))
    probed_bytes = sum(
        os.path.getsize(f)
        for b in order[: args.nprobe]
        for f in glob.glob(os.path.join(index_dir, f"ivf_bucket={int(b)}", "*.parquet"))
    )
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    print(
        {
            "rows": args.rows,
            "n_centroids": len(cents),
            "nprobe": args.nprobe,
            "scan_sec": round(t_scan, 2),
            "probe_sec_cold": round(t_probe_cold, 2),
            "probe_sec": round(t_probe, 2),
            "speedup": round(t_scan / t_probe, 2),
            "index_build_sec": round(t_build, 2),
            "bytes_total": total_bytes,
            "bytes_probed": probed_bytes,
            "io_fraction": round(probed_bytes / total_bytes, 4),
            "recall_at_10": recall,
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
