"""Product-quantization scale bench (stages/pq.py): train + encode a
clustered synthetic embedding table, then compare ADC search over the
compressed codes against the fp32 brute-force scan — reporting encode
throughput, on-disk compression, search walls and rerank recall.

Usage: python tools/bench_pq.py [--rows 500000] [--dim 64] [--cpus 32]
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
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k-codes", type=int, default=256)
    ap.add_argument("--rerank", type=int, default=600)
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

    from knowledge_graph_construction_ray.stages.embed import brute_force_topk
    from knowledge_graph_construction_ray.stages.pq import (
        pq_encode,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    # same clustered geometry as bench_ivf (uniform gaussians are the
    # quantization worst case; real embeddings are multi-modal)
    rng = np.random.RandomState(3)
    n_clusters = 1024
    centers = rng.randn(n_clusters, args.dim) * 3.0
    assign = rng.randint(0, n_clusters, size=args.rows)
    vecs = (centers[assign] + rng.randn(args.rows, args.dim) * 0.3).astype(np.float32)
    table_path = "/tmp/kg_pq_bench_vectors.parquet"
    pq.write_table(
        pa.Table.from_pydict(
            {"vec_id": np.arange(args.rows, dtype=np.int64),
             "embedding": list(vecs)}
        ),
        table_path,
    )
    ds = rd.read_parquet(table_path, override_num_blocks=max(16, args.cpus))
    q = vecs[0].astype(np.float64)
    q /= np.linalg.norm(q)

    t0 = time.time()
    cb = train_pq_codebooks(ds, m=args.m, k=args.k_codes)
    t_train = time.time() - t0

    codes_dir = "/tmp/kg_pq_bench_codes"
    t0 = time.time()
    pq_encode(ds, cb).write_parquet(codes_dir, mode="overwrite")
    t_encode = time.time() - t0
    codes_ds = rd.read_parquet(codes_dir, override_num_blocks=max(16, args.cpus))

    # brute force over fp32 (warm once, then timed)
    brute_force_topk(ds, q[None, :], k=10).to_pandas()
    t0 = time.time()
    exact = brute_force_topk(ds, q[None, :], k=10).to_pandas()
    t_scan = time.time() - t0

    t0 = time.time()
    got = pq_topk_rerank(ds, codes_ds, cb, q, k=10, rerank=args.rerank)
    t_pq = time.time() - t0

    fp32_bytes = os.path.getsize(table_path)
    code_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(codes_dir, "*.parquet"))
    )
    recall = len(set(got["vec_id"]) & set(exact["vec_id"])) / 10

    # --- IVF×PQ composition: prune buckets AND shrink the probed bytes ---
    from knowledge_graph_construction_ray.stages.pq import (
        build_ivfpq_index,
        ivfpq_search_index,
    )

    ivfpq_dir = "/tmp/kg_pq_bench_ivfpq"
    t0 = time.time()
    cents, _cb = build_ivfpq_index(
        ds, ivfpq_dir, n_centroids=None, m=args.m, k_codes=args.k_codes
    )
    t_ivfpq_build = time.time() - t0
    nprobe = 8
    ivfpq_search_index(ivfpq_dir, ds, q, k=10, nprobe=nprobe,
                       rerank=args.rerank)  # warm
    t0 = time.time()
    got2 = ivfpq_search_index(ivfpq_dir, ds, q, k=10, nprobe=nprobe,
                              rerank=args.rerank)
    t_ivfpq = time.time() - t0
    qn = q / np.linalg.norm(q)
    order = np.argsort(-(cents @ qn))
    ivfpq_total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(ivfpq_dir, "ivf_bucket=*", "*.parquet"))
    )
    ivfpq_probed = sum(
        os.path.getsize(f)
        for b in order[:nprobe]
        for f in glob.glob(os.path.join(ivfpq_dir, f"ivf_bucket={int(b)}", "*.parquet"))
    )
    recall2 = len(set(got2["vec_id"]) & set(exact["vec_id"])) / 10
    print(
        {
            "rows": args.rows,
            "m": args.m,
            "k_codes": args.k_codes,
            "train_sec": round(t_train, 2),
            "encode_sec": round(t_encode, 2),
            "encode_vecs_per_sec": int(args.rows / t_encode),
            "scan_sec": round(t_scan, 2),
            "pq_rerank_sec": round(t_pq, 2),
            "fp32_bytes": fp32_bytes,
            "code_bytes": code_bytes,
            "compression": round(fp32_bytes / code_bytes, 1),
            "recall_at_10": recall,
            "ivfpq_build_sec": round(t_ivfpq_build, 2),
            "ivfpq_probe_sec": round(t_ivfpq, 2),
            "ivfpq_nprobe": nprobe,
            "ivfpq_probed_bytes": ivfpq_probed,
            "ivfpq_io_fraction_vs_fp32": round(ivfpq_probed / fp32_bytes, 5),
            "ivfpq_total_code_bytes": ivfpq_total,
            "ivfpq_recall_at_10": recall2,
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
