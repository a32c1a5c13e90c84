"""Scale check for the graph family (functions/graph.py): distributed
connected components, PageRank, k-core numbers and triangle counting on
a deterministic
synthetic graph big enough that per-round coordination stops dominating.

Graph: ``--nodes`` vertices in ``--clusters`` equal dense-ish clusters
(ring + deterministic chords → diameter stays small but non-trivial),
plus a global sparse ring of "bridge" edges every ``--bridge-every``
nodes so components are known by construction when bridges are off.

Checks, not just walls:
- CC with ``force_distributed`` recovers exactly ``--clusters``
  components (bridges off) and labels match the numpy local kernel.
- PageRank distributed == sequential golden BIT-exactly at this scale.
- core numbers (h-index fixpoint, exhaustion_fallback=False so the
  distributed kernel cannot be graded against its own peel oracle)
  == sequential min-degree peeling exactly.
- triangles: per-node counts sum to 3× the (counted) triangle total.

Run:  python tools/bench_graph.py --nodes 200000 [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_edges(n_nodes: int, n_clusters: int, chords: int = 3) -> pd.DataFrame:
    """Per-cluster ring + ``chords`` deterministic chord sets."""
    size = n_nodes // n_clusters
    ids = np.arange(n_nodes, dtype=np.int64)
    base = (ids // size) * size
    off = ids - base
    parts = [np.stack([ids, base + (off + 1) % size], axis=1)]
    for c in range(2, 2 + chords):
        step = c * c + 1
        parts.append(np.stack([ids, base + (off + step) % size], axis=1))
    e = np.concatenate(parts)
    return pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--clusters", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--pr-iters", type=int, default=5)
    ap.add_argument("--bfs-nodes", type=int, default=200_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.graph import (
        _local_components,
        connected_components,
        pagerank,
        triangle_counts,
    )
    from knowledge_graph_construction_ray.golden import pagerank_golden_arrays

    edges_pd = make_edges(args.nodes, args.clusters)
    edges = rd.from_pandas(edges_pd).materialize()
    report: dict = {
        "nodes": args.nodes,
        "clusters": args.clusters,
        "edges_directed": len(edges_pd),
        "cpus": args.cpus,
    }

    # --- connected components, forced down the distributed path -----------
    t0 = time.time()
    cc = connected_components(edges, force_distributed=True).to_pandas()
    t_cc = time.time() - t0
    n_comp = cc["component"].nunique()
    local = _local_components(
        np.concatenate([edges_pd["src"], edges_pd["dst"]]).astype(np.int64),
        np.concatenate([edges_pd["dst"], edges_pd["src"]]).astype(np.int64),
    )
    ok_cc = (
        n_comp == args.clusters
        and cc.sort_values("node").reset_index(drop=True).equals(
            local.sort_values("node").reset_index(drop=True)
        )
    )
    report["cc"] = {"sec": round(t_cc, 2), "components": int(n_comp), "exact": bool(ok_cc)}

    # --- pagerank ---------------------------------------------------------
    t0 = time.time()
    pr = (
        pagerank(edges, iters=args.pr_iters)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    t_pr = time.time() - t0
    gold = pagerank_golden_arrays(
        edges_pd["src"].to_numpy(), edges_pd["dst"].to_numpy(), iters=args.pr_iters
    ).reset_index(drop=True)
    report["pagerank"] = {
        "sec": round(t_pr, 2),
        "iters": args.pr_iters,
        "bit_exact_vs_golden": bool(pr.equals(gold)),
    }

    # --- core numbers, forced down the distributed h-index path -----------
    from knowledge_graph_construction_ray.functions.graph import (
        core_numbers,
        peel_core_numbers,
    )

    t0 = time.time()
    core = (
        core_numbers(edges, force_distributed=True, exhaustion_fallback=False)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    t_core = time.time() - t0
    und = pd.DataFrame(
        {
            "src": np.concatenate([edges_pd["src"], edges_pd["dst"]]),
            "dst": np.concatenate([edges_pd["dst"], edges_pd["src"]]),
        }
    )
    und = und[und["src"] != und["dst"]].drop_duplicates()
    peel = peel_core_numbers(
        und["src"].to_numpy(np.int64), und["dst"].to_numpy(np.int64)
    ).sort_values("node").reset_index(drop=True)
    report["core"] = {
        "sec": round(t_core, 2),
        "max_core": int(core["core"].max()),
        "exact_vs_peel": bool(core.equals(peel)),
    }

    # --- triangles --------------------------------------------------------
    t0 = time.time()
    tri = triangle_counts(edges).to_pandas()
    t_tri = time.time() - t0
    total = int(tri["n_triangles"].sum())
    report["triangles"] = {
        "sec": round(t_tri, 2),
        "corner_sum": total,
        "divisible_by_3": total % 3 == 0,
        "nodes_in_triangles": int(len(tri)),
    }

    # --- BFS over a doubling graph (the low-diameter shape BFS wants) -----
    from knowledge_graph_construction_ray.functions.graph import (
        _local_bfs,
        bfs_distances,
    )

    nb = args.bfs_nodes
    ids = np.arange(nb, dtype=np.int64)
    chain = np.stack([ids[:-1], ids[:-1] + 1], axis=1)
    dbl_src = ids[(ids >= 1) & (2 * ids < nb)]
    dbl = np.stack([dbl_src, 2 * dbl_src], axis=1)
    bfs_pd = pd.DataFrame(np.concatenate([chain, dbl]), columns=["src", "dst"])
    t0 = time.time()
    dist = (
        bfs_distances(
            rd.from_pandas(bfs_pd).materialize(), [0], force_distributed=True
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    t_bfs = time.time() - t0
    # _local_bfs expects an undirected (bidirectional) edge list — the
    # operator undirects internally, the raw reference must do it here
    ref = _local_bfs(
        np.concatenate([bfs_pd["src"], bfs_pd["dst"]]).astype(np.int64),
        np.concatenate([bfs_pd["dst"], bfs_pd["src"]]).astype(np.int64),
        np.array([0], np.int64),
    ).sort_values("node").reset_index(drop=True)
    report["bfs"] = {
        "sec": round(t_bfs, 2),
        "nodes": int(nb),
        "eccentricity": int(dist["dist"].max()),
        "reached_all": bool(len(dist) == nb),
        "exact_vs_local": bool(dist.equals(ref)),
    }

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
