"""Connected-components operator (functions/graph.py).

Covers both dispatch arms: the driver-local vectorized numpy kernel and
the distributed pointer-jumping loop (``force_distributed=True``), which
must agree exactly.  The path-graph case is the pointer-jumping
stress: a chain of length L converges in O(log L) rounds, so the
``max_iters=8`` budget only passes if jumping actually compresses."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from knowledge_graph_construction_ray.functions.graph import (
    _local_components,
    connected_components,
    undirect_edges,
)


def _edges(pairs):
    if not pairs:
        return rd.from_pandas(
            pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")})
        )
    src, dst = zip(*pairs)
    return rd.from_pandas(pd.DataFrame({"src": list(src), "dst": list(dst)}))


def _solve(ds, **kw):
    out = connected_components(ds, **kw).to_pandas()
    if out.empty:  # empty Ray results drop their schema
        out = out.reindex(columns=["node", "component"]).astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _expected(pairs):
    """Independent brute-force closure over the node set."""
    nodes = sorted({n for p in pairs for n in p})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to roots, then label with the min id per root
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    lab = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            lab[n] = m
    return pd.DataFrame({"node": nodes, "component": [lab[n] for n in nodes]})


CASES = {
    "two_triangles_and_bridge": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)],
    "self_loops_and_dups": [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)],
    "star": [(100, i) for i in range(1, 9)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_local_matches_bruteforce(ray_session, name):
    pairs = CASES[name]
    got = _solve(_edges(pairs))
    # self-loop-only nodes with no other edge are dropped with the loop
    exp = _expected([p for p in pairs if p[0] != p[1]])
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


@pytest.mark.parametrize("name", sorted(CASES))
def test_distributed_matches_local(ray_session, name):
    pairs = CASES[name]
    local = _solve(_edges(pairs))
    dist = _solve(_edges(pairs), force_distributed=True, num_buckets=4)
    pd.testing.assert_frame_equal(dist, local)


def test_path_graph_pointer_jumping(ray_session):
    """A 200-node chain has diameter 199; plain hash-min needs ~100
    exchange rounds.  Pointer jumping must land it within 10."""
    pairs = [(i, i + 1) for i in range(200)]
    got = _solve(_edges(pairs), force_distributed=True, num_buckets=4, max_iters=10)
    assert (got["component"] == 0).all()
    assert len(got) == 201


def test_empty_edges(ray_session):
    got = _solve(_edges([]))
    assert got.empty
    assert list(got.columns) == ["node", "component"]


def test_undirect_edges_dedupes(ray_session):
    ds = _edges([(1, 2), (2, 1), (1, 2), (3, 3)])
    df = undirect_edges(ds).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
    pd.testing.assert_frame_equal(df, exp.astype({"src": "int64", "dst": "int64"}))


def _tri_expected(pairs):
    """Brute-force per-node triangle counts over the undirected simple
    graph (self-loops/dup edges dropped)."""
    import itertools

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    nodes = sorted(counts)
    return pd.DataFrame(
        {"node": nodes, "n_triangles": [counts[n] for n in nodes]}
    ).astype("int64")


def _tri_solve(pairs, **kw):
    from knowledge_graph_construction_ray.functions.graph import triangle_counts

    out = triangle_counts(_edges(pairs), **kw).to_pandas()
    if out.empty:  # empty Ray results drop their schema
        out = out.reindex(columns=["node", "n_triangles"]).astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def test_triangles_k4_plus_chain(ray_session):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (10, 11), (11, 12)]
    got = _tri_solve(pairs, num_buckets=4)
    pd.testing.assert_frame_equal(got, _tri_expected(pairs))


def test_triangles_none(ray_session):
    got = _tri_solve([(1, 2), (2, 3), (3, 4)])
    assert got.empty


def test_triangles_hub_skew(ray_session):
    """A hub star plus a rim cycle: every rim edge closes a triangle at
    the hub, and the hub's raw degree (12) far exceeds its oriented
    out-degree — exercises the degree-ordering."""
    rim = list(range(1, 13))
    pairs = [(0, r) for r in rim] + [
        (rim[i], rim[(i + 1) % len(rim)]) for i in range(len(rim))
    ]
    got = _tri_solve(pairs, num_buckets=4)
    pd.testing.assert_frame_equal(got, _tri_expected(pairs))


def test_triangles_random_graphs(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(n, 5 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        pairs = list(zip(src.tolist(), dst.tolist()))
        got = _tri_solve(pairs, num_buckets=4)
        pd.testing.assert_frame_equal(got, _tri_expected(pairs))


def test_pagerank_matches_sequential_golden(ray_session):
    """Distributed integer PageRank must be BIT-identical to the
    sequential golden — the determinism claim the int64 formulation
    exists for.  Graph includes a sink, a self-loop, duplicate edges
    and an isolated 2-cycle."""
    from knowledge_graph_construction_ray.functions.graph import pagerank
    from knowledge_graph_construction_ray.golden import pagerank_golden_arrays

    src = np.array([1, 1, 2, 3, 3, 3, 5, 1, 7, 8])
    dst = np.array([2, 3, 4, 4, 3, 1, 5, 2, 8, 7])
    ds = _edges(list(zip(src.tolist(), dst.tolist())))
    for nb in (3, 16):
        got = (
            pagerank(ds, num_buckets=nb)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = pagerank_golden_arrays(src, dst).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


def test_pagerank_mass_and_order(ray_session):
    """Rank mass stays near N·scale (truncation only leaks downward) and
    the hub of a star out-ranks the leaves."""
    from knowledge_graph_construction_ray.functions.graph import pagerank

    pairs = [(i, 0) for i in range(1, 9)]  # all leaves point at the hub
    out = pagerank(_edges(pairs), num_buckets=4).to_pandas()
    total = out["rank_scaled"].sum()
    n, scale = len(out), 10**9
    assert total <= n * scale
    assert total > int(n * scale * 0.95)
    hub = out.loc[out["node"] == 0, "rank_scaled"].iloc[0]
    assert (hub > out.loc[out["node"] != 0, "rank_scaled"]).all()


def test_personalized_pagerank_matches_golden_and_concentrates(ray_session):
    """Seeded mode: bit-identical to the sequential golden (same graph
    as the uniform test — sinks, self-loop, dups, isolated 2-cycle),
    absent seeds ignored identically, and seed nodes out-rank comparable
    non-seeds (all mass teleports to them)."""
    from knowledge_graph_construction_ray.functions.graph import pagerank
    from knowledge_graph_construction_ray.golden import pagerank_golden_arrays

    src = np.array([1, 1, 2, 3, 3, 3, 5, 1, 7, 8])
    dst = np.array([2, 3, 4, 4, 3, 1, 5, 2, 8, 7])
    ds = _edges(list(zip(src.tolist(), dst.tolist())))
    seeds = np.array([3, 7, 999], dtype=np.int64)  # 999 not in the graph
    got = (
        pagerank(ds, num_buckets=4, seeds=seeds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = pagerank_golden_arrays(src, dst, seeds=seeds).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    r = got.set_index("node")["rank_scaled"]
    # seeds dominate their non-seed peers
    assert r[3] > r[1] and r[3] > r[4] and r[7] > r[8]


def test_pagerank_empty(ray_session):
    from knowledge_graph_construction_ray.functions.graph import pagerank

    out = pagerank(_edges([])).to_pandas()
    assert out.empty


def _core_expected(pairs):
    """Brute-force core numbers by DEFINITION: for each k, repeatedly
    strip nodes of degree < k; survivors have core ≥ k.  Independent of
    both the peeling-order oracle and the h-index iteration."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {n: 0 for n in adj}
    k = 1
    while True:
        alive = {n: set(v) for n, v in adj.items()}
        changed = True
        while changed:
            drop = [n for n, v in alive.items() if len(v) < k]
            changed = bool(drop)
            for n in drop:
                for u in alive[n]:
                    alive[u].discard(n)
                del alive[n]
        if not alive:
            break
        for n in alive:
            core[n] = k
        k += 1
    nodes = sorted(core)
    return pd.DataFrame({"node": nodes, "core": [core[n] for n in nodes]}).astype(
        "int64"
    )


def _core_solve(pairs, **kw):
    from knowledge_graph_construction_ray.functions.graph import core_numbers

    out = core_numbers(_edges(pairs), **kw).to_pandas()
    if out.empty:  # empty Ray results drop their schema
        out = out.reindex(columns=["node", "core"]).astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def test_core_k4_plus_chain(ray_session):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (10, 11), (11, 12)]
    exp = _core_expected(pairs)
    pd.testing.assert_frame_equal(_core_solve(pairs), exp)
    pd.testing.assert_frame_equal(
        _core_solve(pairs, force_distributed=True, num_buckets=4,
                    exhaustion_fallback=False), exp
    )


def test_core_nested_shells(ray_session):
    """K5 nucleus, a rim cycle through one nucleus node, and a pendant
    path: cores 4, 2 and 1 coexist, and the h-index iteration needs
    several rounds to erode the high initial degrees."""
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    rim = [(0, 10), (10, 11), (11, 12), (12, 0)]
    path = [(12, 20), (20, 21)]
    pairs = k5 + rim + path
    exp = _core_expected(pairs)
    pd.testing.assert_frame_equal(_core_solve(pairs), exp)
    pd.testing.assert_frame_equal(
        _core_solve(pairs, force_distributed=True, num_buckets=3,
                    exhaustion_fallback=False), exp
    )


def test_core_random_graphs(ray_session):
    from knowledge_graph_construction_ray.functions.graph import peel_core_numbers

    rng = np.random.default_rng(19)
    for trial in range(3):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(n, 5 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        pairs = [(a, b) for a, b in zip(src.tolist(), dst.tolist()) if a != b]
        if not pairs:
            continue
        exp = _core_expected(pairs)
        # sequential peel (local arm)
        pd.testing.assert_frame_equal(_core_solve(pairs), exp)
        # distributed h-index arm
        pd.testing.assert_frame_equal(
            _core_solve(pairs, force_distributed=True, num_buckets=4,
                    exhaustion_fallback=False), exp
        )


def test_core_high_diameter_fallback(ray_session):
    """A long path erodes the h-index by ~one node per round (O(diameter)
    rounds); when max_iters is exhausted the loop must finish EXACTLY via
    the driver peel instead of raising."""
    pairs = [(i, i + 1) for i in range(300)]
    got = _core_solve(pairs, force_distributed=True, num_buckets=4, max_iters=5)
    assert len(got) == 301
    assert (got["core"] == 1).all()


def test_core_empty(ray_session):
    got = _core_solve([])
    assert got.empty
    assert list(got.columns) == ["node", "core"]


def test_local_kernel_random_graphs():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(5, 120))
        m = int(rng.integers(1, 4 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        keep = src != dst
        pairs = list(zip(src[keep].tolist(), dst[keep].tolist()))
        if not pairs:
            continue
        s = np.array([p[0] for p in pairs] + [p[1] for p in pairs], dtype=np.int64)
        d = np.array([p[1] for p in pairs] + [p[0] for p in pairs], dtype=np.int64)
        got = _local_components(s, d).reset_index(drop=True)
        exp = _expected(pairs).astype("int64").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------------------
# BFS hop distances
# ---------------------------------------------------------------------------


def _bfs_expected(pairs, seeds):
    """Independent brute force: dict-based level BFS over the undirected
    adjacency (per-node Python — fine at test scale, different code
    shape from both production arms)."""
    adj: dict = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(dist)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return (
        pd.DataFrame({"node": list(dist), "dist": list(dist.values())})
        .astype("int64")
        .sort_values("node")
        .reset_index(drop=True)
    )


def _bfs_solve(pairs, seeds, **kw):
    from knowledge_graph_construction_ray.functions.graph import bfs_distances

    out = bfs_distances(_edges(pairs), seeds, **kw).to_pandas()
    if out.empty:
        out = out.reindex(columns=["node", "dist"]).astype("int64")
    return out.sort_values("node").reset_index(drop=True)


BFS_CASES = {
    "chain": [(i, i + 1) for i in range(12)],
    "doubling": [(i, i + 1) for i in range(30)] + [(i, 2 * i) for i in range(1, 16)],
    "two_components": [(0, 1), (1, 2), (10, 11), (11, 12)],
    "star": [(0, i) for i in range(1, 9)],
    "cycle_odd": [(i, (i + 1) % 7) for i in range(7)],
}


@pytest.mark.parametrize("name", sorted(BFS_CASES))
def test_bfs_local_matches_bruteforce(ray_session, name):
    pairs = BFS_CASES[name]
    got = _bfs_solve(pairs, [0])
    pd.testing.assert_frame_equal(got, _bfs_expected(pairs, [0]))


@pytest.mark.parametrize("name", sorted(BFS_CASES))
def test_bfs_distributed_matches_local(ray_session, name):
    pairs = BFS_CASES[name]
    got = _bfs_solve(pairs, [0], force_distributed=True, num_buckets=4)
    pd.testing.assert_frame_equal(got, _bfs_expected(pairs, [0]))


def test_bfs_multi_seed_and_random_graphs(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 40
        m = 90
        pairs = list(zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()))
        seeds = sorted(set(rng.integers(0, n, 3).tolist()))
        want = _bfs_expected(pairs, seeds)
        pd.testing.assert_frame_equal(_bfs_solve(pairs, seeds), want)
        pd.testing.assert_frame_equal(
            _bfs_solve(pairs, seeds, force_distributed=True, num_buckets=4), want
        )


def test_bfs_unreached_excluded_isolated_seed_included(ray_session):
    pairs = [(0, 1), (5, 6)]  # seed 99 touches nothing
    got = _bfs_solve(pairs, [0, 99], force_distributed=True, num_buckets=2)
    want = pd.DataFrame({"node": [0, 1, 99], "dist": [0, 1, 0]}).astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # nodes 5/6 are absent — reachability is from the seed set only
    assert 5 not in set(got["node"])


def test_bfs_empty_seeds_and_empty_edges(ray_session):
    assert _bfs_solve([(0, 1)], []).empty
    got = _bfs_solve([], [3])
    pd.testing.assert_frame_equal(
        got, pd.DataFrame({"node": [3], "dist": [0]}).astype("int64")
    )


def test_bfs_round_exhaustion_raises(ray_session):
    pairs = [(i, i + 1) for i in range(8)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _bfs_solve(pairs, [0], force_distributed=True, num_buckets=2, max_rounds=3)


# ---------------------------------------------------------------------------
# weighted SSSP (Bellman-Ford distributed / vectorized local / Dijkstra ref)
# ---------------------------------------------------------------------------


def _dijkstra_ref(wpairs, seeds):
    """Independent heapq Dijkstra over undirected weighted pairs."""
    import heapq

    adj = {}
    for s, d, w in wpairs:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {s: 0 for s in seeds}
    heap = [(0, s) for s in seeds]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    nodes = sorted(dist)
    return pd.DataFrame(
        {"node": np.array(nodes, np.int64),
         "dist": np.array([dist[n] for n in nodes], np.int64)}
    )


def _sssp_solve(wpairs, seeds, **kw):
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.graph import sssp_distances

    df = pd.DataFrame(wpairs, columns=["src", "dst", "w"]).astype("int64")
    ds = rd.from_pandas(df) if len(df) else rd.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype="int64"),
                      "dst": pd.Series(dtype="int64"),
                      "w": pd.Series(dtype="int64")})
    )
    out = sssp_distances(ds, seeds, **kw).to_pandas()
    if out.empty:
        return out
    return out.sort_values("node").reset_index(drop=True)


def test_sssp_both_arms_match_dijkstra_random(ray_session):
    rng = np.random.default_rng(23)
    for trial in range(3):
        n, m = 40, 90
        wpairs = list(
            zip(
                rng.integers(0, n, m).tolist(),
                rng.integers(0, n, m).tolist(),
                rng.integers(1, 10, m).tolist(),
            )
        )
        seeds = sorted(set(rng.integers(0, n, 2).tolist()))
        want = _dijkstra_ref(wpairs, seeds)
        pd.testing.assert_frame_equal(_sssp_solve(wpairs, seeds), want)
        pd.testing.assert_frame_equal(
            _sssp_solve(wpairs, seeds, force_distributed=True, num_buckets=4),
            want,
        )


def test_sssp_weighted_shortcut_beats_hop_count(ray_session):
    """The weighted answer must differ from BFS: a 3-hop cheap path
    (1+1+1) beats the 1-hop weight-10 edge."""
    wpairs = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    want = pd.DataFrame({"node": [0, 1, 2, 3], "dist": [0, 1, 2, 3]}).astype("int64")
    pd.testing.assert_frame_equal(_sssp_solve(wpairs, [0]), want)
    pd.testing.assert_frame_equal(
        _sssp_solve(wpairs, [0], force_distributed=True, num_buckets=2), want
    )


def test_sssp_parallel_edges_zero_weights_and_guards(ray_session):
    # parallel edges keep the cheapest; zero weights legal
    wpairs = [(0, 1, 5), (0, 1, 2), (1, 2, 0)]
    want = pd.DataFrame({"node": [0, 1, 2], "dist": [0, 2, 2]}).astype("int64")
    pd.testing.assert_frame_equal(_sssp_solve(wpairs, [0]), want)
    with pytest.raises(Exception, match="negative edge weight"):
        _sssp_solve([(0, 1, -1)], [0])
    assert _sssp_solve([(0, 1, 3)], []).empty
    got = _sssp_solve([], [7])
    pd.testing.assert_frame_equal(
        got, pd.DataFrame({"node": [7], "dist": [0]}).astype("int64")
    )


def test_sssp_query_matches_dijkstra_golden(ray_session):
    from knowledge_graph_construction_ray.golden import sssp_golden
    from knowledge_graph_construction_ray.query.relational import graph_sssp

    sf = "/root/testdata/sf0.001"
    got = graph_sssp(sf).reset_index(drop=True)
    want = sssp_golden(sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
