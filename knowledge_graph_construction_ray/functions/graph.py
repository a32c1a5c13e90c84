"""Distributed connected components over an edge Dataset.

Min-label propagation with POINTER JUMPING: every iteration runs three
bucketed all-to-all exchanges over tables bounded by |V| + 2|E| rows —

1. *propagate*: co-locate each node's current label with the edges that
   leave it (hash bucket on the source key), emit one per-bucket
   partial-min candidate label per destination;
2. *combine*: co-locate candidates with the node's own label, take the
   min → ``new``;
3. *jump*: label[v] ← label[label[v]] (one more co-locating exchange),
   which halves the pointer-chain depth every round, so convergence is
   O(log(diameter)) rounds instead of O(diameter) for plain hash-min —
   the difference between 40 and 6 exchange rounds on a path graph, and
   the standard trick from the MapReduce CC literature (Kiveris et al.,
   "Connected Components in MapReduce and Beyond").

Per-iteration state is ONLY the (node, label) table — |V| rows, hash
partitioned; it is re-``materialize()``d each round (the documented
exception to no-mid-pipeline-materialization: without it, the lazy
lineage would re-execute every prior round per iteration, turning
O(log n) rounds into O(log² n) work).  Edges are materialized once,
bidirectional and deduped, and re-streamed from the object store each
round.  Nothing ever lands on the driver except the scalar
changed-count used for the convergence test, so the loop holds at any
|V| that fits the cluster's aggregate store.

The kernel inside every bucket is a vectorized pandas merge/groupby —
no per-node or per-edge Python.  Labels are monotone non-increasing and
bounded below by the component minimum, so the fixpoint (changed == 0)
is exactly "every node carries its component's minimum node id".

No reference counterpart (the reference's only graph state is the
Neo4j sink); this is the custom-operator family from the build brief —
the same union-find semantics as stages/link.py canonicalization, but
for arbitrary edge tables at cluster scale rather than the driver-side
alias forest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupby import hash_bucket

_SCHEMA = ["key", "a", "b", "role"]


def _frame(key, a, b, role) -> pd.DataFrame:
    """Index-free builder: everything through numpy (a pandas Series
    argument would align on its leftover index and NaN-fill), scalars
    broadcast to the key length."""
    k = np.asarray(key, dtype=np.int64)

    def col(x, dtype):
        arr = np.asarray(getattr(x, "to_numpy", lambda: x)(), dtype=dtype)
        return np.broadcast_to(arr, k.shape).copy() if arr.ndim == 0 else arr

    return pd.DataFrame(
        {
            "key": k,
            "a": col(a, np.int64),
            "b": col(b, np.int64),
            "role": col(role, np.int8),
        }
    )


def _bucket_exchange(ds, kernel, num_buckets: int):
    """One co-locating exchange: hash-bucket on ``key``, then
    ``groupby('_bucket').map_groups`` — groupby's semantic contract (the
    kernel sees ALL rows of a bucket in one call) is what a plain
    ``sort('_bucket')`` + per-block map does NOT give once a bucket
    outgrows one output block, and the combine/jump kernels below are
    only correct over whole buckets."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=hash_bucket(df, ["key"], num_buckets))

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = kernel(df.drop(columns=["_bucket"]))
        if out.empty:  # empty Ray blocks drop schema downstream — keep it
            return _frame([], [], [], [])
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def undirect_edges(edges_ds, src: str = "src", dst: str = "dst"):
    """Both directions, self-loops dropped, exact-deduped (bucketed, so
    the dedup exchange carries at most one row per distinct directed
    edge out of each combiner)."""
    from .groupby import bucketed_agg

    def both(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src].to_numpy(np.int64)
        d = df[dst].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
            }
        ).drop_duplicates()

    return bucketed_agg(
        edges_ds.map_batches(both, batch_format="pandas"),
        ["src", "dst"],
        {"_n": ("src", "size")},
    ).select_columns(["src", "dst"])


def peel_core_numbers(src: np.ndarray, dst: np.ndarray) -> pd.DataFrame:
    """Exact core numbers by minimum-degree peeling (Matula–Beck order),
    implemented as a LAZY-DELETION binary heap (O(E log E) with stale
    entries skipped on pop; measured 5.9 s at 1.6M directed edges —
    a Batagelj–Zaveršnik bucket queue would be O(V+E) if this ever
    becomes the bottleneck), sequential and vectorized-setup: the
    independent algorithm the distributed h-index iteration is tested
    against.  Input: BOTH directions of every undirected edge, no
    self-loops."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    if not n:
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "core": pd.Series(dtype="int64")}
        )
    e_src, e_dst = inv[: len(src)], inv[len(src) :]
    order = np.argsort(e_src, kind="stable")
    nbr = e_dst[order]
    deg = np.zeros(n, np.int64)
    np.add.at(deg, e_src, 1)
    offs = np.concatenate([[0], np.cumsum(deg)])

    import heapq

    cur = deg.copy()
    core = np.zeros(n, np.int64)
    removed = np.zeros(n, dtype=bool)
    heap = [(int(cur[v]), int(v)) for v in range(n)]
    heapq.heapify(heap)
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if removed[v] or d != cur[v]:
            continue  # stale entry
        k = max(k, d)
        core[v] = k
        removed[v] = True
        for u in nbr[offs[v] : offs[v + 1]]:
            if not removed[u]:
                cur[u] -= 1
                heapq.heappush(heap, (int(cur[u]), int(u)))
    return pd.DataFrame({"node": nodes, "core": core})


def core_numbers(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 16,
    max_iters: int = 128,
    local_threshold: int = 2_000_000,
    force_distributed: bool = False,
    exhaustion_fallback: bool = True,
):
    """Core number (largest k with v inside the k-core) for every node.

    Distributed plan: synchronous H-INDEX ITERATION (Lü, Zhou, Zhang &
    Stanley, "The H-index of a network node and its relation to degree
    and coreness", Nat. Commun. 2016) — init c(v) = degree(v), then
    c(v) ← min(c(v), H(neighbor c-values)) until no change, where H is
    the h-index (largest h with ≥h neighbors valued ≥h).  The sequence
    is monotone non-increasing and bounded below by the core number, so
    the fixpoint is exact; each round is TWO bucketed exchanges (c-values
    meet out-edges on the source key → neighbor-value stream keyed by
    destination → per-bucket vectorized h-index), per-round volume
    \\|V\\| + 2\\|E\\| rows, driver sees only the changed-count scalar.
    The per-bucket h-index is pure index arithmetic: values sorted
    descending within each node, h = #{i : v_i ≥ i} (prefix-closed, so a
    plain count works).

    Round count is O(graph diameter) in the worst case — a pendant or
    degree-2 chain erodes by ~one node per round (true of every
    vertex-centric exact k-core).  If ``max_iters`` rounds don't
    converge, the loop finishes EXACTLY via the driver-side peel
    (feasible well past the dispatch threshold — the peel needs only
    the edge list) instead of failing.

    At or below ``local_threshold`` deduped directed edges the graph is
    pulled to the driver and solved by :func:`peel_core_numbers` —
    min-degree peeling, a DIFFERENT algorithm, which is also the test
    oracle for the distributed path (``force_distributed``).  The
    threshold is set where the driver-side heap peel (measured 5.9 s at
    1.6M directed edges, linear-ish) crosses the distributed path's
    per-round exchange overhead (8.6 s at 800k edges / 16 CPUs —
    round-count-bound, so it grows far slower than the peel).
    """
    import ray.data as rd

    edges = undirect_edges(edges_ds, src, dst).materialize()

    if not force_distributed and edges.count() <= local_threshold:
        df = edges.to_pandas()
        if df.empty:
            return rd.from_pandas(
                pd.DataFrame(
                    {"node": pd.Series(dtype="int64"), "core": pd.Series(dtype="int64")}
                )
            )
        return rd.from_pandas(
            peel_core_numbers(
                df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)
            )
        )

    from .groupby import bucketed_agg

    deg = bucketed_agg(edges, ["src"], {"deg": ("dst", "size")})

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["deg"], 0, 0)

    state = deg.map_batches(seed, batch_format="pandas").materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["dst"], 0, 1)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["role"] == 0]
        out = [lab[_SCHEMA]]
        e = df[df["role"] == 1]
        if len(e) and len(lab):
            m = e.merge(
                lab[["key", "a"]].rename(columns={"a": "_c"}), on="key", how="inner"
            )
            # neighbor c-values keyed by DESTINATION (h-index needs the
            # full multiset — not pre-reducible like a min/sum)
            out.append(_frame(m["a"], m["_c"], 0, 1))
        return pd.concat(out, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[df["role"] == 1]
        old = df.loc[df["role"] == 0, ["key", "a"]]
        if len(vals):
            v = vals.sort_values(["key", "a"], ascending=[True, False], kind="mergesort")
            k = v["key"].to_numpy(np.int64)
            change = np.empty(len(k), dtype=bool)
            change[0] = True
            np.not_equal(k[1:], k[:-1], out=change[1:])
            seg_start = np.flatnonzero(change)
            lens = np.diff(np.append(seg_start, len(k)))
            pos = np.arange(len(k), dtype=np.int64) - np.repeat(seg_start, lens) + 1
            hit = (v["a"].to_numpy(np.int64) >= pos).astype(np.int64)
            h = pd.DataFrame({"key": k, "_h": hit}).groupby("key", as_index=False)[
                "_h"
            ].sum()
            g = old.merge(h, on="key", how="left")
            hv = g["_h"].fillna(0).astype(np.int64).to_numpy()
        else:
            g = old.copy()
            hv = np.zeros(len(g), np.int64)
        oldc = g["a"].to_numpy(np.int64)
        newc = np.minimum(oldc, hv)
        return _frame(g["key"], newc, (newc != oldc).astype(np.int64), 0)

    converged = False
    for _ in range(max_iters):
        staged = _bucket_exchange(state.union(edge_tagged), propagate, num_buckets)
        # combine re-derives b from scratch and propagate only reads
        # key/a/role, so new_state feeds the next round directly — no
        # second per-round |V|-row pass to zero b
        state = _bucket_exchange(staged, combine, num_buckets).materialize()
        if not state.sum("b"):
            converged = True
            break
    if not converged:
        # High-diameter graphs (pendant/degree-2 chains) erode the
        # h-index by ~1 node per round — O(diameter) rounds, like every
        # vertex-centric exact k-core.  Rather than fail, finish EXACTLY
        # on the driver: the peel is a different algorithm and needs only
        # the edge list (~16 B/edge), which is feasible far above the
        # dispatch threshold.  Parity/scale tests pass
        # ``exhaustion_fallback=False`` so a stalled distributed kernel
        # can never be silently graded against its own oracle.
        if exhaustion_fallback and edges.count() <= 20 * local_threshold:
            df = edges.to_pandas()
            return rd.from_pandas(
                peel_core_numbers(
                    df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)
                )
            )
        raise RuntimeError(
            f"core_numbers did not converge in {max_iters} rounds "
            "(rounds needed ~ graph diameter); raise max_iters or enable "
            "exhaustion_fallback"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["key"].astype("int64"), "core": df["a"].astype("int64")}
        )

    return state.map_batches(finish, batch_format="pandas")


def pagerank(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 10,
    scale: int = 10**9,
    num_buckets: int = 16,
    seeds: np.ndarray | None = None,
):
    """PageRank over a directed edge Dataset, in EXACT int64 arithmetic.

    ``seeds`` switches to PERSONALIZED PageRank: the same total teleport
    and dangling mass is directed ONLY at the seed nodes (per-seed
    teleport ``(3·scale·N)//(20·|S|)``, dangling ``(17·Σr//20)//|S|``)
    instead of uniformly — rank then measures proximity to the seed set.
    The seed array rides the task closures (assumed small — hundreds to
    thousands; a huge personalization vector would need a broadcast
    join instead).  Seeds absent from the graph are ignored identically
    on both the distributed and golden side.

    Ranks are integers in units of ``1/scale`` (init = ``scale`` per
    node, damping 17/20 = 0.85, teleport 3·scale//20).  Every per-edge
    share is ``(rank * 17) // (20 * outdeg)`` and every combine is an
    int64 sum — associative and commutative, so the result is
    bit-identical regardless of partitioning, block order or summation
    order.  That determinism is the point: a sequential single-process
    reimplementation (golden.py) reproduces the distributed result
    hash-exactly, which no float formulation can promise.  Truncation
    mass simply leaks (total mass decays slightly per round) —
    deterministic and shared with the oracle.  Dangling (out-degree-0)
    mass is redistributed uniformly: ``(17·Σr_dangling // 20) // N``
    added to every node, with the scalar Σ computed by a streaming
    ``Dataset.sum`` per round (the only driver-side value, like the
    connected-components changed-count).

    Overflow bound: N·scale·17 must stay under 2^63 — scale=1e9 is safe
    to ~5·10^8 nodes; lower ``scale`` beyond that.  Seeded mode
    concentrates mass: the bound becomes N·scale·17/|S| < 2^63 (a seed's
    rank approaches N·scale/|S|), so lower ``scale`` accordingly for
    tiny seed sets on huge graphs.

    Per-iteration plan: ONE co-locating exchange on the source key
    (rank+outdeg rows meet out-edges; per-bucket partial sums of
    destination contributions), ONE exchange on the node key (partials
    + node table → new rank), |V|-row state re-materialized per round
    exactly as in :func:`connected_components`.  Duplicate directed
    edges are exact-deduped first; self-loops are kept.

    Returns a Ray Dataset of (node int64, rank_scaled int64).
    """
    from .groupby import bucketed_agg

    teleport = (3 * scale) // 20
    seeds_arr = (
        None if seeds is None else np.unique(np.asarray(seeds, dtype=np.int64))
    )
    if seeds_arr is not None and not len(seeds_arr):
        raise ValueError("personalized pagerank needs a non-empty seed set")

    def dedup_dir(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src].to_numpy(np.int64),
                "dst": df[dst].to_numpy(np.int64),
            }
        ).drop_duplicates()

    edges = bucketed_agg(
        edges_ds.map_batches(dedup_dir, batch_format="pandas"),
        ["src", "dst"],
        {"_n": ("src", "size")},
    ).select_columns(["src", "dst"]).materialize()

    # node table with out-degree (sinks appear with outdeg 0)
    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": np.concatenate([s, d]),
                "a": np.concatenate(
                    [np.ones(len(s), np.int64), np.zeros(len(d), np.int64)]
                ),
            }
        )

    nodes = bucketed_agg(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["key"],
        {"out": ("a", "sum")},
    ).materialize()
    n_nodes = nodes.count()
    if not n_nodes:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "node": pd.Series(dtype="int64"),
                    "rank_scaled": pd.Series(dtype="int64"),
                }
            )
        )

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        k = df["key"].to_numpy(np.int64)
        return _frame(k, np.full(len(k), scale, np.int64), df["out"], 0)

    # state rows: key=node, a=rank, b=outdeg, role=0
    state = nodes.map_batches(seed, batch_format="pandas").materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["dst"], 0, 1)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def dangling_partial(df: pd.DataFrame) -> pd.DataFrame:
        r = df.loc[df["b"] == 0, "a"].to_numpy(np.int64)
        return pd.DataFrame({"d": np.array([r.sum()], dtype=np.int64)})

    for _ in range(iters):
        dang = state.map_batches(dangling_partial, batch_format="pandas").sum("d")
        if seeds_arr is None:
            dang_share = ((17 * int(dang)) // 20) // n_nodes
            seed_boost = 0
        else:
            dang_share = 0  # all teleport+dangling mass goes to the seeds
            seed_boost = (3 * scale * n_nodes) // (20 * len(seeds_arr)) + (
                (17 * int(dang)) // 20
            ) // len(seeds_arr)

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            lab = df[df["role"] == 0]
            out = [lab[_SCHEMA]]
            e = df[df["role"] == 1]
            spread = lab[lab["b"] > 0]
            if len(e) and len(spread):
                share = (spread["a"].to_numpy(np.int64) * 17) // (
                    20 * spread["b"].to_numpy(np.int64)
                )
                m = e.merge(
                    pd.DataFrame(
                        {"key": spread["key"].to_numpy(np.int64), "_s": share}
                    ),
                    on="key",
                    how="inner",
                )
                # per-bucket partial sum per destination
                part = m.groupby("a", as_index=False)["_s"].sum()
                out.append(_frame(part["a"], part["_s"], 0, 1))
            return pd.concat(out, ignore_index=True)

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            node_rows = df[df["role"] == 0]
            contrib = df[df["role"] == 1].groupby("key", as_index=False)["a"].sum()
            g = node_rows[["key", "b"]].merge(contrib, on="key", how="left")
            c = g["a"].fillna(0).astype(np.int64).to_numpy()
            if seeds_arr is None:
                tele = teleport + dang_share
            else:
                tele = np.where(
                    np.isin(g["key"].to_numpy(np.int64), seeds_arr),
                    seed_boost,
                    0,
                ).astype(np.int64)
            return _frame(g["key"], tele + c, g["b"], 0)

        staged = _bucket_exchange(state.union(edge_tagged), propagate, num_buckets)
        state = _bucket_exchange(staged, combine, num_buckets).materialize()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["key"].astype("int64"),
                "rank_scaled": df["a"].astype("int64"),
            }
        )

    return state.map_batches(finish, batch_format="pandas")


def _local_components(src: np.ndarray, dst: np.ndarray) -> pd.DataFrame:
    """Driver-side vectorized min-label propagation with pointer
    jumping (numpy only — no per-node Python).  ``np.unique`` sorts
    ascending, so index order == id order and the index-space minimum
    maps back to the id-space minimum."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    if not len(nodes):
        return pd.DataFrame({"node": nodes, "component": nodes})
    e_src, e_dst = inv[: len(src)], inv[len(src) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = label.copy()
        np.minimum.at(label, e_dst, label[e_src])
        np.minimum.at(label, e_src, label[e_dst])
        while True:  # full path compression
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, old):
            break
    return pd.DataFrame({"node": nodes, "component": nodes[label]})


def _pairs_within_segments(seg: np.ndarray):
    """Index pairs (i, j), i < j, within each run of equal ``seg`` values
    (input must be sorted by ``seg``).  Pure index arithmetic — no per-
    segment Python: for element ``i`` with ``f`` followers in its run,
    emit ``f`` pairs (i, i+1..i+f)."""
    n = len(seg)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(seg[1:], seg[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))
    seg_end = np.repeat(starts + lens, lens)  # exclusive run end, per element
    following = seg_end - np.arange(n) - 1
    left = np.repeat(np.arange(n, dtype=np.int64), following)
    cum = np.concatenate([[0], np.cumsum(following)])
    within = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], following)
    return left, left + 1 + within


def triangle_counts(edges_ds, src: str = "src", dst: str = "dst", *, num_buckets: int = 16):
    """Per-node triangle participation counts (nodes in ≥1 triangle).

    Degree-ordered wedge counting — the standard skew-bounded plan
    (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer"): orient every undirected edge from its lower-rank to
    its higher-rank endpoint where rank = (degree, id), so every node's
    out-degree is O(sqrt(2|E|)) regardless of hub skew; enumerate each
    node's out-neighbor pairs (wedges, sorted so v precedes w in rank);
    a wedge (u; v, w) closes a triangle iff the oriented edge (v, w)
    exists.  Every triangle is found exactly once, at its lowest-rank
    corner.

    Shuffle plan: two hash joins attach endpoint degrees, one coarse-
    bucket exchange co-locates out-edges per source for vectorized pair
    enumeration, one role-tagged coarse-bucket exchange on the (v, w)
    pair probes wedges against the oriented edge set (NOT a native Arrow
    join: the wedge kernel legitimately emits zero rows for degree-1
    buckets, and ``map_groups`` output partitions that end up all-empty
    lose their schema, which poisons Arrow join partitions that receive
    no rows — "No match for FieldRef"), and one ``bucketed_agg`` sums
    the three corner increments.  Wedge volume is Σ d_out² ≤ O(|E|^1.5)
    — the algorithm's known bound — and no stage materializes on the
    driver.
    """
    from .groupby import bucketed_agg, bucketed_groups

    def _ren(ds, mapping):
        # Dataset.rename_columns assumes Arrow blocks; these are pandas
        return ds.map_batches(
            lambda df: df.rename(columns=mapping), batch_format="pandas"
        )

    # Each JoinOperator spawns num_partitions aggregator actors and this
    # plan chains THREE joins — size to the session like stages/dedupe.py
    # ::_default_join_partitions or small (test) sessions deadlock.
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    jp = max(2, min(num_buckets, cpus))

    edges = undirect_edges(edges_ds, src, dst).materialize()
    deg = bucketed_agg(edges, ["src"], {"deg": ("dst", "size")})

    with_sdeg = _ren(
        edges.join(deg, join_type="inner", num_partitions=jp, on=("src",)),
        {"deg": "_ds"},
    )
    with_bdeg = _ren(
        with_sdeg.join(
            _ren(deg, {"src": "dst"}),
            join_type="inner",
            num_partitions=jp,
            on=("dst",),
        ),
        {"deg": "_dd"},
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        ds_, dd = df["_ds"].to_numpy(np.int64), df["_dd"].to_numpy(np.int64)
        s, d = df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)
        keep = (ds_ < dd) | ((ds_ == dd) & (s < d))
        return pd.DataFrame({"src": s[keep], "dst": d[keep], "_dd": dd[keep]})

    oriented = with_bdeg.map_batches(orient, batch_format="pandas").materialize()

    _W_COLS = ("k1", "k2", "u", "role")

    def _wframe(k1, k2, u, role) -> pd.DataFrame:
        return pd.DataFrame(
            dict(zip(_W_COLS, (np.asarray(x, dtype=np.int64) for x in (k1, k2, u, role))))
        )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # neighbors sorted by rank within each source so v precedes w
        df = df.sort_values(["src", "_dd", "dst"], kind="mergesort")
        u = df["src"].to_numpy(np.int64)
        nb = df["dst"].to_numpy(np.int64)
        li, ri = _pairs_within_segments(u)
        return _wframe(nb[li], nb[ri], u[li], np.ones(len(li), np.int64))

    wedge_ds = bucketed_groups(oriented, ["src"], wedges, num_buckets=num_buckets)

    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return _wframe(df["src"], df["dst"], np.zeros(n, np.int64), np.zeros(n, np.int64))

    tagged = wedge_ds.union(oriented.map_batches(edge_keys, batch_format="pandas"))

    def close_and_count(df: pd.DataFrame) -> pd.DataFrame:
        ed = df.loc[df["role"] == 0, ["k1", "k2"]]
        wd = df[df["role"] == 1]
        m = wd.merge(ed, on=["k1", "k2"], how="inner")  # each match = one triangle
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [m[c].to_numpy(np.int64) for c in ("u", "k1", "k2")]
                )
            }
        )

    corner_ds = bucketed_groups(
        tagged, ["k1", "k2"], close_and_count, num_buckets=num_buckets
    )

    return bucketed_agg(corner_ds, ["node"], {"n_triangles": ("node", "size")})


def connected_components(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 16,
    max_iters: int = 64,
    local_threshold: int = 5_000_000,
    force_distributed: bool = False,
) -> "pd.DataFrame | object":
    """Label every node with the MINIMUM node id of its component.

    Returns a Ray Dataset of (node int64, component int64).  Raises if
    the fixpoint is not reached within ``max_iters`` rounds (pointer
    jumping makes that bound generous: 64 covers diameters up to 2^64).

    Size dispatch (same pattern as stages/embed.py::cosine_pairs): at or
    below ``local_threshold`` deduped directed edges the graph is pulled
    to the driver (bounded: 5M edges ≈ 80 MB) and solved with the
    vectorized numpy kernel — the distributed loop's per-round exchange
    overhead (3 sort-shuffles × O(log d) rounds) only pays for itself
    when |V|+|E| exceeds a single worker's memory.  ``force_distributed``
    exercises the scale path in tests regardless of size.
    """
    import ray.data as rd

    edges = undirect_edges(edges_ds, src, dst).materialize()

    if not force_distributed and edges.count() <= local_threshold:
        df = edges.to_pandas()
        if df.empty:
            out = pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "component": pd.Series(dtype="int64")}
            )
        else:
            out = _local_components(
                df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)
            )
        return rd.from_pandas(out)

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["src"].to_numpy(np.int64))
        return _frame(u, u, u, 0)

    # per-block distinct → one exchange dedups nodes and seeds label=self
    def seed(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", as_index=False).first()
        return _frame(g["key"], g["key"], g["key"], 0)

    labels = _bucket_exchange(
        edges.map_batches(init_labels, batch_format="pandas"), seed, num_buckets
    ).materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["dst"], 0, 1)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["role"] == 0]
        out = [_frame(lab["key"], lab["a"], 0, 0)]  # labels pass through
        e = df[df["role"] == 1]
        if len(e) and len(lab):
            m = e.merge(
                lab[["key", "a"]].rename(columns={"a": "_lbl"}), on="key", how="inner"
            )
            # partial min per destination WITHIN this bucket — the combine
            # exchange sees ≤ num_buckets candidate rows per node
            cand = m.groupby("a", as_index=False)["_lbl"].min()
            out.append(_frame(cand["a"], cand["_lbl"], 0, 1))
        return pd.concat(out, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        new = df.groupby("key", as_index=False)["a"].min()
        old = df.loc[df["role"] == 0, ["key", "a"]].rename(columns={"a": "_old"})
        g = new.merge(old, on="key", how="inner")
        # emit the jump exchange's two roles: the label table keyed by
        # node (role 0) and one lookup request keyed by the new label
        # (role 1, carrying node + old label for the change test)
        return pd.concat(
            [_frame(g["key"], g["a"], 0, 0), _frame(g["a"], g["key"], g["_old"], 1)],
            ignore_index=True,
        )

    def jump(df: pd.DataFrame) -> pd.DataFrame:
        tab = df.loc[df["role"] == 0, ["key", "a"]].rename(columns={"a": "_t"})
        req = df[df["role"] == 1]
        m = req.merge(tab, on="key", how="left")
        # a label always names a live node, so _t is never null; the
        # fillna is belt-and-braces against an empty bucket slice
        lbl = m["_t"].fillna(m["key"]).astype(np.int64)
        return _frame(m["a"], lbl, (lbl.to_numpy() != m["b"].to_numpy()).astype(np.int64), 0)

    for _ in range(max_iters):
        stream = labels.union(edge_tagged)
        cand = _bucket_exchange(stream, propagate, num_buckets)
        staged = _bucket_exchange(cand, combine, num_buckets)
        new_labels = _bucket_exchange(staged, jump, num_buckets).materialize()
        changed = new_labels.sum("b")
        labels = (
            new_labels.map_batches(
                lambda df: _frame(df["key"], df["a"], 0, 0), batch_format="pandas"
            ).materialize()
        )
        if not changed:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["key"].astype("int64"),
                "component": df["a"].astype("int64"),
            }
        )

    return labels.map_batches(finish, batch_format="pandas")


def _local_bfs(src: np.ndarray, dst: np.ndarray, seeds: np.ndarray) -> pd.DataFrame:
    """Driver-side vectorized multi-source BFS (numpy only): CSR via one
    argsort + searchsorted, each level expands the whole frontier with
    repeat/cumsum ragged gathers — no per-node Python.  Returns
    (node, dist) for REACHED nodes only; seeds count as reached (dist 0)
    even when isolated."""
    nodes = np.unique(np.concatenate([src, dst, seeds]))
    if not len(nodes):
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
        )
    e_src = np.searchsorted(nodes, src)
    e_dst = np.searchsorted(nodes, dst)
    order = np.argsort(e_src, kind="stable")
    adj = e_dst[order]
    sorted_src = e_src[order]
    starts = np.searchsorted(sorted_src, np.arange(len(nodes)))
    ends = np.searchsorted(sorted_src, np.arange(len(nodes)) + 1)
    dist = np.full(len(nodes), -1, np.int64)
    frontier = np.unique(np.searchsorted(nodes, seeds))
    dist[frontier] = 0
    d = 0
    while len(frontier):
        d += 1
        cnt = ends[frontier] - starts[frontier]
        total = int(cnt.sum())
        if total == 0:
            break
        base = np.repeat(starts[frontier], cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        neigh = np.unique(adj[base + offs])
        new = neigh[dist[neigh] < 0]
        if not len(new):
            break
        dist[new] = d
        frontier = new
    reached = dist >= 0
    return pd.DataFrame({"node": nodes[reached], "dist": dist[reached]})


def bfs_distances(
    edges_ds,
    seeds,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 16,
    max_rounds: int = 256,
    local_threshold: int = 5_000_000,
    force_distributed: bool = False,
) -> "object":
    """Multi-source unweighted shortest hop distances (BFS).

    Returns a Ray Dataset of (node int64, dist int64) covering exactly
    the nodes REACHABLE from the seed set (seeds included at dist 0,
    isolated or not).  Undirected semantics, like the rest of the graph
    family.

    Distributed plan: frontier-synchronous label propagation — the
    distance table rows (node, dist, frontier-flag) and the out-edge
    rows meet on the source key (exchange 1); only FRONTIER nodes (those
    first reached last round) emit dist+1 candidates, pre-minimized per
    bucket; candidates then meet the distance table on the node key
    (exchange 2) where discovery = a candidate for an absent node (unit
    edges ⇒ a node's first-seen distance is final; the min-combine still
    guards the invariant).  Per-round volume \\|V\\|+2\\|E\\| rows, the
    driver sees only the newly-discovered count.  Round count is the
    seed set's ECCENTRICITY — inherent to BFS, unlike components where
    pointer jumping cuts it to O(log d) — so the distributed arm only
    pays on low-diameter (expander/chorded) graphs; on an O(n)-diameter
    chain use the driver kernel or reshape the question to components.
    Raises on round exhaustion: unlike k-core there is no cheaper exact
    driver finish for a half-propagated wavefront, so exhaustion on a
    graph that was explicitly ``force_distributed`` is an input-shape
    error, not a fallback case.

    Size dispatch as in :func:`connected_components`: at or below
    ``local_threshold`` deduped directed edges the graph is pulled to
    the driver (bounded ~80 MB) and solved by the vectorized numpy BFS.
    """
    import ray.data as rd

    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if not len(seeds):
        return rd.from_pandas(
            pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
            )
        )

    edges = undirect_edges(edges_ds, src, dst).materialize()

    if not force_distributed and edges.count() <= local_threshold:
        df = edges.to_pandas()
        if df.empty:
            out = pd.DataFrame({"node": seeds, "dist": np.zeros(len(seeds), np.int64)})
        else:
            out = _local_bfs(
                df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64), seeds
            )
        return rd.from_pandas(out)

    # dist table: key=node, a=dist, b=frontier flag (reached last round)
    dist = rd.from_pandas(_frame(seeds, 0, 1, 0)).materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["dst"], 0, 1)

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["role"] == 0]
        out = [_frame(lab["key"], lab["a"], 0, 0)]  # table passes through
        frontier = lab[lab["b"] == 1]
        e = df[df["role"] == 1]
        if len(e) and len(frontier):
            m = e.merge(
                frontier[["key", "a"]].rename(columns={"a": "_d"}), on="key"
            )
            if len(m):
                # partial min per destination WITHIN this bucket: the
                # combine exchange sees ≤ num_buckets candidates per node
                cand = m.groupby("a", as_index=False)["_d"].min()
                out.append(_frame(cand["a"], cand["_d"] + 1, 0, 1))
        return pd.concat(out, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        known = df.loc[df["role"] == 0, ["key", "a"]]
        cand = df[df["role"] == 1]
        if not len(cand):
            return _frame(known["key"], known["a"], 0, 0)
        best = cand.groupby("key", as_index=False)["a"].min()
        m = best.merge(
            known.rename(columns={"a": "_k"}), on="key", how="outer"
        )
        has_k = m["_k"].notna().to_numpy()
        has_c = m["a"].notna().to_numpy()
        # missing-side sentinel: 2^62 is float64-EXACT (the outer merge
        # promotes to float64; int64-max would round up and overflow the
        # cast back) and larger than any hop distance
        big = float(np.int64(1) << 62)
        kf = m["_k"].fillna(big).to_numpy(np.int64)
        cf = m["a"].fillna(big).to_numpy(np.int64)
        # discovery (no prior distance) or — belt and braces — a shorter
        # path; with unit edges the second can't fire, min keeps it safe
        newd = np.minimum(kf, cf)
        improved = (~has_k) | (has_c & (newd < kf))
        return _frame(m["key"], newd, improved.astype(np.int64), 0)

    for _ in range(max_rounds):
        stream = dist.union(edge_tagged)
        cand = _bucket_exchange(stream, propagate, num_buckets)
        new_dist = _bucket_exchange(cand, combine, num_buckets).materialize()
        changed = new_dist.sum("b")
        dist = new_dist
        if not changed:
            break
    else:
        raise RuntimeError(
            f"bfs_distances did not converge in {max_rounds} rounds — the "
            "wavefront is still expanding; raise max_rounds or use the "
            "driver kernel for high-diameter graphs"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["key"].astype("int64"), "dist": df["a"].astype("int64")}
        )

    return dist.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman-Ford propagation)
# ---------------------------------------------------------------------------

_SSSP_INF = np.int64(1) << np.int64(62)  # float64-exact sentinel, like BFS


def _local_sssp(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, seeds: np.ndarray
) -> pd.DataFrame:
    """Driver-side vectorized Bellman-Ford to fixpoint: one
    ``np.minimum.at`` relaxation sweep per round over the full edge
    array — O(rounds × |E|) with no Python per-edge loop.  Exact for
    non-negative int64 weights."""
    nodes = np.unique(np.concatenate([src, dst, seeds]))
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    dist = np.full(len(nodes), _SSSP_INF, dtype=np.int64)
    dist[np.searchsorted(nodes, seeds)] = 0
    while True:
        reach = dist[s] < _SSSP_INF
        nd = dist.copy()
        if reach.any():
            np.minimum.at(nd, d[reach], dist[s][reach] + w[reach])
        if np.array_equal(nd, dist):
            break
        dist = nd
    keep = dist < _SSSP_INF
    return pd.DataFrame({"node": nodes[keep], "dist": dist[keep]})


def sssp_distances(
    edges_ds,
    seeds,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    *,
    num_buckets: int = 16,
    max_rounds: int = 256,
    local_threshold: int = 5_000_000,
    force_distributed: bool = False,
) -> "object":
    """Multi-source WEIGHTED shortest-path distances (non-negative int64
    weights, undirected semantics) — the Bellman-Ford generalization of
    :func:`bfs_distances`.

    Returns a Ray Dataset of (node int64, dist int64) covering exactly
    the nodes reachable from the seed set (seeds at dist 0).

    Distributed plan: the BFS frontier-synchronous skeleton with two
    changes — candidates carry ``frontier dist + edge weight`` instead
    of ``dist + 1``, and the frontier is the IMPROVED set (a settled
    node's distance can shrink again under weights, unlike unit edges
    where first-seen is final; the BFS combine's min + improved flag is
    already exactly the Bellman-Ford relaxation, so that code is shared
    by shape).  Per-round volume |V| + 2|E| rows; the driver sees only
    the improved-count scalar.  Rounds = the longest shortest path's HOP
    count, so the distributed arm suits low-diameter graphs — same
    dispatch advice as BFS.  Raises on round exhaustion (no cheaper
    exact finish exists for a half-relaxed wavefront).

    Weights must be non-negative (guarded per batch): Bellman-Ford with
    synchronous rounds is exact for them; negative edges would need
    |V| − 1 forced rounds and cycle detection — out of contract.

    Size dispatch as in BFS: at or below ``local_threshold`` directed
    edges the graph pulls to the driver and the vectorized
    ``np.minimum.at`` Bellman-Ford solves it in-process.
    """
    import ray.data as rd

    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if not len(seeds):
        return rd.from_pandas(
            pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
            )
        )

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        wv = df[weight].to_numpy(np.int64)
        if len(wv) and int(wv.min()) < 0:
            raise ValueError(
                "sssp_distances: negative edge weight — Bellman-Ford's "
                "synchronous-round exactness contract needs w >= 0"
            )
        s = df[src].to_numpy(np.int64)
        d = df[dst].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
                "w": np.concatenate([wv, wv]),
            }
        )
        # parallel edges: keep the cheapest per direction (exact — a
        # heavier parallel edge can never lie on a shortest path)
        return out.groupby(["src", "dst"], as_index=False)["w"].min()

    edges = edges_ds.map_batches(both_dirs, batch_format="pandas").materialize()

    if not force_distributed and edges.count() <= local_threshold:
        df = edges.to_pandas()
        if df.empty:
            out = pd.DataFrame({"node": seeds, "dist": np.zeros(len(seeds), np.int64)})
        else:
            out = _local_sssp(
                df["src"].to_numpy(np.int64),
                df["dst"].to_numpy(np.int64),
                df["w"].to_numpy(np.int64),
                seeds,
            )
        return rd.from_pandas(out)

    # dist table rows: key=node, a=dist, b=frontier(improved-last-round)
    dist = rd.from_pandas(_frame(seeds, 0, 1, 0)).materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _frame(df["src"], df["dst"], df["w"], 1)  # b slot = weight

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["role"] == 0]
        out = [_frame(lab["key"], lab["a"], 0, 0)]  # table passes through
        frontier = lab[lab["b"] == 1]
        e = df[df["role"] == 1]
        if len(e) and len(frontier):
            m = e.merge(
                frontier[["key", "a"]].rename(columns={"a": "_d"}), on="key"
            )
            if len(m):
                cand_d = m["_d"].to_numpy(np.int64) + m["b"].to_numpy(np.int64)
                c = pd.DataFrame({"a": m["a"].to_numpy(np.int64), "_d": cand_d})
                # partial min per destination WITHIN this bucket
                cand = c.groupby("a", as_index=False)["_d"].min()
                out.append(_frame(cand["a"], cand["_d"], 0, 1))
        return pd.concat(out, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        known = df.loc[df["role"] == 0, ["key", "a"]]
        cand = df[df["role"] == 1]
        if not len(cand):
            return _frame(known["key"], known["a"], 0, 0)
        best = cand.groupby("key", as_index=False)["a"].min()
        m = best.merge(known.rename(columns={"a": "_k"}), on="key", how="outer")
        has_k = m["_k"].notna().to_numpy()
        has_c = m["a"].notna().to_numpy()
        big = float(_SSSP_INF)  # float64-exact missing-side sentinel
        kf = m["_k"].fillna(big).to_numpy(np.int64)
        cf = m["a"].fillna(big).to_numpy(np.int64)
        newd = np.minimum(kf, cf)
        # Bellman-Ford relaxation: discovery OR a strictly shorter path
        improved = (~has_k) | (has_c & (newd < kf))
        return _frame(m["key"], newd, improved.astype(np.int64), 0)

    for _ in range(max_rounds):
        stream = dist.union(edge_tagged)
        cand = _bucket_exchange(stream, propagate, num_buckets)
        new_dist = _bucket_exchange(cand, combine, num_buckets).materialize()
        changed = new_dist.sum("b")
        dist = new_dist
        if not changed:
            break
    else:
        raise RuntimeError(
            f"sssp_distances did not converge in {max_rounds} rounds — "
            "relaxations are still improving; raise max_rounds or use the "
            "driver kernel for high-hop-diameter graphs"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["key"].astype("int64"), "dist": df["a"].astype("int64")}
        )

    return dist.map_batches(finish, batch_format="pandas")
