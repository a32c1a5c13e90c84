"""Similarity search over an embedding column (``list<float>``).

* **Brute-force cosine top-k** — the exact baseline: the query matrix is
  broadcast once (``ray.put``), each batch computes a numpy matmul against
  it and emits its local top-k, and a final tiny sort-limit reduces to the
  global top-k.  Per-batch work is O(batch × dim × nq) vectorized; nothing
  but (batch_topk × nq) rows ever shuffle.
* **IVF (inverted-file) variant** — the scale path: k-means-ish centroids
  (deterministic seeded init + a few Lloyd iterations over a sample),
  assign each vector to its nearest centroid in one map_batches pass, and
  probe only ``nprobe`` centroid buckets at query time — trading exactness
  for touching ~nprobe/ncentroids of the data.
* **LSH hyperplane buckets** — embedding near-dup candidates at scale:
  sign-pattern bucket key per vector, groupby bucket, verify cosine within
  buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _matrix(df_col) -> np.ndarray:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df_col])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(embeddings_ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each query row → Dataset[query_idx, vec_id,
    cosine] (global top-k per query).  ``query_vecs``: (nq, dim)."""
    q = np.asarray(query_vecs, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    import ray

    q_ref = ray.put(q)

    class BatchTopK:
        def __init__(self):
            self.q = ray.get(q_ref)  # broadcast once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _matrix(df[vec_col])
            sims = m @ self.q.T  # (batch, nq)
            out_qi, out_id, out_sim = [], [], []
            ids = df[id_col].to_numpy()
            top = min(k, len(df))
            for qi in range(sims.shape[1]):
                idx = np.argpartition(-sims[:, qi], top - 1)[:top]
                out_qi.extend([qi] * top)
                out_id.extend(ids[idx])
                out_sim.extend(sims[idx, qi])
            return pd.DataFrame(
                {"query_idx": out_qi, id_col: out_id, "cosine": out_sim}
            )

    local = embeddings_ds.map_batches(
        BatchTopK, batch_format="pandas", batch_size=4096, concurrency=2
    )

    # global reduce: tiny (num_blocks × nq × k rows).  The top-k selection
    # MUST happen inside the group kernel — groupby.map_groups does not
    # preserve any upstream sort order (observed: a pre-sort + head(k)
    # returned arbitrary rows at ≥16 blocks), so sort-then-head per group.
    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

    return (
        local.groupby("query_idx")
        .map_groups(reduce_group, batch_format="pandas")
        .sort(["query_idx", "cosine", id_col], descending=[False, True, False])
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def sample_vectors(embeddings_ds, target_n: int = 65536,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Deterministic DISTRIBUTED sample of ~``target_n`` rows: every block
    keeps the rows whose hashed id falls under target_n/total — unbiased
    across the whole table (a ``limit(n)`` head sample sees only the first
    file and trains centroids on whatever sorted prefix lives there).
    Returned sorted by id for run-to-run determinism."""
    total = embeddings_ds.count()
    take = embeddings_ds.select_columns([id_col, vec_col])
    if total > target_n:
        cutoff = np.uint64(int((target_n / total) * (1 << 64)))

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
            return df[h.astype(np.uint64) < cutoff]

        take = take.map_batches(pick, batch_format="pandas")
    return take.to_pandas().sort_values(id_col).reset_index(drop=True)


def train_centroids(embeddings_ds, n_centroids: int | None = 16, iters: int = 5,
                    sample_limit: int = 65536, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic mini k-means over a distributed hash-sample (no
    wall-clock, no RNG).  ``n_centroids=None`` sizes the codebook to
    ~sqrt(n) — the standard IVF rule of thumb.

    Init is greedy farthest-point (k-center) over the sample — still fully
    deterministic, but it spreads the codebook across the data's actual
    modes.  (A first-n-rows init seeds several near-duplicate centroids
    inside one dense cluster; Lloyd never merges them, so true neighbors
    split across twin buckets and probe recall collapses — observed on a
    1024-mode mixture.)"""
    if n_centroids is None:
        n_centroids = max(16, int(np.sqrt(max(embeddings_ds.count(), 1))))
    sample = _matrix(
        sample_vectors(embeddings_ds, sample_limit, id_col=id_col, vec_col=vec_col)[vec_col]
    )
    n_centroids = min(n_centroids, len(sample))
    cents = np.empty((n_centroids, sample.shape[1]))
    cents[0] = sample[0]
    dist = 1.0 - sample @ cents[0]  # cosine distance to nearest chosen
    for c in range(1, n_centroids):
        far = int(np.argmax(dist))
        cents[c] = sample[far]
        dist = np.minimum(dist, 1.0 - sample @ cents[c])
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_assign(embeddings_ds, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Add an ``ivf_bucket`` column (nearest centroid) — one vectorized
    pass; at scale, write partitioned by bucket for probe-time pruning."""
    import ray

    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.c = ray.get(c_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _matrix(df[vec_col])
            df = df.copy()
            df["ivf_bucket"] = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
            return df

    return embeddings_ds.map_batches(
        Assign, batch_format="pandas", batch_size=4096, concurrency=2
    )


def ivf_topk(assigned_ds, centroids: np.ndarray, query_vec: np.ndarray,
             k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k probing only the ``nprobe`` nearest buckets of an
    in-memory assigned Dataset (row filter — no I/O pruning; prefer the
    partitioned on-disk index via build_ivf_index / ivf_search_index)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))
    probe = set(int(b) for b in order[:nprobe])
    probed = assigned_ds.filter(
        expr=f"ivf_bucket in {sorted(probe)}"
    )
    return brute_force_topk(probed, q[None, :], k=k, id_col=id_col, vec_col=vec_col)


def build_ivf_index(embeddings_ds, index_dir: str, *,
                    n_centroids: int | None = None, iters: int = 5,
                    sample_limit: int = 65536,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Materialize an IVF index as bucket-PARTITIONED parquet: train
    centroids on a distributed sample, assign every vector in one
    vectorized pass, and write one directory per ``ivf_bucket`` so a probe
    only READS nprobe/ncentroids of the files (I/O pruning, not a row
    filter over everything).  Centroids persist next to the data; rebuild
    is a clean overwrite.  Returns the centroid matrix."""
    import os
    import shutil

    cents = train_centroids(
        embeddings_ds, n_centroids=n_centroids, iters=iters,
        sample_limit=sample_limit, vec_col=vec_col, id_col=id_col,
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    assigned = ivf_assign(embeddings_ds, cents, id_col=id_col, vec_col=vec_col)
    assigned.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    np.save(os.path.join(index_dir, "_centroids.npy"), cents)
    return cents


def ivf_search_index(index_dir: str, query_vec: np.ndarray, *,
                     k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Query a partitioned IVF index: rank centroids, read ONLY the
    ``nprobe`` nearest bucket directories, brute-force within them.
    Probe cost scales with nprobe/ncentroids of the data touched."""
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(cents @ q))
    import glob

    files: list[str] = []
    for b in order[:nprobe]:
        d = os.path.join(index_dir, f"ivf_bucket={int(b)}")
        if os.path.isdir(d):  # empty buckets have no directory
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        return rd.from_items([])
    probed = rd.read_parquet(files)
    return brute_force_topk(probed, q[None, :], k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# Hyperplane LSH buckets (embedding near-dup at scale)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int = 16) -> np.ndarray:
    # deterministic pseudo-random planes (hash-seeded, no RNG state)
    import zlib

    vals = np.array(
        [
            (zlib.crc32(f"{p}:{d}".encode()) / 0xFFFFFFFF) * 2.0 - 1.0
            for p in range(n_planes)
            for d in range(dim)
        ],
        dtype=np.float64,
    ).reshape(n_planes, dim)
    return vals / np.linalg.norm(vals, axis=1, keepdims=True)


def lsh_bucket_kernel(n_planes: int = 16, vec_col: str = "embedding"):
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        m = _matrix(df[vec_col])
        planes = _hyperplanes(m.shape[1], n_planes)
        bits = (m @ planes.T) > 0
        keys = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        df = df.copy()
        df["lsh_bucket"] = keys.astype(np.int64)
        return df

    return kernel


def lsh_candidate_pairs(embeddings_ds, *, n_tables: int = 12, n_planes: int = 8,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        num_buckets: int = 64):
    """Distributed embedding near-dup candidates: ``n_tables`` independent
    hyperplane sign-hashes of ``n_planes`` bits each (banding — one table's
    collision suffices), shuffled on a coarse hash bucket of (table,
    bucket_key), pair-expanded by a C-speed self-merge, deduped in the
    shuffle.  Returns Dataset[a, b] with a < b."""
    from ..functions.groupby import bucketed_agg, bucketed_groups
    from .dedupe import _group_pairs

    def keys_kernel(df: pd.DataFrame) -> pd.DataFrame:
        m = _matrix(df[vec_col])
        planes = _hyperplanes(m.shape[1], n_tables * n_planes)
        bits = (m @ planes.T) > 0  # (batch, tables*planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        frames = []
        for t in range(n_tables):
            sl = bits[:, t * n_planes : (t + 1) * n_planes]
            key = (sl * weights).sum(axis=1)
            frames.append(
                pd.DataFrame(
                    {"table_id": t, "bucket_key": key, "doc_id": df[id_col]}
                )
            )
        return pd.concat(frames, ignore_index=True)

    rows = embeddings_ds.map_batches(keys_kernel, batch_format="pandas")
    pairs = bucketed_groups(
        rows,
        ["bucket_key", "table_id"],
        lambda g: _group_pairs(g, ["table_id", "bucket_key"]),
        num_buckets=num_buckets,
    )
    return bucketed_agg(pairs, ["a", "b"], {"_n": ("a", "size")}).drop_columns(["_n"])


def verify_cosine_pairs(pairs_ds, embeddings_ds, threshold: float, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        num_partitions: int | None = None):
    """Attach both vectors to every candidate pair (two shuffle joins) and
    verify exact cosine inside ``map_batches`` → Dataset[a, b, cosine] of
    pairs ≥ threshold.  Nothing but verified pairs leaves the workers.

    Vectors ride through the join as fixed-width float64 BYTES — Arrow's
    hash join rejects list-typed non-key payload columns."""
    from .dedupe import attach_pair_payloads

    def to_binary(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "vecbin": [
                    np.asarray(v, dtype=np.float64).tobytes() for v in df[vec_col]
                ],
            }
        )

    payload = embeddings_ds.map_batches(to_binary, batch_format="pandas")
    with_vecs = attach_pair_payloads(
        pairs_ds, payload, id_col=id_col, payload_col="vecbin",
        num_partitions=num_partitions,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": df["a"], "b": df["b"], "cosine": np.zeros(0)})
        ma = _matrix([np.frombuffer(b, dtype=np.float64) for b in df["vecbin_a"]])
        mb = _matrix([np.frombuffer(b, dtype=np.float64) for b in df["vecbin_b"]])
        cos = (ma * mb).sum(axis=1)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a": df["a"].to_numpy()[keep],
                "b": df["b"].to_numpy()[keep],
                "cosine": np.round(cos[keep], 6),
            }
        )

    return with_vecs.map_batches(verify, batch_format="pandas")


def cosine_pairs_lsh(embeddings_ds, threshold: float, *,
                     n_tables: int = 12, n_planes: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """The scale path for embedding near-dup: LSH-table candidates →
    distributed exact-cosine verify → (sorted) verified pair frame.
    Approximate by construction: recall is the banding probability
    1-(1-p^planes)^tables with p = 1 - θ/π — size tables/planes to the
    threshold (defaults target cos ≳ 0.9)."""
    cand = lsh_candidate_pairs(
        embeddings_ds, n_tables=n_tables, n_planes=n_planes,
        id_col=id_col, vec_col=vec_col,
    )
    out = verify_cosine_pairs(
        cand, embeddings_ds, threshold, id_col=id_col, vec_col=vec_col
    ).to_pandas()
    if out.empty:  # empty Ray results drop their schema
        return pd.DataFrame(columns=["a", "b", "cosine"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def lsh_recall(threshold: float, n_tables: int = 12, n_planes: int = 8) -> float:
    """Banding recall of the hyperplane LSH at a cosine threshold:
    per-plane collision p = 1 - θ/π, recall = 1-(1-p^planes)^tables."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    return float(1.0 - (1.0 - p ** n_planes) ** n_tables)


def cosine_pairs(embeddings_ds, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 max_exact: int = 20_000,
                 min_lsh_recall: float = 0.95) -> pd.DataFrame:
    """All-pairs cosine ≥ threshold (a < b).  Dispatches on input size:
    ≤ ``max_exact`` rows → exact driver matmul (the test oracle); larger →
    the distributed LSH bucket → verify pipeline (``cosine_pairs_lsh``) —
    but ONLY when the default banding covers the requested threshold
    (recall ≥ ``min_lsh_recall``).  A low threshold over a big table is
    REFUSED rather than silently returning a ~30%-recall result: the
    caller must size tables/planes explicitly via ``cosine_pairs_lsh``
    (or raise ``max_exact`` and accept the O(n²) driver matmul)."""
    if embeddings_ds.count() > max_exact:
        recall = lsh_recall(threshold)
        if recall < min_lsh_recall:
            raise ValueError(
                f"cosine_pairs over >{max_exact} rows would dispatch to the "
                f"LSH path, whose default banding (12 tables × 8 planes) has "
                f"recall ≈ {recall:.2f} at threshold {threshold} — below "
                f"{min_lsh_recall}. Call cosine_pairs_lsh with tables/planes "
                f"sized for your threshold, or raise max_exact explicitly."
            )
        return cosine_pairs_lsh(
            embeddings_ds, threshold, id_col=id_col, vec_col=vec_col
        )
    df = embeddings_ds.select_columns([id_col, vec_col]).to_pandas()
    ids = df[id_col].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    m = _matrix(df[vec_col].iloc[order])
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    return pd.DataFrame(
        {
            "a": ids[iu[0][mask]],
            "b": ids[iu[1][mask]],
            "cosine": np.round(sims[iu][mask], 6),
        }
    )


# ---------------------------------------------------------------------------
# Per-label centroids (integer-exact, order-invariant summation)
# ---------------------------------------------------------------------------

CENTROID_SCALE = np.float64(2.0**20)
_CENTROID_QMAX = 1 << 25  # |e| < 32 → int64 sums safe to ~2^38 rows


def centroid_quantize(flat: np.ndarray) -> np.ndarray:
    """floor(e · 2^20) as int64 — floor (not round) because banker's vs
    half-away rounding differ between numpy and SQL engines at exact .5,
    while floor is identical everywhere; float32·2^20 is an exact double
    product (24-bit mantissa + 20-bit shift), so both arms see the same
    operand bit-for-bit."""
    q = np.floor(flat.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    if len(q) and np.abs(q).max() >= _CENTROID_QMAX:
        raise ValueError(
            "label_centroids: |embedding value| ≥ 32 breaks the documented "
            "int64 no-overflow bound (2^25 · 2^38 rows < 2^63); rescale "
            "the vectors or lower CENTROID_SCALE."
        )
    return q


def label_centroids(
    embeddings_ds, label_col: str = "label", vec_col: str = "embedding"
):
    """Per-label mean vector in long format (label, dim, centroid, n).

    Float summation is order-dependent, so a distributed mean of floats
    can't be compared exactly against a sequential oracle.  Quantizing to
    int64 first makes every partial sum EXACT and order-invariant: per
    batch, one zero-copy Arrow flatten → (rows × dim) int64 matrix →
    per-label sums (labels × dim long rows, the combiner) → ONE bucketed
    (label, dim) sum exchange bounded by labels × dim at ANY corpus size
    → centroid = s / (2^20 · n) as one exactly-rounded IEEE division.
    The DuckDB oracle mirrors the same floor/scale arithmetic in SQL —
    a genuinely independent re-computation, not a golden file."""
    out = _label_centroid_sums(embeddings_ds, label_col, vec_col)
    out["centroid"] = out["s"].to_numpy(dtype=np.float64) / (
        CENTROID_SCALE * out["n"].to_numpy(dtype=np.float64)
    )
    return (
        out[["label", "dim", "centroid", "n"]]
        .sort_values(["label", "dim"], kind="mergesort")
        .reset_index(drop=True)
    )


def _label_centroid_sums(
    embeddings_ds, label_col: str = "label", vec_col: str = "embedding"
) -> pd.DataFrame:
    """EXACT per-(label, dim) int64 quantized sums + counts — the shared
    combiner pass behind ``label_centroids`` (which derives the float
    mean) and ``label_silhouette`` (which needs the exact ``s`` itself:
    reconstructing it from the float centroid via rint is only exact
    while |s| < ~2^52, far below the documented 2^63 envelope)."""
    import pyarrow as pa

    from ..functions.groupby import bucketed_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = t[label_col].to_numpy(zero_copy_only=False)
        col = t[vec_col].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(t)
        if n == 0:
            return pd.DataFrame(
                {"label": lab[:0], "dim": np.array([], dtype=np.int64),
                 "s": np.array([], dtype=np.int64),
                 "n": np.array([], dtype=np.int64)}
            )
        if len(flat) % n:
            raise ValueError("label_centroids: ragged embedding column")
        dim = len(flat) // n
        q = centroid_quantize(flat).reshape(n, dim)
        df = pd.DataFrame(q)
        df["_lab"] = lab
        g = df.groupby("_lab", sort=False)
        sums = g.sum()
        cnt = g.size().rename("n")
        long = sums.reset_index().melt(
            id_vars="_lab", var_name="dim", value_name="s"
        )
        long["dim"] = long["dim"].astype(np.int64) + 1  # 1-based like SQL
        long = long.merge(cnt.reset_index(), on="_lab")
        return long.rename(columns={"_lab": "label"})

    agg = bucketed_agg(
        embeddings_ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    )
    return agg.to_pandas()  # bounded: labels × dim rows


# ---------------------------------------------------------------------------
# Simplified silhouette (integer-exact clustering quality)
# ---------------------------------------------------------------------------

_SIL_SCALE = np.int64(1) << np.int64(30)


def label_silhouette(
    embeddings_ds, label_col: str = "label", vec_col: str = "embedding"
):
    """Per-label mean simplified silhouette over SQUARED distances to the
    label centroids — the clustering-quality companion to
    ``label_centroids``.

    Exactness strategy (everything a pure function of the input set):
    quantized sums (label_centroids' floor·2^20 int64 path) → centroid
    at the SAME 2^20 scale via integer floor division s//n (≤ 2^-20
    value error, deterministic) → per-point squared distances as EXACT
    int64 sums (diff ≤ 2^26, ×64 dims < 2^59) → silhouette
    s = (b−a)/max(a,b) as one IEEE division of exact ints → per-point
    floor(s·2^30) int64 so the per-label MEAN is an integer sum, immune
    to float summation order.  The DuckDB oracle recomputes the whole
    chain independently in SQL.

    Plan: one pass for (label, dim) sums (bounded combiner exchange),
    driver builds the labels×dim int64 centroid matrix (broadcast via
    closure), one scoring pass emitting per-label int partials, one
    bucketed sum — every exchange bounded by labels × dim."""
    import pyarrow as pa

    from ..functions.groupby import bucketed_agg

    cent = _label_centroid_sums(embeddings_ds, label_col, vec_col)
    # exact int64 sums straight from the combiner pass — no float
    # round-trip (rint recovery is only exact while |s| < ~2^52, short
    # of the 2^63 envelope the quantizer guard allows)
    labels = np.sort(cent["label"].unique())
    if len(labels) < 2:
        raise ValueError(
            "label_silhouette needs ≥ 2 labels (inter-cluster distance "
            "b is undefined otherwise)"
        )
    dim = int(cent["dim"].max())
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    s_mat = np.zeros((len(labels), dim), dtype=np.int64)
    n_vec = np.zeros(len(labels), dtype=np.int64)
    for lab, sub in cent.groupby("label"):
        i = lab_pos[int(lab)]
        n_vec[i] = int(sub["n"].iloc[0])
        s_mat[i] = sub.sort_values("dim")["s"].to_numpy(np.int64)
    c_q = s_mat // n_vec[:, None]  # floor division, exact int64

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = t[label_col].to_numpy(zero_copy_only=False)
        flat = t[vec_col].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        n = len(t)
        if n == 0:
            return pd.DataFrame(
                {"label": lab[:0],
                 "sil_q": np.array([], dtype=np.int64),
                 "n": np.array([], dtype=np.int64)}
            )
        q = centroid_quantize(flat).reshape(n, dim)
        own = np.searchsorted(labels, lab)  # labels sorted; every label present
        d2 = np.empty((n, len(labels)), dtype=np.int64)
        for j in range(len(labels)):
            diff = q - c_q[j]
            d2[:, j] = np.einsum("ij,ij->i", diff, diff)
        a = d2[np.arange(n), own]
        d2[np.arange(n), own] = np.iinfo(np.int64).max
        b = d2.min(axis=1)
        denom = np.maximum(a, b).astype(np.float64)
        denom[denom == 0] = 1.0  # a=b=0 → silhouette 0 by convention
        sil = (b - a).astype(np.float64) / denom
        sil_q = np.floor(sil * np.float64(_SIL_SCALE)).astype(np.int64)
        g = pd.DataFrame({"label": lab, "sil_q": sil_q})
        agg = g.groupby("label", sort=False)["sil_q"].agg(["sum", "size"])
        return pd.DataFrame(
            {
                "label": agg.index.to_numpy(),
                "sil_q": agg["sum"].to_numpy(np.int64),
                "n": agg["size"].to_numpy(np.int64),
            }
        )

    out = bucketed_agg(
        embeddings_ds.map_batches(partial, batch_format="pyarrow"),
        ["label"],
        {"sil_q": ("sil_q", "sum"), "n": ("n", "sum")},
    ).to_pandas()
    out["avg_silhouette"] = out["sil_q"].to_numpy(np.float64) / (
        np.float64(_SIL_SCALE) * out["n"].to_numpy(np.float64)
    )
    return (
        out[["label", "avg_silhouette", "n"]]
        .sort_values("label", kind="mergesort")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# k-means (integer-exact Lloyd iterations)
# ---------------------------------------------------------------------------


def _quantized_matrix(t, id_col: str, vec_col: str):
    """Arrow batch → (ids int64, rows × dim int64 quantized matrix)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    col = t[vec_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(ids)
    if n and len(flat) % n:
        raise ValueError("kmeans: ragged embedding column")
    dim = (len(flat) // n) if n else 0
    return ids, centroid_quantize(flat).reshape(n, dim)


def kmeans_assign(
    embeddings_ds,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd k-means over an embedding column, INTEGER-EXACT
    so the result is bit-comparable against an independent SQL oracle
    (same discipline as :func:`label_centroids`):

    * vectors quantize to int64 (floor · 2^20, exact for float32 input);
    * distances are int64 sums of squares: each squared coordinate delta
      can reach (2·2^25)² = 2^52, so dim must stay ≤ 2^11 for a provable
      < 2^63 sum (the runtime guard enforces dim ≤ 2^10 for headroom —
      do not relax it past 2^11); argmin tie-breaks on the smallest
      cluster id in both
      arms (numpy first-occurrence == SQL ORDER BY dist, j);
    * the Lloyd update ROUNDS the mean back to an int64 centroid via
      floor((2·S + n) / (2·n)) — computed in float64, exact while
      2|S| + n < 2^53 (loud guard) — so the next assignment round is
      again pure integer arithmetic;
    * an emptied cluster keeps its previous centroid.

    Scale shape: seeds are the k smallest ``id_col`` rows (per-block
    bounded k-smallest combiner → driver reduce over blocks × k rows);
    each iteration is one streaming pass emitting k × dim partial-sum
    rows per block — the driver only ever reduces (blocks × k × dim)
    int64 rows and holds the k × dim centroid matrix, broadcast into the
    next pass's task closure.  The input is re-read per iteration
    (column-pruned), never pinned.

    Returns the final-iteration assignment as a Dataset of
    ``(id_col, cluster int64)``.
    """
    import pyarrow as pa

    def seed_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select([id_col, vec_col]).to_pandas()
        return df.nsmallest(k, id_col)

    seeds = (
        embeddings_ds.map_batches(seed_partial, batch_format="pyarrow")
        .to_pandas()
        .nsmallest(k, id_col)
        .sort_values(id_col, kind="mergesort")
    )
    if seeds.empty:
        raise ValueError("kmeans: empty input")
    flat = np.concatenate([np.asarray(v, dtype=np.float64) for v in seeds[vec_col]])
    centroids = centroid_quantize(flat).reshape(len(seeds), -1)
    if len(centroids) < k:
        raise ValueError(f"kmeans: k={k} but only {len(centroids)} vectors")
    dim = centroids.shape[1]
    # distance envelope: |q| < 2^25 (centroid_quantize's guard) → a
    # per-dim squared diff < 2^52, so the int64 distance sum is safe only
    # while dim ≤ 2^10; k never enters the per-pair sum
    if dim > (1 << 10):
        raise ValueError(
            f"kmeans: dim={dim} can overflow the int64 distance sum "
            "(2^52 per dim); reduce dim or lower CENTROID_SCALE"
        )

    def assign_rows(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # (n × k) int64 distance matrix; argmin first-occurrence = min j
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1)

    for _ in range(iters - 1):
        cents = centroids  # freeze for closure capture

        def partial(t: pa.Table) -> pd.DataFrame:
            _, q = _quantized_matrix(t, id_col, vec_col)
            if not len(q):
                return pd.DataFrame(
                    {"j": np.array([], dtype=np.int64),
                     "dim": np.array([], dtype=np.int64),
                     "s": np.array([], dtype=np.int64),
                     "n": np.array([], dtype=np.int64)}
                )
            a = assign_rows(q, cents)
            rows = []
            for j in np.unique(a):
                sel = q[a == j]
                rows.append(pd.DataFrame({
                    "j": np.int64(j),
                    "dim": np.arange(1, q.shape[1] + 1, dtype=np.int64),
                    "s": sel.sum(axis=0, dtype=np.int64),
                    "n": np.int64(len(sel)),
                }))
            return pd.concat(rows, ignore_index=True)

        sums = (
            embeddings_ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["j", "dim"], sort=True)
            .agg(s=("s", "sum"), n=("n", "sum"))
            .reset_index()
        )
        s = sums["s"].to_numpy(np.float64)
        n = sums["n"].to_numpy(np.float64)
        if len(sums) and (2.0 * np.abs(sums["s"].to_numpy(np.int64)) + sums["n"].to_numpy(np.int64)).max() >= 2**53:
            raise ValueError("kmeans: |2S|+n ≥ 2^53 breaks exact float64 rounding")
        new_c = centroids.copy()
        upd = np.floor((2.0 * s + n) / (2.0 * n)).astype(np.int64)
        new_c[sums["j"].to_numpy(np.int64), sums["dim"].to_numpy(np.int64) - 1] = upd
        centroids = new_c

    final_c = centroids

    def final_assign(t: pa.Table) -> pd.DataFrame:
        ids, q = _quantized_matrix(t, id_col, vec_col)
        if not len(q):
            return pd.DataFrame({id_col: ids, "cluster": ids})
        return pd.DataFrame({id_col: ids, "cluster": assign_rows(q, final_c)})

    return embeddings_ds.map_batches(final_assign, batch_format="pyarrow")
