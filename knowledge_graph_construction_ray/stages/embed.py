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
    # global reduce: tiny (num_blocks × nq × k rows)
    return (
        local.sort(["query_idx", "cosine", id_col], descending=[False, True, False])
        .groupby("query_idx")
        .map_groups(lambda g: g.head(k), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def train_centroids(embeddings_ds, n_centroids: int = 16, iters: int = 5,
                    sample_limit: int = 4096, vec_col: str = "embedding") -> np.ndarray:
    """Deterministic mini k-means on a bounded head sample (seeded — no
    wall-clock, no RNG: initial centroids are the first n distinct rows)."""
    sample = _matrix(
        embeddings_ds.limit(sample_limit).to_pandas()[vec_col]
    )
    cents = sample[:n_centroids].copy()
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
    """Approximate top-k probing only the ``nprobe`` nearest buckets."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))
    probe = set(int(b) for b in order[:nprobe])
    probed = assigned_ds.filter(
        expr=f"ivf_bucket in {sorted(probe)}"
    )
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


def cosine_pairs(embeddings_ds, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Exact all-pairs cosine ≥ threshold (a < b).  The matrix is broadcast
    whole — the small-side baseline; use LSH buckets + per-bucket verify
    when the table outgrows one worker's memory."""
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
