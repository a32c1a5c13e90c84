"""Product quantization (PQ) for embedding columns — the memory-side
scale path for ANN, complementing the I/O-side IVF index (embed.py).

At 100 TB an fp32 embedding column dominates storage and object-store
traffic: 64-d float32 = 256 B/vector, while an m=8 PQ code is 8 B — a
32× compression that turns a cluster-wide similarity scan from
bandwidth-bound into compute-trivial (Jégou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Plan shape (all Dataset-native):
- ``train_pq_codebooks``: one distributed hash-sample (embed.py::
  sample_vectors — unbiased, deterministic, no RNG) pulled once to the
  driver, then per-subspace k-center init + Lloyd.  Codebook is tiny
  (m × k × dsub floats) and is BROADCAST into encode/search tasks.
- ``pq_encode``: per-batch vectorized argmin over subspace centroids —
  embarrassingly parallel map_batches, codes emitted as fixed-width
  ``binary`` (m bytes/row; Arrow joins/shuffles handle binary fine,
  list columns they do not — same trick as embed.py's verify join).
- ``pq_topk``: asymmetric distance computation — the query builds one
  (m × k) lookup table, each batch scores its codes with two fancy
  indexes and a row sum, keeps a local top-k, and only blocks × k
  candidate rows reach the driver (same reduce discipline as
  brute_force_topk).

Determinism contract (what the golden oracle checks): sample → codebook
→ code is a pure function of the table content — row-independent argmin
per vector — so the distributed encode must equal the sequential
single-process encode byte-for-byte at any partitioning.

No reference counterpart (the reference has no vector search at all);
this is the similarity-search family from the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .embed import _matrix, sample_vectors

_HEXD = np.frombuffer(b"0123456789abcdef", dtype="S1")


def _kmeans_subspace(sub: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic L2 k-means on one subspace: greedy farthest-point
    (k-center) init — spreads centroids across modes, no RNG — then
    Lloyd.  Empty cells keep their previous centroid (never NaN)."""
    k = min(k, len(sub))
    cents = np.empty((k, sub.shape[1]), dtype=np.float64)
    cents[0] = sub[0]
    d = ((sub - cents[0]) ** 2).sum(axis=1)
    for c in range(1, k):
        far = int(np.argmax(d))
        cents[c] = sub[far]
        d = np.minimum(d, ((sub - cents[c]) ** 2).sum(axis=1))
    for _ in range(iters):
        # ||x-c||² argmin == argmax(x·c - ||c||²/2); one matmul per pass
        assign = np.argmax(sub @ cents.T - 0.5 * (cents * cents).sum(1), axis=1)
        for c in range(k):
            members = sub[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_codebooks_from_matrix(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 5
) -> np.ndarray:
    """(m, k, d/m) codebooks from an in-memory sample matrix — the pure
    trainer shared by the distributed path and the sequential golden
    oracle (identical float ops in identical order ⇒ identical codes)."""
    sample = np.asarray(sample, dtype=np.float64)
    if sample.ndim != 2 or not len(sample):
        raise ValueError("PQ training needs a non-empty 2-D sample matrix")
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [_kmeans_subspace(sample[:, s * dsub:(s + 1) * dsub], k, iters)
         for s in range(m)]
    )


def train_pq_codebooks(
    embeddings_ds,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample_limit: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Codebooks from a distributed deterministic hash-sample (id-sorted,
    so training order — and therefore the codebook — is independent of
    block layout)."""
    sample = _matrix(
        sample_vectors(embeddings_ds, sample_limit, id_col=id_col,
                       vec_col=vec_col)[vec_col]
    )
    return pq_codebooks_from_matrix(sample, m, k, iters)


def pq_encode_kernel(X: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes — per-subspace argmin, fully vectorized."""
    m, _k, dsub = codebooks.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        sub = X[:, s * dsub:(s + 1) * dsub]
        cb = codebooks[s]
        codes[:, s] = np.argmax(sub @ cb.T - 0.5 * (cb * cb).sum(1), axis=1)
    return codes


def codes_to_hex(codes: np.ndarray) -> np.ndarray:
    """Vectorized hex rendering (no per-row Python) — the oracle-facing
    presentation of a binary code column."""
    n, m = codes.shape
    out = np.empty((n, 2 * m), dtype="S1")
    out[:, 0::2] = _HEXD[codes >> 4]
    out[:, 1::2] = _HEXD[codes & 0xF]
    return out.view(f"S{2 * m}").ravel().astype(str)


def pq_encode(
    embeddings_ds,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Dataset of (id, code: fixed_size_binary(m)) — one vectorized
    kernel per batch, the code column built straight from the (n, m)
    uint8 buffer (no per-row Python); the codebook rides the task
    closure (broadcast once, tiny)."""
    import pyarrow as pa

    m = codebooks.shape[0]

    def encode(df: pd.DataFrame) -> pa.Table:
        if not len(df):  # _matrix can't stack zero rows
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "code": pa.array([], type=pa.binary(m)),
                }
            )
        codes = np.ascontiguousarray(pq_encode_kernel(_matrix(df[vec_col]), codebooks))
        code_arr = pa.Array.from_buffers(
            pa.binary(m), len(df), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: pa.array(df[id_col].to_numpy()), "code": code_arr})

    return embeddings_ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pandas"
    )


def _codes_matrix(arr, m: int) -> np.ndarray:
    """(n, m) uint8 view of a fixed_size_binary(m) Arrow array — reads
    the data buffer directly, rebased on the array offset (a sliced
    array's buffer does not start at its own row 0)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    start = arr.offset * m
    return buf[start:start + len(arr) * m].reshape(-1, m)


def pq_topk(
    codes_ds,
    codebooks: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Asymmetric-distance top-k by approximate inner product: one
    (m × k_codes) lookup table per query, per-batch local top-k, tiny
    driver reduce (blocks × k rows)."""
    m, _kc, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    table = np.stack(
        [codebooks[s] @ q[s * dsub:(s + 1) * dsub] for s in range(m)]
    )  # (m, k_codes)

    def score(batch) -> pd.DataFrame:
        codes = _codes_matrix(batch["code"], m)
        if not len(codes):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "score_adc": pd.Series(dtype="float64")})
        s = table[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)
        top = np.argsort(-s, kind="stable")[:k]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[top], "score_adc": s[top]}
        )

    local = codes_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        local.sort_values(["score_adc", id_col], ascending=[False, True],
                          kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def build_ivfpq_index(
    embeddings_ds,
    index_dir: str,
    *,
    n_centroids: int | None = None,
    m: int = 8,
    k_codes: int = 256,
    iters: int = 5,
    sample_limit: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """IVF × PQ composition — the FAISS-style shape for corpora where
    neither full-scan bandwidth nor per-bucket fp32 storage is
    affordable: coarse centroids route a query to nprobe bucket
    DIRECTORIES (I/O pruning, embed.py::build_ivf_index), and each
    bucket stores only (id, m-byte PQ code) rows — so the probed bytes
    shrink by BOTH factors (nprobe/ncentroids × ~30× code compression).
    One combined assign+encode pass over the data; centroids and
    codebooks persist beside the partitions.

    Codes quantize RAW vectors (not residuals-from-centroid); with an
    exact-rerank tail the residual refinement only sharpens the
    shortlist, and raw codes keep the encode kernel identical to (and
    golden-checked by) the flat-PQ path."""
    import os
    import shutil

    import pyarrow as pa

    from .embed import train_centroids

    cents = train_centroids(
        embeddings_ds, n_centroids=n_centroids, iters=iters,
        sample_limit=sample_limit, vec_col=vec_col, id_col=id_col,
    )
    codebooks = train_pq_codebooks(
        embeddings_ds, m=m, k=k_codes, iters=iters,
        sample_limit=sample_limit, vec_col=vec_col, id_col=id_col,
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    def assign_encode(df: pd.DataFrame) -> pa.Table:
        if not len(df):  # _matrix can't stack zero rows
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "ivf_bucket": pa.array([], type=pa.int64()),
                    "code": pa.array([], type=pa.binary(m)),
                }
            )
        X = _matrix(df[vec_col])
        bucket = np.argmax(X @ cents.T, axis=1).astype(np.int64)
        codes = np.ascontiguousarray(pq_encode_kernel(X, codebooks))
        code_arr = pa.Array.from_buffers(
            pa.binary(m), len(df), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy()),
                "ivf_bucket": pa.array(bucket),
                "code": code_arr,
            }
        )

    embeddings_ds.select_columns([id_col, vec_col]).map_batches(
        assign_encode, batch_format="pandas"
    ).write_parquet(index_dir, partition_cols=["ivf_bucket"])
    np.save(os.path.join(index_dir, "_centroids.npy"), cents)
    np.save(os.path.join(index_dir, "_codebooks.npy"), codebooks)
    return cents, codebooks


def ivfpq_search_index(
    index_dir: str,
    embeddings_ds,
    query_vec: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Probe an IVF-PQ index: rank centroids, read ONLY the nprobe
    nearest bucket directories (code rows — ~30× smaller than fp32),
    ADC-shortlist ``rerank`` candidates, then exact inner product on
    just those ids from the fp32 table (broadcast isin, no shuffle)."""
    import glob
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "_centroids.npy"))
    codebooks = np.load(os.path.join(index_dir, "_codebooks.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(cents @ q))
    files: list[str] = []
    for b in order[:nprobe]:
        d = os.path.join(index_dir, f"ivf_bucket={int(b)}")
        if os.path.isdir(d):  # empty buckets have no directory
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    probed = rd.read_parquet(files, columns=[id_col, "code"])
    return pq_topk_rerank(
        embeddings_ds, probed, codebooks, q, k=k, rerank=rerank,
        vec_col=vec_col, id_col=id_col,
    )


def pq_topk_rerank(
    embeddings_ds,
    codes_ds,
    codebooks: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Two-stage search: PQ/ADC shortlist of ``rerank`` candidates over
    the compressed codes (cheap, bandwidth-light), then EXACT inner
    product on just those vectors — fetched with a broadcast ``isin``
    filter over the fp32 table, never a shuffle.  At scale the exact
    stage touches rerank rows regardless of corpus size."""
    q = np.asarray(query_vec, dtype=np.float64)
    shortlist = pq_topk(codes_ds, codebooks, q, k=rerank, id_col=id_col)
    ids = shortlist[id_col].to_numpy()

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col].isin(ids)]

    cand = (
        embeddings_ds.select_columns([id_col, vec_col])
        .map_batches(pick, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    s = _matrix(cand[vec_col]).astype(np.float64) @ q
    out = pd.DataFrame({id_col: cand[id_col].to_numpy(), "score": s})
    return (
        out.sort_values(["score", id_col], ascending=[False, True],
                        kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
