"""Deduplication operators for training-data pipelines over the
``documents`` table: exact, MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup.

Shuffle discipline (scale notes):

* **exact_dedup** — hash-partition on a content key and keep the
  min-doc_id representative per group: one groupby over (key, doc_id)
  partial-reduced per batch first (combiner) so the shuffle carries one row
  per distinct key per block, not one per row.
* **minhash_lsh** — shingle → minhash signature per batch (vectorized
  numpy), explode to (band_id, band_hash, doc_id) rows, groupby bands →
  candidate pairs, verify true n-gram Jaccard per pair, then cluster with
  min-label propagation (connected components) — union-find on the driver
  only over the verified pair set, which is sparse by construction.
* **simhash** — 64-bit simhash per batch; exact-bucket grouping on rotated
  prefixes (block permutation trick) → candidates within Hamming ≤ k.
* **embedding近dup** — brute-force cosine against a broadcast matrix when
  the side fits (``ray.put`` once), LSH hyperplane buckets as the scale
  path (`embed.py`).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")

# -- deterministic 64-bit hash helpers (process-independent) ---------------

_M64 = (1 << 64) - 1


def _h64(token: str, seed: int = 0) -> int:
    h = zlib.crc32(token.encode("utf-8"), seed & 0xFFFFFFFF)
    h2 = zlib.crc32(token[::-1].encode("utf-8"), (seed >> 32) ^ 0x9E3779B9)
    return ((h << 32) | h2) & _M64


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = _WS.split(text.strip().lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks and toks[0] else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Combiner: min doc_id per normalized-text key within the batch."""
    norm = df["text"].str.lower()
    out = pd.DataFrame({"key": norm, "doc_id": df["doc_id"]})
    return out.groupby("key", as_index=False)["doc_id"].min()


def exact_dedup(docs_ds):
    """Keep-first (min doc_id) per lower(text) group → Dataset[doc_id].
    Combiner inside the batch, vectorized bucketed reduce (one group per
    distinct text → high cardinality, so per-group dispatch is avoided)."""
    from ..functions.groupby import bucketed_agg

    partial = docs_ds.map_batches(exact_dedup_kernel, batch_format="pandas")
    kept = bucketed_agg(partial, ["key"], {"doc_id": ("doc_id", "min")})
    return kept.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

NUM_PERM = 64
NUM_BANDS = 16  # 16 bands × 4 rows ≈ catches Jaccard ≳ 0.5
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
_A = np.array([_h64(f"a{i}") | 1 for i in range(NUM_PERM)], dtype=np.uint64)
_B = np.array([_h64(f"b{i}") for i in range(NUM_PERM)], dtype=np.uint64)


def minhash_signature(text: str, ngram: int = 3) -> np.ndarray:
    grams = word_ngrams(text, ngram)
    if not grams:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    hv = np.array([_h64(g) for g in grams], dtype=np.uint64)
    # (a*x + b) mod 2^64, min over shingles — vectorized over perms × grams
    with np.errstate(over="ignore"):
        m = (hv[None, :] * _A[:, None] + _B[:, None]).min(axis=1)
    return m


def minhash_bands_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Docs batch → (band_id, band_hash, doc_id) rows (NUM_BANDS per doc)."""
    rows_band, rows_hash, rows_doc = [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        sig = minhash_signature(text)
        for b in range(NUM_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            rows_band.append(b)
            rows_hash.append(int(zlib.crc32(chunk.tobytes())))
            rows_doc.append(doc_id)
    return pd.DataFrame(
        {"band_id": rows_band, "band_hash": rows_hash, "doc_id": rows_doc}
    )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """A coarse hash bucket of band rows → candidate pairs (a < b).
    Only multi-member (band_id, band_hash) groups are visited in Python;
    singleton bands (the overwhelming majority) are dropped vectorized."""
    dup = df.duplicated(subset=["band_id", "band_hash"], keep=False)
    df = df[dup]
    out_a, out_b = [], []
    for _, g in df.groupby(["band_id", "band_hash"], sort=False):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pd.DataFrame({"a": out_a, "b": out_b})


def minhash_candidate_pairs(docs_ds, num_buckets: int = 64):
    """docs → deduped candidate pair Dataset[a, b] via the band shuffle.
    The shuffle key is a coarse hash bucket over (band_id, band_hash) —
    one vectorized reduce per bucket, not one Python dispatch per band."""
    from ..functions.groupby import bucketed_agg

    bands = docs_ds.map_batches(minhash_bands_kernel, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.groupby import hash_bucket

        df = df.copy()
        df["_bucket"] = hash_bucket(df, ["band_hash", "band_id"], num_buckets)
        return df

    pairs = (
        bands.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: _bucket_pairs(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    # distinct pairs (a pair can fire in several bands / buckets)
    return bucketed_agg(pairs, ["a", "b"], {"n_bands": ("a", "size")})


def verify_pairs_jaccard(pairs_df: pd.DataFrame, texts: dict, threshold: float) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (broadcast text
    lookup — candidates are sparse)."""
    keep_a, keep_b, keep_j = [], [], []
    cache: dict = {}

    def grams(d):
        if d not in cache:
            cache[d] = word_ngrams(texts[d])
        return cache[d]

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        j = jaccard(grams(a), grams(b))
        if j >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            keep_j.append(round(j, 6))
    return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": keep_j})


def cluster_pairs(pairs: "list[tuple]") -> dict:
    """Connected components over verified pairs → {doc_id: cluster_rep
    (min doc_id)}.  Driver-side union-find; the verified pair set is sparse
    (SURVEY §7.5 smallness assumption, same as canonicalization)."""
    from ..state.unionfind import UnionFind

    uf = UnionFind().add_pairs(pairs)
    return {
        m: min(cluster) for _, cluster in uf.clusters().items() for m in cluster
    }


def minhash_dedup(docs_ds, *, threshold: float = 0.5):
    """Full near-dup pipeline → pandas DataFrame (doc_id, cluster_rep) for
    every doc that belongs to a near-dup cluster.

    Only CANDIDATE docs' texts ever reach the driver for the exact-Jaccard
    verification (broadcast id-set semi-join) — the candidate set is sparse
    by LSH construction, while the corpus is not."""
    cand = minhash_candidate_pairs(docs_ds).to_pandas()
    if cand.empty:  # empty Ray results drop their schema
        return pd.DataFrame(columns=["doc_id", "cluster_rep"])
    cand_ids = sorted(set(cand["a"]) | set(cand["b"]))
    texts: dict = {}
    if cand_ids:
        import pyarrow as pa
        import pyarrow.compute as pc

        id_set = pa.array(cand_ids)
        hits = docs_ds.select_columns(["doc_id", "text"]).map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"], value_set=id_set)),
            batch_format="pyarrow",
        )
        for b in hits.iter_batches(batch_size=65536, batch_format="pandas"):
            texts.update(zip(b["doc_id"], b["text"]))
    verified = verify_pairs_jaccard(cand, texts, threshold)
    mapping = cluster_pairs(list(zip(verified["a"], verified["b"])))
    return pd.DataFrame(
        sorted(mapping.items()), columns=["doc_id", "cluster_rep"]
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = _WS.split(text.strip().lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _h64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_kernel(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["simhash"] = [simhash64(t) for t in df["text"]]
    # 4 16-bit blocks: two docs within Hamming distance 3 share ≥1 block
    sh = out["simhash"].to_numpy(dtype=np.uint64)
    for blk in range(4):
        out[f"block{blk}"] = ((sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def _simhash_band_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Explode each signature into 4 (blk, block_val, doc_id, simhash)
    rows for the distributed block-collision shuffle."""
    frames = []
    for blk in range(4):
        frames.append(
            pd.DataFrame(
                {
                    "blk": blk,
                    "block_val": df[f"block{blk}"],
                    "doc_id": df["doc_id"],
                    "simhash": df["simhash"],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def simhash_candidates(docs_ds, max_hamming: int = 3, num_buckets: int = 64):
    """SimHash near-dup candidates via the block-permutation trick: docs
    within Hamming ≤ 3 must share at least one of the 4 16-bit blocks
    (pigeonhole).  The block collision check is a distributed shuffle on a
    coarse hash bucket of (blk, block_val) — only multi-member collision
    groups are visited in Python; only the (sparse) verified pairs reach
    the driver."""

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        dup = df.duplicated(subset=["blk", "block_val"], keep=False)
        df = df[dup]
        out_a, out_b = [], []
        for _, g in df.groupby(["blk", "block_val"], sort=False):
            ids = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(ids) - 1):
                for j in range(i + 1, len(ids)):
                    d = int(ids[i][1]) ^ int(ids[j][1])
                    if bin(d).count("1") <= max_hamming:
                        out_a.append(ids[i][0])
                        out_b.append(ids[j][0])
        return pd.DataFrame({"a": out_a, "b": out_b})

    sh = docs_ds.map_batches(simhash_kernel, batch_format="pandas")
    bands = sh.map_batches(_simhash_band_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.groupby import hash_bucket

        df = df.copy()
        df["_bucket"] = hash_bucket(df, ["block_val", "blk"], num_buckets)
        return df

    pairs = (
        bands.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_pairs(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if pairs.empty:  # empty Ray results drop their schema
        return []
    return sorted(set(zip(pairs["a"], pairs["b"])))


# ---------------------------------------------------------------------------
# n-gram Jaccard (all-pairs within blocking key — exact, for small groups)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs_ds, *, threshold: float, block_on=None):
    """Exact n-gram Jaccard near-dup pairs.  Without LSH this is quadratic,
    so callers must block (e.g. on ``source`` or a length bucket); the
    default blocks on nothing and is meant for ≤ a few thousand docs."""
    df = docs_ds.select_columns(
        ["doc_id", "text"] + ([block_on] if block_on else [])
    ).to_pandas()
    groups = df.groupby(block_on) if block_on else [(None, df)]
    rows = []
    for _, g in groups:
        ids = list(g["doc_id"])
        grams = [word_ngrams(t) for t in g["text"]]
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                jac = jaccard(grams[i], grams[j])
                if jac >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    rows.append((a, b, round(jac, 6)))
    return pd.DataFrame(sorted(set(rows)), columns=["a", "b", "jaccard"])
