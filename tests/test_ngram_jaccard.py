"""Exact n-gram Jaccard dedup (prefix-filtered inverted index):
brute-force equivalence, the prefix-filtering lemma on the kernel,
hot-list refusal, and the empty-candidate sparse path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from knowledge_graph_construction_ray.stages.dedupe import (
    _prefix_shingle_rows,
    jaccard,
    ngram_jaccard_dedup,
    word_ngrams,
)


def _corpus() -> pd.DataFrame:
    """Near-dup clusters + short docs + empty/whitespace docs — every edge
    the shingle rules carve out."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    doc_id = 0
    for c in range(6):  # 6 clusters of 4 perturbed copies
        base = list(rng.choice(vocab, size=30))
        for k in range(4):
            toks = list(base)
            for _ in range(k):  # k token substitutions
                toks[int(rng.integers(len(toks)))] = str(rng.choice(vocab))
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
    for _ in range(20):  # unrelated docs
        rows.append((doc_id, " ".join(rng.choice(vocab, size=25))))
        doc_id += 1
    # short docs: a duplicated 2-token doc pair, a 1-token doc, empties
    rows += [
        (doc_id, "alpha beta"),
        (doc_id + 1, "alpha beta"),
        (doc_id + 2, "gamma"),
        (doc_id + 3, ""),
        (doc_id + 4, "   "),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute_pairs(df: pd.DataFrame, num: int = 1, den: int = 2) -> pd.DataFrame:
    g = {d: word_ngrams(t) for d, t in zip(df["doc_id"], df["text"])}
    ids = sorted(g)
    rows = []
    for i in range(len(ids) - 1):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ga, gb = g[a], g[b]
            if not ga and not gb:  # empty docs excluded by contract
                continue
            inter = len(ga & gb)
            union = len(ga) + len(gb) - inter
            if inter * den >= num * union:
                rows.append((a, b, inter, union))
    return pd.DataFrame(rows, columns=["a", "b", "inter_n", "union_n"])


@pytest.mark.parametrize("order", ["frequency", "hash"])
def test_ngram_jaccard_matches_bruteforce(ray_session, order):
    df = _corpus()
    ds = rd.from_pandas(df).repartition(7)
    out = (
        ngram_jaccard_dedup(ds, num_partitions=4, sparse_safe=True, order=order)
        .to_pandas()
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = _brute_pairs(df)
    assert len(exp) > 0, "fixture must contain near-dups"
    pd.testing.assert_frame_equal(out, exp.astype("int64"))
    # duplicated short docs must pair with inter == union (identical sets)
    short = out[(out["inter_n"] == out["union_n"])]
    assert not short.empty


def test_prefix_rows_obey_lemma_length():
    df = _corpus()
    rows = _prefix_shingle_rows(df, 1, 2)
    # per-doc emitted count == n - ceil(n/2) + 1 over the distinct set,
    # and emitted shingles are the SMALLEST hashes (global hash order)
    per_doc = rows.groupby("doc_id")
    for doc_id, g in per_doc:
        n = int(g["set_size"].iloc[0])
        assert len(g) == n - (n + 1) // 2 + 1  # n - ceil(n/2) + 1
    # docs with no shingles emit nothing
    emitted = set(rows["doc_id"])
    for d, t in zip(df["doc_id"], df["text"]):
        assert (d in emitted) == bool(word_ngrams(t))


def test_prefix_rows_set_size_matches_word_ngrams():
    df = _corpus()
    rows = _prefix_shingle_rows(df, 1, 2)
    sizes = rows.groupby("doc_id")["set_size"].first()
    for d, t in zip(df["doc_id"], df["text"]):
        g = word_ngrams(t)
        if g:
            assert int(sizes[d]) == len(g)


def test_hot_list_refusal(ray_session):
    # 50 identical docs → one inverted list of 50 > max_list=10 must raise
    df = pd.DataFrame(
        {"doc_id": range(50), "text": ["same boilerplate trigram here"] * 50}
    )
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="max_list"):
        ngram_jaccard_dedup(ds, max_list=10, sparse_safe=True).to_pandas()


def test_empty_candidate_sparse_path(ray_session):
    # all-distinct corpus → zero candidates; sparse_safe returns an empty
    # frame WITH schema instead of poisoning the join
    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [" ".join(f"u{i}_{j}" for j in range(10)) for i in range(8)],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = ngram_jaccard_dedup(ds, sparse_safe=True)
    # to_pandas() on a zero-row Dataset drops columns (Ray behavior);
    # the DATASET schema is the contract
    assert out.schema().names == ["a", "b", "inter_n", "union_n"]
    assert out.count() == 0


def test_threshold_rational_validation(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b c"]}))
    with pytest.raises(ValueError, match="rational"):
        ngram_jaccard_dedup(ds, threshold=(3, 2))


def test_jaccard_threshold_is_exact_boundary(ray_session):
    # two docs engineered to sit EXACTLY at Jaccard == 1/2: kept (>=)
    # each has 3 trigrams; they share exactly 2 → 2/(3+3-2) = 1/2
    x = "t1 t2 t3 t4 t5"   # {t1t2t3, t2t3t4, t3t4t5}
    y = "t1 t2 t3 t4 z1"   # {t1t2t3, t2t3t4, t3t4z1}
    gx, gy = word_ngrams(x), word_ngrams(y)
    inter = len(gx & gy)
    union = len(gx) + len(gy) - inter
    assert 2 * inter == union  # fixture really is the boundary
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": [x, y]}))
    out = ngram_jaccard_dedup(ds, sparse_safe=True).to_pandas()
    assert len(out) == 1 and jaccard(gx, gy) == 0.5
