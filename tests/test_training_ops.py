"""Kernel-level tests for the round-3 training-data curation operators:
PII scrub, repetition metrics, vectorized word n-grams, duplicated-n-gram
mining and benchmark-contamination check.  (End-to-end oracle parity for
all four queries() entries is covered by test_driver_parity.py.)"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from knowledge_graph_construction_ray.stages.pii import scrub_strings, sql_scrub_expr
from knowledge_graph_construction_ray.stages.textstats import (
    repetition_kernel,
    word_ngrams_batch,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

PII_SAMPLES = [
    "mail a.b+tag@sub.example.co.uk now",
    "call +1 (415) 555-0199 or 020-7946-0958 today",
    "Customer#000000042",
    "room 7, floor 3",
    "nothing to scrub here",
    "",
]


def test_pii_scrub_masks_email_phone_digits():
    out = scrub_strings(pa.array(PII_SAMPLES)).to_pylist()
    assert out[0] == "mail [EMAIL] now"
    assert out[1] == "call [PHONE] or [PHONE] today"
    assert out[2] == "Customer#[PHONE]"  # long digit runs read as phone-shaped
    assert out[3] == "room *, floor *"
    assert out[4] == "nothing to scrub here"
    assert out[5] == ""


def test_pii_scrub_matches_duckdb_regexp_replace():
    """Arrow RE2 and DuckDB RE2 must agree byte-for-byte — the oracle
    contract for pii_scrub_customers."""
    con = duckdb.connect()
    sql = f"SELECT {sql_scrub_expr('s')} FROM (SELECT unnest(?) AS s)"
    dk = [r[0] for r in con.execute(sql, [PII_SAMPLES]).fetchall()]
    assert scrub_strings(pa.array(PII_SAMPLES)).to_pylist() == dk


def test_pii_oracle_sql_matches_generator():
    """PII_SCRUB_SQL inlines sql_scrub_expr('c_name') for staticness; keep
    the inline text in sync with the pattern registry."""
    from knowledge_graph_construction_ray.query.relational import PII_SCRUB_SQL

    flat = " ".join(PII_SCRUB_SQL.split())
    assert " ".join(sql_scrub_expr("c_name").split()) in flat


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def _naive_repetition(doc_id, text):
    toks = text.strip().split()
    if not toks:
        return None
    from collections import Counter

    c = Counter(toks)
    return (doc_id, len(toks), len(c), max(c.values()))


def test_repetition_kernel_matches_naive():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a a a b c",
                "  x  y\tz  ",
                "",
                "   ",
                "solo",
            ],
        }
    )
    out = repetition_kernel(df)
    expect = [r for r in (_naive_repetition(i, t) for i, t in zip(df.doc_id, df.text)) if r]
    got = list(out.itertuples(index=False, name=None))
    assert got == expect
    assert all(out[c].dtype == np.int64 for c in ["n_tokens", "n_distinct", "top_count"])


def test_repetition_kernel_empty_batch_keeps_schema():
    out = repetition_kernel(pd.DataFrame({"doc_id": [7], "text": ["   "]}))
    assert list(out.columns) == ["doc_id", "n_tokens", "n_distinct", "top_count"]
    assert len(out) == 0


# ---------------------------------------------------------------------------
# vectorized word n-grams
# ---------------------------------------------------------------------------


def _naive_ngrams(texts, ids, n=3):
    out = []
    for i, t in zip(ids, texts):
        w = t.strip().split()
        if not t.strip():
            continue
        for j in range(len(w) - n + 1):
            out.append((" ".join(w[j : j + n]), i))
    return out


@pytest.mark.parametrize("n", [2, 3])
def test_word_ngrams_batch_matches_naive(n):
    texts = pd.Series(
        ["a b c d", "x y", "", "  ", "p q r", "one", "m n o p q"]
    )
    ids = np.array([10, 20, 30, 40, 50, 60, 70])
    grams, gdoc = word_ngrams_batch(texts, ids, n)
    got = list(zip(grams.to_pylist(), gdoc.tolist()))
    assert got == _naive_ngrams(texts, ids, n)


def test_word_ngrams_batch_no_cross_doc_grams():
    texts = pd.Series(["a b", "c d"])
    grams, gdoc = word_ngrams_batch(texts, np.array([1, 2]), 2)
    assert grams.to_pylist() == ["a b", "c d"]  # never "b c"
    assert gdoc.tolist() == [1, 2]


def test_word_ngrams_batch_all_empty():
    grams, gdoc = word_ngrams_batch(pd.Series(["", "  "]), np.array([1, 2]), 3)
    assert len(grams) == 0 and len(gdoc) == 0


# ---------------------------------------------------------------------------
# corpus queries (Ray; empty-result schema, eval-doc exclusion)
# ---------------------------------------------------------------------------


def test_dup_ngrams_hashed_equals_exact(ray_session):
    """The numeric-exchange scale path must reproduce the string-exchange
    exact path verbatim (collision-free at these sizes)."""
    import ray.data as rd

    from knowledge_graph_construction_ray.query.relational import (
        dup_ngrams_hashed,
        dup_ngrams_over,
    )

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    pd.testing.assert_frame_equal(
        dup_ngrams_over(ds, min_docs=5, k=20),
        dup_ngrams_hashed(ds, min_docs=5, k=20),
    )


def test_dup_ngrams_hashed_empty_threshold_keeps_schema(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.query.relational import dup_ngrams_hashed

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    out = dup_ngrams_hashed(ds, min_docs=10**9)
    assert list(out.columns) == ["gram", "n_docs"]
    assert len(out) == 0


def test_dup_ngrams_empty_threshold_keeps_schema(ray_session):
    from knowledge_graph_construction_ray.query.relational import corpus_dup_ngrams

    out = corpus_dup_ngrams(SF_DIR, min_docs=10**9)
    assert list(out.columns) == ["gram", "n_docs"]
    assert len(out) == 0
    assert out["n_docs"].dtype == np.int64


# ---------------------------------------------------------------------------
# HyperLogLog sketch
# ---------------------------------------------------------------------------


def test_hll_accuracy_across_cardinalities():
    from knowledge_graph_construction_ray.stages.sketch import hll_sequential

    rng = np.random.default_rng(7)
    for n in (100, 10_000, 200_000):
        vals = rng.integers(0, 2**62, size=n)
        distinct = len(np.unique(vals))
        est = hll_sequential(vals)
        assert abs(est - distinct) / distinct < 0.05, (n, est, distinct)


def test_hll_register_merge_is_associative():
    from knowledge_graph_construction_ray.stages.sketch import (
        hll_partial_registers,
        merge_registers,
    )

    vals = np.arange(50_000, dtype=np.int64)
    whole = hll_partial_registers(vals)
    halves = merge_registers(
        hll_partial_registers(vals[:20_000]), hll_partial_registers(vals[20_000:])
    )
    assert np.array_equal(whole, halves)


def test_hll_string_values():
    from knowledge_graph_construction_ray.stages.sketch import hll_sequential

    vals = np.array([f"user-{i}" for i in range(30_000)], dtype=object)
    est = hll_sequential(vals)
    assert abs(est - 30_000) / 30_000 < 0.05


def test_hll_distributed_equals_sequential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        hll_cardinality,
        hll_sequential,
    )

    df = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id"], override_num_blocks=8
    )
    assert hll_cardinality(ds, "user_id") == hll_sequential(df["user_id"].to_numpy())


def test_hll_grouped_equals_sequential_per_group(ray_session):
    """The grouped sketch must equal running the sequential sketch on
    each group's slice — register max is a pure function of the group's
    multiset regardless of batch partitioning — and stay within the HLL
    error bound of the true per-group distinct counts."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        hll_grouped_cardinality,
        hll_sequential,
    )

    rng = np.random.default_rng(23)
    n = 120_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]),
            "v": rng.integers(0, 40_000, size=n),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = hll_grouped_cardinality(ds, "g", "v").set_index("g")["n_est"]
    for g, sub in df.groupby("g"):
        seq = hll_sequential(sub["v"].to_numpy())
        assert got[g] == seq, (g, got[g], seq)
        true = sub["v"].nunique()
        assert abs(got[g] - true) / true < 0.05, (g, got[g], true)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _pq_synth(n=2000, d=64, n_clusters=20, seed=5):
    """Well-separated seeded Gaussian clusters (unit-normalized)."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d)) * 4.0
    lab = rng.integers(0, n_clusters, size=n)
    X = cents[lab] + rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = X.astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
    )
    # the sequential reference must see exactly what the engine sees:
    # the float32-stored vectors re-normalized in float64 (embed._matrix)
    from knowledge_graph_construction_ray.stages.embed import _matrix

    return df, _matrix(df["embedding"])


def test_pq_encode_partition_invariant(ray_session):
    """Distributed encode must equal the sequential kernel byte-for-byte
    at any block layout (codes are row-independent argmins under one
    deterministic codebook)."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.pq import (
        pq_codebooks_from_matrix,
        pq_encode,
        pq_encode_kernel,
        train_pq_codebooks,
    )

    df, X = _pq_synth(n=600)
    for blocks in (1, 7):
        ds = rd.from_pandas(df).repartition(blocks)
        cb = train_pq_codebooks(ds, m=8, k=16)
        seq_cb = pq_codebooks_from_matrix(X, m=8, k=16)
        assert np.array_equal(cb, seq_cb)
        enc = pq_encode(ds, cb).to_pandas().sort_values("vec_id")
        got = np.frombuffer(b"".join(enc["code"]), dtype=np.uint8).reshape(-1, 8)
        assert np.array_equal(got, pq_encode_kernel(X, cb))


def test_pq_rerank_recall(ray_session):
    """ADC shortlist + exact rerank must recover ≥0.9 of the true top-10
    on clustered data, and the rerank scores must be the EXACT inner
    products (the lossy step only selects, never scores)."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.pq import (
        pq_encode,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    df, X = _pq_synth()
    ds = rd.from_pandas(df).repartition(8)
    cb = train_pq_codebooks(ds, m=8, k=32)
    codes = pq_encode(ds, cb)
    recalls = []
    for qi in (0, 500, 1500):
        q = X[qi]
        got = pq_topk_rerank(ds, codes, cb, q, k=10, rerank=100)
        exact_scores = X @ q
        exact10 = set(np.argsort(-exact_scores, kind="stable")[:10].tolist())
        recalls.append(len(set(got["vec_id"]) & exact10) / 10)
        # scores are exact inner products for the ids returned
        np.testing.assert_allclose(
            got["score"].to_numpy(),
            exact_scores[got["vec_id"].to_numpy()],
            rtol=1e-6,
        )
    assert np.mean(recalls) >= 0.9, recalls


def test_ivfpq_index_prunes_and_recalls(ray_session, tmp_path):
    """IVF×PQ composition: probing nprobe of the bucket directories must
    (a) touch a strict subset of the code files, (b) still recover ≥0.9
    of the true top-10 after exact rerank, with exact scores."""
    import glob
    import os

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.pq import (
        build_ivfpq_index,
        ivfpq_search_index,
    )

    df, X = _pq_synth(n=3000, n_clusters=30, seed=9)
    ds = rd.from_pandas(df).repartition(6)
    index_dir = str(tmp_path / "ivfpq")
    cents, cb = build_ivfpq_index(
        ds, index_dir, n_centroids=16, m=8, k_codes=32
    )
    assert cents.shape[0] == 16 and cb.shape == (8, 32, 8)
    n_dirs = len(glob.glob(os.path.join(index_dir, "ivf_bucket=*")))
    assert n_dirs > 4  # pruning is meaningful only with several buckets

    recalls = []
    for qi in (0, 1200, 2900):
        q = X[qi]
        got = ivfpq_search_index(
            index_dir, ds, q, k=10, nprobe=4, rerank=400
        )
        exact_scores = X @ q
        exact10 = set(np.argsort(-exact_scores, kind="stable")[:10].tolist())
        recalls.append(len(set(got["vec_id"]) & exact10) / 10)
        np.testing.assert_allclose(
            got["score"].to_numpy(),
            exact_scores[got["vec_id"].to_numpy()],
            rtol=1e-6,
        )
    assert np.mean(recalls) >= 0.9, recalls


def test_percentiles_constant_column(ray_session, tmp_path):
    """Degenerate histogram (lo == hi): every value lands in the clipped
    last bin; selection must still return the constant exactly."""
    import pyarrow.parquet as pq

    from knowledge_graph_construction_ray.query.relational import (
        events_value_percentiles,
    )

    pq.write_table(
        pa.table({"value": pa.array([7.25] * 1000, type=pa.float64())}),
        str(tmp_path / "events.parquet"),
    )
    out = events_value_percentiles(str(tmp_path))
    assert out.iloc[0].tolist() == [7.25, 7.25, 7.25]


def test_percentiles_match_numpy_rank(ray_session):
    import math

    from knowledge_graph_construction_ray.query.relational import (
        events_value_percentiles,
    )

    vals = np.sort(
        pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    out = events_value_percentiles(SF_DIR)
    for p in (0.5, 0.95, 0.99):
        assert out[f"value_p{int(p*100)}"].iloc[0] == vals[max(1, math.ceil(p * len(vals))) - 1]


def test_anti_join_complement(ray_session):
    """left_anti output ∪ its complement = all customers; ∩ = ∅."""
    from knowledge_graph_construction_ray.query.relational import (
        customers_without_orders,
    )

    without = set(customers_without_orders(SF_DIR)["c_custkey"])
    cust = set(
        pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])["c_custkey"]
    )
    big = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    have = set(big.loc[big["o_totalprice"] > 400_000.0, "o_custkey"])
    assert without == cust - have


def test_full_outer_join_keeps_both_unmatched_sides(ray_session):
    """j7 must exercise REAL outer semantics: users present on only one
    side survive with a zero count on the other — if the fixture ever
    degrades to every-user-matches, this fails rather than silently
    testing an inner join."""
    from knowledge_graph_construction_ray.query.relational import (
        j7_full_outer_activity,
    )

    out = j7_full_outer_activity("/root/testdata/sf0.01")
    click_only = out[(out["n_clicks"] > 0) & (out["n_purchases"] == 0)]
    purchase_only = out[(out["n_clicks"] == 0) & (out["n_purchases"] > 0)]
    assert len(click_only) > 0 and len(purchase_only) > 0
    # and the union of keys matches the filtered input exactly
    ev = pd.read_parquet(
        "/root/testdata/sf0.01/events.parquet",
        columns=["user_id", "event_type", "value"],
    )
    hot = ev[ev["value"] > 90.0]
    expect = set(hot.loc[hot["event_type"] == "click", "user_id"]) | set(
        hot.loc[hot["event_type"] == "purchase", "user_id"]
    )
    assert set(out["user_id"]) == expect


def test_tfidf_search_ranked_and_deterministic(ray_session):
    from knowledge_graph_construction_ray.query.relational import tfidf_search

    out = tfidf_search(SF_DIR)
    assert list(out.columns) == ["doc_id", "score"]
    assert len(out) == 10
    assert (out["score"] > 0).all()
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()  # descending
    pd.testing.assert_frame_equal(out, tfidf_search(SF_DIR))


def test_contamination_excludes_eval_docs(ray_session):
    from knowledge_graph_construction_ray.query.relational import contamination_check

    out = contamination_check(SF_DIR)
    assert (out["doc_id"] >= 10).all()
    assert (out["n_contaminated"] >= 1).all()
    # determinism across runs (broadcast set + vectorized isin)
    again = contamination_check(SF_DIR)
    pd.testing.assert_frame_equal(out, again)


# ---------------------------------------------------------------------------
# Mixing family: rebalance / pack / interleave invariants
# ---------------------------------------------------------------------------


def test_rebalance_caps_at_median_and_passes_small_langs(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        curation_rebalance_langs,
    )

    full = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    )
    counts = full["lang"].value_counts()
    cap = int(np.sort(counts.to_numpy())[(len(counts) - 1) // 2])
    out = curation_rebalance_langs(SF_DIR)
    kept = out["lang"].value_counts()
    for lang, n in counts.items():
        assert kept.get(lang, 0) == min(n, cap)  # capped, small langs whole
    # kept docs are a subset of the corpus and deterministic
    assert set(out["doc_id"]).issubset(set(full["doc_id"]))
    pd.testing.assert_frame_equal(out, curation_rebalance_langs(SF_DIR))


def test_pack_bins_budget_and_monotonic(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        PACK_BUDGET_TOKENS,
        docs_pack_bins,
    )

    out = docs_pack_bins(SF_DIR)
    full = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert len(out) == len(full)  # every doc gets a bin
    # within a source, bin ids are non-decreasing in doc order and start at 0
    for _, g in out.sort_values("doc_id").groupby("source"):
        b = g["bin_id"].to_numpy()
        assert b[0] == 0
        assert (np.diff(b) >= 0).all()


def test_mixture_interleave_weight_proportions(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        mixture_interleave,
    )

    out = mixture_interleave(SF_DIR)
    assert list(out["position"]) == list(range(1, len(out) + 1))
    # stride scheduling ⇒ source emission counts in the head track the
    # integer weights 1 + (suffix % 3): a weight-3 source appears ~3× a
    # weight-1 source (exact within ±1 cycle granularity)
    w = out["source"].str.slice(3).astype(int) % 3 + 1
    per = pd.DataFrame({"source": out["source"], "w": w}).groupby(
        "source"
    ).agg(n=("w", "size"), w=("w", "first"))
    ratio = per["n"] / per["w"]
    assert ratio.max() - ratio.min() <= 1.0
    pd.testing.assert_frame_equal(out, mixture_interleave(SF_DIR))


# ---------------------------------------------------------------------------
# KMV bottom-k quantile sketch
# ---------------------------------------------------------------------------


def test_kmv_distributed_equals_sequential_exactly(ray_session):
    """The k-smallest-hash set is a pure function of the key SET
    (SplitMix64 is bijective on uint64, event_id unique), so the
    distributed partial→sort+limit plan must reproduce the sequential
    sketch bit-for-bit at ANY partitioning."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        kmv_quantiles,
        kmv_sequential,
    )

    df = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "value"]
    )
    for blocks in (3, 11):
        ds = rd.read_parquet(
            f"{SF_DIR}/events.parquet",
            columns=["event_id", "value"],
            override_num_blocks=blocks,
        )
        got = kmv_quantiles(ds, "event_id", "value")
        want = kmv_sequential(df["event_id"].to_numpy(), df["value"].to_numpy())
        pd.testing.assert_frame_equal(got, want)


def test_kmv_rank_error_bounded(ray_session):
    """Rank error of the k-sample quantiles vs the TRUE empirical
    quantiles is O(1/sqrt(k)); with k=2048 over 200k keyed rows the
    p50/p95/p99 estimates must land within 5 rank-percentage points."""
    import math

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import kmv_quantiles

    rng = np.random.default_rng(41)
    n = 200_000
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "v": rng.lognormal(mean=1.0, sigma=1.2, size=n),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = kmv_quantiles(ds, "k", "v").iloc[0]
    assert got["n_total"] == n and got["n_sample"] == 2048
    sv = np.sort(df["v"].to_numpy())
    for p in (0.5, 0.95, 0.99):
        est = got[f"value_p{int(p * 100)}"]
        true_rank = np.searchsorted(sv, est, side="right") / n
        assert abs(true_rank - p) < 0.05, (p, true_rank, est)


# ---------------------------------------------------------------------------
# BPE encode / token counting
# ---------------------------------------------------------------------------


def test_bpe_encode_rank_order_and_overlaps():
    from knowledge_graph_construction_ray.stages.bpe import encode_token_count

    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_token_count("abc", ranks) == 1   # ab then abc
    assert encode_token_count("abab", ranks) == 2  # ab|ab
    assert encode_token_count("cab", ranks) == 2   # c|ab
    assert encode_token_count("xyz", ranks) == 3   # untouched OOV
    assert encode_token_count("aaa", {("a", "a"): 0}) == 2  # greedy leftmost
    assert encode_token_count("", ranks) == 0


def test_bpe_token_counts_distributed_equals_sequential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.bpe import (
        BPETokenCounter,
        bpe_train_vectorized,
        corpus_word_counts,
        count_bpe_tokens,
    )

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=5,
    )
    wc = corpus_word_counts(ds, 10_000)
    merges = bpe_train_vectorized(
        wc["word"].to_numpy(object), wc["n"].to_numpy(np.int64), 32
    )
    got = count_bpe_tokens(ds, merges).sort("doc_id").to_pandas()
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = (
        BPETokenCounter(merges)(df.reset_index(drop=True))
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # merges shorten: every doc's BPE count ≤ its word-char count and
    # ≥ its word count
    assert (got["n_bpe_tokens"] >= got["n_words"]).all()


# ---------------------------------------------------------------------------
# Simplified silhouette (clustering quality)
# ---------------------------------------------------------------------------


def test_silhouette_partition_invariant(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import label_silhouette

    outs = []
    for blocks in (2, 9):
        ds = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet",
            columns=["label", "embedding"],
            override_num_blocks=blocks,
        )
        outs.append(label_silhouette(ds))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["avg_silhouette"].abs() <= 1.0).all()


def test_silhouette_separates_tight_clusters_from_random_labels(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import label_silhouette

    rng = np.random.default_rng(5)
    n, dim = 600, 8
    centers = rng.normal(size=(3, dim)) * 10.0
    lab = rng.integers(0, 3, size=n)
    tight = centers[lab] + rng.normal(size=(n, dim)) * 0.05
    # plain Python lists → Arrow list<double> (the operator's documented
    # column contract; ndarray cells become Ray's tensor extension type)
    df_tight = pd.DataFrame(
        {"label": lab.astype(np.int32),
         "embedding": [(v.astype(np.float32) * 0.03).tolist() for v in tight]}
    )
    df_rand = df_tight.copy()
    df_rand["label"] = rng.permutation(lab).astype(np.int32)
    s_tight = label_silhouette(rd.from_pandas(df_tight).repartition(4))
    s_rand = label_silhouette(rd.from_pandas(df_rand).repartition(4))
    assert s_tight["avg_silhouette"].mean() > 0.9
    assert s_rand["avg_silhouette"].mean() < 0.3


def test_silhouette_single_label_raises(ray_session):
    import pytest
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import label_silhouette

    df = pd.DataFrame(
        {"label": np.zeros(4, dtype=np.int32),
         "embedding": [[0.1, 0.1, 0.1, 0.1]] * 4}
    )
    with pytest.raises(ValueError, match="2 labels"):
        label_silhouette(rd.from_pandas(df))


# ---------------------------------------------------------------------------
# Bigram LM surprisal (quality scoring)
# ---------------------------------------------------------------------------


def test_bigram_surprisal_hand_computed():
    from knowledge_graph_construction_ray.stages.lm import (
        bigram_surprisal_sequential,
    )

    out = bigram_surprisal_sequential(["a b a", "a b"], [0, 1], alpha=0.5)
    # vocab: a(3) id0, b(2) id1, OOV id2 → n_ids=3
    # bigrams: (a,b)=2, (b,a)=1; ctx: a=2, b=1
    p_b_a = (2 + 0.5) / (2 + 0.5 * 3)
    p_a_b = (1 + 0.5) / (1 + 0.5 * 3)
    want0 = (-np.log(p_b_a) - np.log(p_a_b)) / 2
    want1 = -np.log(p_b_a)
    assert out["n_bigrams"].tolist() == [2, 1]
    assert np.isclose(out["surprisal"].iloc[0], want0)
    assert np.isclose(out["surprisal"].iloc[1], want1)


def test_bigram_surprisal_pruning_and_degenerate_docs():
    from knowledge_graph_construction_ray.stages.lm import (
        bigram_surprisal_sequential,
    )

    out = bigram_surprisal_sequential(
        ["a b a", "", "x", None], [0, 1, 2, 3], alpha=0.5, max_bigrams=1
    )
    # bigrams (a,b)=1 and (b,a)=1 tie; top-1 keeps the smaller key (a,b);
    # (b,a) scores as unseen but the context counts keep their full mass
    p_b_a = (1 + 0.5) / (1 + 0.5 * 4)  # vocab a,b,x → n_ids=4
    p_a_b = (0 + 0.5) / (1 + 0.5 * 4)
    assert np.isclose(
        out["surprisal"].iloc[0], (-np.log(p_b_a) - np.log(p_a_b)) / 2
    )
    assert out.loc[1:, "n_bigrams"].tolist() == [0, 0, 0]
    assert (out.loc[1:, "surprisal"] == 0.0).all()


def test_bigram_surprisal_distributed_equals_sequential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.lm import (
        bigram_surprisal_sequential,
        score_surprisal,
        train_bigram_lm,
    )

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = bigram_surprisal_sequential(df["text"], df["doc_id"].to_numpy())
    for blocks in (2, 7):
        ds = rd.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "text"],
            override_num_blocks=blocks,
        )
        lm = train_bigram_lm(ds)
        got = score_surprisal(ds, lm).sort("doc_id").to_pandas()
        pd.testing.assert_frame_equal(got, want)


def test_bigram_surprisal_separates_gibberish_from_fluent():
    from knowledge_graph_construction_ray.stages.lm import (
        bigram_surprisal_sequential,
    )

    corpus = ["the cat sat on the mat"] * 50 + [
        "the cat sat on the mat",
        "zqx vbw qpk jjt wvz nlr",
    ]
    out = bigram_surprisal_sequential(corpus, list(range(len(corpus))))
    fluent = out["surprisal"].iloc[-2]
    gibberish = out["surprisal"].iloc[-1]
    assert gibberish > fluent + 1.0


# ---------------------------------------------------------------------------
# KMV set operations (Jaccard / union / intersection estimates)
# ---------------------------------------------------------------------------


def test_kmv_overlap_distributed_equals_sequential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        kmv_set_overlap,
        kmv_set_overlap_sequential,
    )

    df = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
    )
    want = kmv_set_overlap_sequential(
        df.loc[df["event_type"] == "click", "user_id"].to_numpy(),
        df.loc[df["event_type"] == "view", "user_id"].to_numpy(),
        "click",
        "view",
    )
    for blocks in (3, 9):
        ds = rd.read_parquet(
            f"{SF_DIR}/events.parquet",
            columns=["event_type", "user_id"],
            override_num_blocks=blocks,
        )
        got = kmv_set_overlap(ds, "event_type", "user_id", "click", "view")
        pd.testing.assert_frame_equal(got, want)


def test_kmv_overlap_absent_groups_raise(ray_session):
    """Misspelled / absent group names must raise, not return NaN —
    and the all-empty partial must stay a typed (non-null) Arrow block
    through the exchange."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import kmv_set_overlap

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_type", "user_id"],
        override_num_blocks=3,
    )
    with pytest.raises(ValueError, match="no rows matched either group"):
        kmv_set_overlap(ds, "event_type", "user_id", "clickk", "vieww")


def test_kmv_overlap_estimator_accuracy():
    """Sets ≫ k exercise the estimation branch: with k=1024 over
    |A|=60k, |B|=50k, |A∩B|=20k the Jaccard/union/intersection
    estimates must land within ~4·(1/sqrt(k)) relative error."""
    from knowledge_graph_construction_ray.stages.sketch import (
        kmv_set_overlap_sequential,
    )

    a = np.arange(0, 60_000, dtype=np.int64)
    b = np.arange(40_000, 90_000, dtype=np.int64)
    row = kmv_set_overlap_sequential(a, b, "a", "b", k=1024).iloc[0]
    assert not row["exact"]
    true_union, true_inter = 90_000.0, 20_000.0
    tol = 4.0 / np.sqrt(1024)
    assert abs(row["jaccard"] - true_inter / true_union) < tol
    assert abs(row["union_est"] - true_union) / true_union < tol
    assert abs(row["inter_est"] - true_inter) / true_inter < 2 * tol


def test_kmv_overlap_exact_branch_small_sets():
    from knowledge_graph_construction_ray.stages.sketch import (
        kmv_set_overlap_sequential,
    )

    row = kmv_set_overlap_sequential(
        np.array([1, 2, 3, 4]), np.array([3, 4, 5]), "a", "b"
    ).iloc[0]
    assert row["exact"]
    assert row["union_est"] == 5.0 and row["inter_est"] == 2.0
    assert row["jaccard"] == 2.0 / 5.0


# ---------------------------------------------------------------------------
# Per-label centroids (integer-exact summation)
# ---------------------------------------------------------------------------


def test_label_centroids_partition_invariant_and_matches_numpy(ray_session):
    """Quantized int64 sums are exact and order-free, so the distributed
    mean must equal the single-process computation bit-for-bit at any
    block count."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import (
        CENTROID_SCALE,
        centroid_quantize,
        label_centroids,
    )

    df = pd.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["label", "embedding"]
    )
    mat = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
    q = centroid_quantize(mat.ravel()).reshape(mat.shape)
    rows = []
    for lab in sorted(df["label"].unique()):
        sel = q[(df["label"] == lab).to_numpy()]
        s = sel.sum(axis=0)
        n = len(sel)
        for d in range(mat.shape[1]):
            rows.append(
                (lab, d + 1, np.float64(s[d]) / (CENTROID_SCALE * np.float64(n)), n)
            )
    want = pd.DataFrame(rows, columns=["label", "dim", "centroid", "n"])
    for blocks in (2, 9):
        ds = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet",
            columns=["label", "embedding"],
            override_num_blocks=blocks,
        )
        got = label_centroids(ds)
        assert (got["centroid"].to_numpy() == want["centroid"].to_numpy()).all()
        assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
        assert (got["label"].to_numpy() == want["label"].to_numpy()).all()


def test_label_centroids_guards():
    import pytest

    from knowledge_graph_construction_ray.stages.embed import centroid_quantize

    with pytest.raises(ValueError, match="overflow"):
        centroid_quantize(np.array([64.0], dtype=np.float32))


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------


def test_weighted_sample_distributed_equals_sequential_exactly(ray_session):
    """The k-smallest exponential-race keys are a pure function of the
    (id, weight, seed) set, so the distributed partial→sort+limit plan
    must reproduce the sequential sample bit-for-bit at ANY partitioning."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        weighted_sample,
        weighted_sample_sequential,
    )

    df = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    want = weighted_sample_sequential(
        df["doc_id"].to_numpy(),
        df["n_chars"].to_numpy(),
        k=50,
        seed=7,
        id_col="doc_id",
        weight_col="n_chars",
    )
    for blocks in (3, 11):
        ds = rd.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "n_chars"],
            override_num_blocks=blocks,
        )
        got = weighted_sample(ds, "doc_id", "n_chars", k=50, seed=7)
        pd.testing.assert_frame_equal(got, want)


def test_weighted_sample_k1_is_weighted_categorical():
    """For k=1 the Efraimidis–Spirakis winner IS a single weighted
    categorical draw: P(i) = w_i / Σw exactly.  Empirical frequency over
    2000 independent seeds must match within 4 binomial sigma."""
    from knowledge_graph_construction_ray.stages.sketch import (
        weighted_sample_sequential,
    )

    ids = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([1.0, 1.0, 8.0])
    n_trials = 2000
    wins = sum(
        int(weighted_sample_sequential(ids, w, k=1, seed=s)["id"].iloc[0]) == 3
        for s in range(n_trials)
    )
    p = 0.8
    sigma = (p * (1 - p) / n_trials) ** 0.5
    assert abs(wins / n_trials - p) < 4 * sigma, wins / n_trials


def test_grouped_weighted_sample_distributed_equals_sequential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.sketch import (
        grouped_weighted_sample,
        grouped_weighted_sample_sequential,
    )

    df = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["lang", "doc_id", "n_chars"]
    )
    want = grouped_weighted_sample_sequential(
        df, "lang", "doc_id", "n_chars", k=15, seed=11
    )
    for blocks in (3, 8):
        ds = rd.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["lang", "doc_id", "n_chars"],
            override_num_blocks=blocks,
        )
        got = grouped_weighted_sample(ds, "lang", "doc_id", "n_chars", k=15, seed=11)
        pd.testing.assert_frame_equal(got, want)
    # per-group budget respected
    assert (want.groupby("lang").size() <= 15).all()


def test_weighted_sample_excludes_nonpositive_weights():
    from knowledge_graph_construction_ray.stages.sketch import (
        weighted_sample_sequential,
    )

    ids = np.arange(6, dtype=np.int64)
    w = np.array([0.0, -1.0, np.nan, 2.0, 3.0, 4.0])
    out = weighted_sample_sequential(ids, w, k=6, seed=0)
    assert sorted(out["id"]) == [3, 4, 5]


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_bounded_overestimate():
    from knowledge_graph_construction_ray.stages.sketch import (
        CMS_W,
        cms_query,
        cms_sequential,
    )

    rng = np.random.default_rng(11)
    # zipf-ish counts over 50k distinct terms — heavier than CMS_W cells
    terms = np.array([f"term-{i}" for i in range(50_000)], dtype=object)
    counts = (rng.zipf(1.3, size=50_000) % 1000 + 1).astype(np.int64)
    table = cms_sequential(terms, counts)
    est = cms_query(table, terms)
    assert (est >= counts).all()  # one-sided error: never undercounts
    # standard CM bound: err ≤ e·N/w with prob 1-(1/2)^d per probe;
    # assert the 99th-percentile error is within 2·N/w (loose, stable)
    err = est - counts
    assert np.quantile(err, 0.99) <= 2 * counts.sum() / CMS_W


def test_cms_cell_merge_is_associative():
    from knowledge_graph_construction_ray.stages.sketch import (
        cms_cells,
        cms_sequential,
        cms_table_from_cells,
    )

    terms = np.array([f"t{i}" for i in range(10_000)], dtype=object)
    counts = np.arange(1, 10_001, dtype=np.int64)
    whole = cms_sequential(terms, counts)
    parts = pd.concat(
        [
            cms_cells(terms[:3000], counts[:3000]),
            cms_cells(terms[3000:7000], counts[3000:7000]),
            cms_cells(terms[7000:], counts[7000:]),
        ]
    )
    merged = cms_table_from_cells(
        parts.groupby("cell", as_index=False)["cnt"].sum()
    )
    assert np.array_equal(whole, merged)


def test_cms_absent_term_is_zero():
    from knowledge_graph_construction_ray.stages.sketch import (
        cms_query,
        cms_sequential,
    )

    # a term never inserted can only collide upward from 0; with a small
    # vocabulary the sketch is exact and the absent probe must return 0
    table = cms_sequential(
        np.array(["a", "b", "c"], dtype=object), np.array([5, 7, 9])
    )
    est = cms_query(table, np.array(["a", "b", "c", "never"], dtype=object))
    assert list(est) == [5, 7, 9, 0]


def test_cms_empty_batch_keeps_schema():
    from knowledge_graph_construction_ray.stages.sketch import cms_cells

    out = cms_cells(np.array([], dtype=object), np.array([], dtype=np.int64))
    assert list(out.columns) == ["cell", "cnt"]
    assert len(out) == 0


def test_cms_distributed_query_matches_sequential_golden(ray_session):
    from knowledge_graph_construction_ray.golden import cms_terms_golden
    from knowledge_graph_construction_ray.query.relational import (
        corpus_cms_term_counts,
    )

    out = corpus_cms_term_counts(SF_DIR).reset_index(drop=True)
    gold = cms_terms_golden(SF_DIR).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, gold)


def test_grouped_quantiles_match_duckdb(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        EVENTS_TYPE_QUANTILES_SQL,
        events_type_quantiles,
    )

    out = events_type_quantiles(SF_DIR).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    gold = con.execute(EVENTS_TYPE_QUANTILES_SQL).df()
    pd.testing.assert_frame_equal(out, gold, check_dtype=False)


# ---------------------------------------------------------------------------
# Market-basket pair co-occurrence / rolling-window distinct count
# ---------------------------------------------------------------------------


def test_part_pairs_hot_basket_refusal(ray_session, tmp_path):
    """A hub order past max_basket must raise (O(basket²) expansion),
    not silently expand."""
    import ray.data as rd

    from knowledge_graph_construction_ray.query.relational import (
        lineitem_part_pairs,
    )

    big = pd.DataFrame(
        {"l_orderkey": np.int64(1), "l_partkey": np.arange(50, dtype=np.int64)}
    )
    big.to_parquet(tmp_path / "lineitem.parquet")
    with pytest.raises(Exception, match="max_basket"):
        lineitem_part_pairs(str(tmp_path), max_basket=10)
    # and at a permissive cap the same input yields C(50,2) count-1 pairs
    out = lineitem_part_pairs(str(tmp_path), k=5000, max_basket=64)
    assert len(out) == 50 * 49 // 2
    assert (out["n"] == 1).all()


def test_rolling_dau_crafted_window(ray_session, tmp_path):
    """A user active on one day covers exactly the next window-1 days;
    overlapping users dedup to one per covered day."""
    from knowledge_graph_construction_ray.query.relational import (
        events_rolling_dau,
    )

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            # user 1 active day 0 twice (dedup), user 2 active day 3
            "ts": [base, base + pd.Timedelta(hours=5),
                   base + pd.Timedelta(days=3)],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = events_rolling_dau(str(tmp_path), window=7)
    day0 = base.value // (86_400 * 10**9)
    # user 1 covers days 0-6, user 2 covers days 3-9
    want = {day0 + i: (2 if 3 <= i <= 6 else 1) for i in range(10)}
    got = dict(zip(out["day"], out["dau7"]))
    assert got == want


def test_cov_profile_negative_covariance_trunc_parity(ray_session, tmp_path):
    """Anti-correlated columns → negative covariance; Python floor vs
    DuckDB truncating // disagree by 1 on negatives unless handled —
    both arms must stay bit-comparable."""
    from knowledge_graph_construction_ray.query.relational import (
        LINEITEM_COV_SQL,
        lineitem_cov_profile,
    )

    rng = np.random.default_rng(11)
    n = 5_000
    q = rng.integers(1, 50, n).astype(np.float64)
    df = pd.DataFrame(
        {
            "l_quantity": q,
            "l_extendedprice": 1000.0 - 17.0 * q + rng.normal(0, 3, n).round(2),
            "l_discount": rng.uniform(0, 0.1, n).round(2),
            "l_tax": rng.uniform(0, 0.08, n).round(2),
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet")
    got = lineitem_cov_profile(str(tmp_path))
    neg = got.set_index(["col_x", "col_y"]).loc[
        ("l_quantity", "l_extendedprice"), "cov_c100"
    ]
    assert neg < 0  # the anti-correlation is visible
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = con.execute(LINEITEM_COV_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_transitions_order_sensitive(ray_session, tmp_path):
    """Transition counts depend on per-user temporal order — a crafted
    A→B→A sequence yields exactly (A,B) and (B,A), never (A,A)."""
    from knowledge_graph_construction_ray.query.relational import (
        events_type_transitions,
    )

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "event_id": np.arange(4, dtype=np.int64),
            "ts": [base, base + pd.Timedelta(minutes=1),
                   base + pd.Timedelta(minutes=2), base],
            "event_type": ["A", "B", "A", "C"],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = events_type_transitions(str(tmp_path))
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("A", "B"): 1, ("B", "A"): 1}


def test_time_weighted_value_hand_computed(ray_session, tmp_path):
    """Step-function integral by hand, including a NEGATIVE value whose
    quotient must truncate toward zero (DuckDB //), and a single-event
    user who must be excluded."""
    from knowledge_graph_construction_ray.query.relational import (
        TWA_SQL,
        events_time_weighted_value,
    )

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 2, 2, 3], dtype=np.int64),
            "event_id": np.arange(7, dtype=np.int64),
            "ts": [base, base + pd.Timedelta(seconds=10),
                   base + pd.Timedelta(seconds=30),
                   base, base + pd.Timedelta(seconds=1),
                   base + pd.Timedelta(seconds=3),
                   base],
            # user 1: 2.0 for 10s then 5.0 for 20s -> (20+100)/30 = 4.0
            # user 2: -1.0 for 1s then -2.0 for 2s ->
            #   num = -5e9, den = 3e6 -> -1666.67 -> TRUNC -1666
            #   (Python floor would give -1667 — the divergence case)
            "value": [2.0, 5.0, 99.0, -1.0, -2.0, 42.0, 7.0],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = events_time_weighted_value(str(tmp_path)).reset_index(drop=True)
    want = pd.DataFrame(
        {"user_id": np.array([1, 2], dtype=np.int64),
         "twa_millis": np.array([4000, -1666], dtype=np.int64)}
    )
    pd.testing.assert_frame_equal(got, want)
    assert 3 not in set(got["user_id"])  # single-event user excluded
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    pd.testing.assert_frame_equal(
        got, con.execute(TWA_SQL).df(), check_dtype=False
    )


# ---------------------------------------------------------------------------
# round-4 additions: span-modality bigrams, digit buckets, zipf coverage
# ---------------------------------------------------------------------------


def test_span_bigram_kernel_edge_cases(ray_session):
    """The Arrow offsets-mask pairing handles empty span lists and
    single-span docs (neither contributes a pair) and never pairs across
    document boundaries."""
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import bucketed_agg
    from knowledge_graph_construction_ray.query.relational import (
        kg_span_modality_bigrams,  # noqa: F401  (import sanity)
    )

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )

    def sp(kind):
        return {"kind": kind, "text": "x", "media_ref": "", "offset": 0}

    docs = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "spans": pa.array(
                [
                    [sp("t"), sp("m"), sp("t")],  # pairs: (t,m), (m,t)
                    [],                            # no pairs
                    [sp("m")],                     # no pairs
                    [sp("t"), sp("t")],            # pair: (t,t)
                ],
                type=pa.list_(span_t),
            ),
        }
    )
    # reuse the query's kernel via a tiny inline pipeline over this table
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pd.DataFrame:
        spans = batch.column("spans").combine_chunks()
        kinds = pc.list_flatten(spans).field("kind").to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        lengths = lengths.astype(np.int64)
        ends = np.cumsum(lengths)
        mask = np.ones(len(kinds), dtype=bool)
        mask[ends[lengths > 0] - 1] = False
        a_idx = np.flatnonzero(mask)
        t = pd.DataFrame({"kind_a": kinds[a_idx], "kind_b": kinds[a_idx + 1]})
        return t.groupby(["kind_a", "kind_b"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    out = (
        bucketed_agg(
            rd.from_arrow(docs).map_batches(pairs, batch_format="pyarrow"),
            ["kind_a", "kind_b"],
            {"n": ("n", "sum")},
        )
        .sort(["kind_a", "kind_b"])
        .to_pandas()
    )
    want = pd.DataFrame(
        {"kind_a": ["m", "t", "t"], "kind_b": ["t", "m", "t"],
         "n": np.array([1, 1, 1], dtype=np.int64)}
    )
    pd.testing.assert_frame_equal(out, want)


def test_interarrival_digit_bucket_matches_string_length():
    """The powers-of-10 searchsorted digit bucket == decimal-string
    length for every boundary-adjacent value (no float log involved)."""
    from knowledge_graph_construction_ray.query.relational import _POW10

    vals = np.array(
        [0, 1, 9, 10, 11, 99, 100, 101, 999, 1000, 10**6 - 1, 10**6,
         10**12, 10**17, 10**18 - 1],
        dtype=np.int64,
    )
    digits = np.searchsorted(_POW10, vals, side="right") + 1
    assert digits.tolist() == [len(str(int(v))) for v in vals]


# ---------------------------------------------------------------------------
# k-means (integer-exact Lloyd)
# ---------------------------------------------------------------------------


def test_kmeans_partition_invariant(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import kmeans_assign

    outs = []
    for blocks in (2, 9):
        ds = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            override_num_blocks=blocks,
        )
        outs.append(
            kmeans_assign(ds, k=4, iters=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert set(outs[0]["cluster"].unique()) <= {0, 1, 2, 3}
    # non-degenerate: more than one cluster survives on real data
    assert outs[0]["cluster"].nunique() > 1


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """All points identical → every point lands in cluster 0; the three
    emptied clusters keep their (identical) seed centroids and the run
    still terminates deterministically."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import kmeans_assign

    df = pd.DataFrame(
        {"vec_id": np.arange(10, dtype=np.int64),
         "embedding": [[0.5, -0.25, 0.125]] * 10}
    )
    out = (
        kmeans_assign(rd.from_pandas(df).repartition(3), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert (out["cluster"].to_numpy() == 0).all()


def test_kmeans_raises_on_too_few_points(ray_session):
    import pytest
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.embed import kmeans_assign

    df = pd.DataFrame(
        {"vec_id": np.arange(2, dtype=np.int64), "embedding": [[0.1], [0.2]]}
    )
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_assign(rd.from_pandas(df), k=4, iters=2)
