"""Unit tests for the search/chunk operator batch: BM25 ranked search
(integer-exact contribution kernel, both the int64 fast arm and the
Python-int wide arm), codepoint window chunking, and bounded-state heavy
terms.  (End-to-end oracle parity for the three queries() entries is
covered by test_driver_parity.py.)"""

from fractions import Fraction

import duckdb
import numpy as np
import pandas as pd

from knowledge_graph_construction_ray.query.relational import (
    _bm25_contrib,
    bm25_search,
    corpus_heavy_terms,
    docs_chunk_windows,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BM25 contribution kernel
# ---------------------------------------------------------------------------


def _contrib_reference(tf, dl, a, nd, w):
    """Independent exact-rational reference: the cleared-fraction formula
    recomputed with Fraction, floored at the end — the single truncating
    division is the only rounding point in the contract."""
    out = []
    for t, d in zip(tf, dl):
        num = Fraction(44 * a * int(t) * 1000)
        den = Fraction(20 * a * int(t) + 6 * a + 18 * int(d) * nd)
        out.append(w * (num // den))
    return np.array(out, dtype=object)


def test_bm25_contrib_int64_arm_matches_fraction_reference():
    tf = np.array([1, 3, 17, 200], dtype=np.int64)
    dl = np.array([10, 55, 480, 553], dtype=np.int64)
    got = _bm25_contrib(tf, dl, a_toks=27_165, n_docs=500, w=1666)
    want = _contrib_reference(tf, dl, 27_165, 500, 1666)
    assert got.dtype == object
    assert list(got) == list(want)


def test_bm25_contrib_wide_arm_is_exact_beyond_int64():
    # corpus stats big enough that 44_000·A·tf wraps int64: the kernel
    # must take the object-int arm and still be exact
    a = 10**15  # 1e15 tokens
    nd = 10**12
    tf = np.array([1, 7, 2200], dtype=np.int64)
    dl = np.array([100, 100_000, 1], dtype=np.int64)
    w = (nd * 1000) // 3
    assert 44_000 * a * int(tf.max()) >= 2**62  # precondition: wide arm
    got = _bm25_contrib(tf, dl, a, nd, w)
    want = _contrib_reference(tf, dl, a, nd, w)
    assert list(got) == list(want)
    assert all(isinstance(v, int) for v in got)


def test_bm25_contrib_final_product_cannot_wrap():
    """Review regression: num/den fit int64 but w·(num//den) would wrap —
    the guard must route to the wide arm (the saturation term is < 2200,
    so w·2200 bounds the product)."""
    a, nd = 10**14, 10**13
    w = (nd * 1000) // 1  # df=1 → w=1e16; w·2200 > 2^62
    tf = np.array([1], dtype=np.int64)
    dl = np.array([1], dtype=np.int64)
    assert 44_000 * a * 1 < 2**62  # the old guards alone would fast-path
    got = _bm25_contrib(tf, dl, a, nd, w)
    want = _contrib_reference(tf, dl, a, nd, w)
    assert list(got) == list(want)
    assert got[0] > 0  # the wrapped version was negative


def test_bm25_contrib_arms_agree_at_the_dispatch_boundary():
    tf = np.array([5, 50], dtype=np.int64)
    dl = np.array([20, 2000], dtype=np.int64)
    for a in (10**6, 10**13):  # straddles the int64-fast-path condition
        got = _bm25_contrib(tf, dl, a, 10**6, 31)
        want = _contrib_reference(tf, dl, a, 10**6, 31)
        assert list(got) == list(want)


def test_bm25_search_ranks_and_is_deterministic(ray_session):
    out1 = bm25_search(SF_DIR)
    out2 = bm25_search(SF_DIR)
    pd.testing.assert_frame_equal(out1, out2)
    assert list(out1.columns) == ["doc_id", "score"]
    assert len(out1) == 10
    # descending by score with doc_id tiebreak
    s = out1["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


# ---------------------------------------------------------------------------
# Window chunking
# ---------------------------------------------------------------------------


def test_chunk_windows_reconstruct_documents(ray_session):
    """Stitching chunk prefixes (the first `stride` chars of each chunk,
    all of the last) reproduces every document byte-for-byte — no text is
    lost or duplicated by the windowing."""
    out = docs_chunk_windows(SF_DIR)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    rebuilt = (
        out.sort_values(["doc_id", "chunk_id"])
        .groupby("doc_id")["chunk"]
        .apply(lambda ch: "".join(c[:150] for c in ch[:-1]) + ch.iloc[-1])
    )
    ref = docs.set_index("doc_id")["text"]
    assert rebuilt.to_dict() == ref.to_dict()


def test_chunk_windows_overlap_contract(ray_session):
    """Consecutive chunks of one doc overlap by width−stride chars: the
    tail of chunk k equals the head of chunk k+1."""
    out = docs_chunk_windows(SF_DIR)
    some = out[out["doc_id"] == out["doc_id"].iloc[0]].reset_index(drop=True)
    for i in range(len(some) - 1):
        a, b = some.loc[i, "chunk"], some.loc[i + 1, "chunk"]
        if len(a) == 200:  # full-width chunk ⇒ 50-char overlap exists
            assert a[150:] == b[: len(a) - 150]


def test_chunk_windows_non_ascii_codepoint_parity(ray_session):
    """Arrow utf8_slice_codeunits slices CODEPOINTS for utf8 arrays —
    verify against DuckDB substr on multibyte text via a temp table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    text = "héllo wörld ünïcode " * 20  # 400 codepoints, multibyte
    arr = pa.array([text])
    got = pc.utf8_slice_codeunits(arr, start=150, stop=350).to_pylist()[0]
    con = duckdb.connect()
    want = con.execute("SELECT substr(?, 151, 200)", [text]).fetchone()[0]
    assert got == want


# ---------------------------------------------------------------------------
# Heavy terms
# ---------------------------------------------------------------------------


def test_heavy_terms_match_exact_counts(ray_session):
    """The bounded-candidate path returns EXACTLY the terms an exact
    whole-corpus count returns — the Misra-Gries superset guarantee plus
    exact verification leaves no approximation."""
    out = corpus_heavy_terms(SF_DIR)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    toks = docs["text"].str.split().explode().dropna()
    vc = toks.value_counts()
    thresh = max(1, len(toks) // 200)
    want = (
        pd.DataFrame({"term": vc[vc >= thresh].index, "n": vc[vc >= thresh].to_numpy()})
        .sort_values(["n", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_heavy_terms_candidate_bound_per_block():
    """The pass-1 rule keeps at most 400 candidates per block whatever
    the vocabulary: 400·c > n admits fewer than 400 winners when every
    count is 1 and exactly bounds the dense case."""
    rng = np.random.default_rng(7)
    toks = pd.Series(rng.integers(0, 1_000_000, 50_000).astype(str))
    vc = toks.value_counts()
    keep = vc[(400 * vc.to_numpy(np.int64)) > len(toks)]
    assert len(keep) <= 400


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------


def test_bpe_vectorized_matches_reference_classic_and_overlap():
    from knowledge_graph_construction_ray.stages.bpe import (
        bpe_train_reference,
        bpe_train_vectorized,
    )

    for wc, k in [
        ({"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}, 4),
        ({"aaaa": 3, "aaab": 2, "baaa": 1, "abab": 4}, 6),
    ]:
        ref = bpe_train_reference(wc, k)
        vec = bpe_train_vectorized(
            np.array(list(wc), object), np.array(list(wc.values())), k
        )
        assert ref == list(zip(vec["left"], vec["right"], vec["n"].astype(int)))


def test_bpe_vectorized_fuzz_against_reference():
    from knowledge_graph_construction_ray.stages.bpe import (
        bpe_train_reference,
        bpe_train_vectorized,
    )

    rng = np.random.default_rng(3)
    for _ in range(20):
        n = rng.integers(2, 25)
        words = ["".join(rng.choice(list("abc"), rng.integers(1, 9))) for _ in range(n)]
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + int(rng.integers(1, 20))
        k = int(rng.integers(1, 9))
        ref = bpe_train_reference(wc, k)
        vec = bpe_train_vectorized(
            np.array(list(wc), object), np.array(list(wc.values())), k
        )
        assert ref == list(zip(vec["left"], vec["right"], vec["n"].astype(int)))


def test_bpe_word_count_cap_is_deterministic(ray_session):
    """max_vocab cap keeps the top words by (count desc, word asc) —
    identical between the distributed count pass and the pure-Python
    golden's sorted() cap."""
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.bpe import corpus_word_counts

    df = pd.DataFrame(
        {"text": ["b b b a a c", "a d d", "e e e e"]}
    )
    out = corpus_word_counts(rd.from_pandas(df), max_vocab=3)
    # counts: e=4, a=3, b=3, d=2, c=1 → top3 = e, a, b (a before b on tie)
    assert list(out["word"]) == ["e", "a", "b"]
    assert list(out["n"]) == [4, 3, 3]


# ---------------------------------------------------------------------------
# Bigrams + snapshot diff
# ---------------------------------------------------------------------------


def test_bigrams_single_token_docs_emit_nothing(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.query.relational import corpus_top_bigrams

    # exercise the kernel directly on crafted batches via a tmp parquet
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["solo", "  ", "a b a b"]}
        ).to_parquet(os.path.join(d, "documents.parquet"))
        out = corpus_top_bigrams(d)
    want = pd.DataFrame(
        {"w1": ["a", "b"], "w2": ["b", "a"], "n": [2, 1]}
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want, check_dtype=False)


def test_snapshot_diff_statuses(ray_session):
    from knowledge_graph_construction_ray.query.relational import corpus_snapshot_diff

    out = corpus_snapshot_diff(SF_DIR)
    assert set(out.columns) == {"doc_id", "status"}
    assert set(out["status"].unique()) <= {"added", "deleted", "changed"}
    # the derivation rules, spot-checked: %7 deleted unless re-added
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    deleted = set(out.loc[out["status"] == "deleted", "doc_id"])
    assert deleted == set(ids[ids % 7 == 0])
    changed = set(out.loc[out["status"] == "changed", "doc_id"])
    assert changed == set(ids[(ids % 7 != 0) & (ids % 10 == 0)])
    added = set(out.loc[out["status"] == "added", "doc_id"])
    assert added == set(ids[ids % 13 == 0] + 1_000_000)


# ---------------------------------------------------------------------------
# Mode + NTILE
# ---------------------------------------------------------------------------


def test_ntile_remainder_distribution(ray_session):
    """NTILE semantics: the first N%k tiles get one extra row; tile sizes
    never differ by more than 1 and are non-increasing."""
    from knowledge_graph_construction_ray.query.relational import orders_price_ntile

    out = orders_price_ntile(SF_DIR)
    sizes = out["tile"].value_counts().sort_index()
    assert list(sizes.index) == [1, 2, 3, 4]
    assert sizes.max() - sizes.min() <= 1
    assert (sizes.diff().dropna() <= 0).all()
    assert len(out) == sizes.sum()


def test_ntile_respects_price_order(ray_session):
    from knowledge_graph_construction_ray.query.relational import orders_price_ntile

    out = orders_price_ntile(SF_DIR)
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    m = out.merge(orders, on="o_orderkey")
    # every price in tile t is <= every price in tile t+1
    maxes = m.groupby("tile")["o_totalprice"].max()
    mins = m.groupby("tile")["o_totalprice"].min()
    for t in range(1, 4):
        assert maxes[t] <= mins[t + 1]


def test_modal_hour_tiebreak_is_smallest_hour(ray_session):
    """Craft a corpus where two hours tie: the smaller hour must win."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        events_type_modal_hour,
    )

    ts = pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 05:10", "2024-01-02 09:00", "2024-01-03 09:30"]
    )
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {"event_type": ["x"] * 4, "ts": ts}
        ).to_parquet(os.path.join(d, "events.parquet"))
        out = events_type_modal_hour(d)
    assert list(out.itertuples(index=False)) == [("x", 5, 2)]


def test_dedup_apply_keeps_exactly_cluster_reps(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        dedup_minhash,
        dedup_minhash_apply,
    )

    survivors = set(dedup_minhash_apply(SF_DIR)["doc_id"])
    clusters = dedup_minhash(SF_DIR)
    all_ids = set(
        pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])["doc_id"]
    )
    dropped = set(clusters.loc[clusters["doc_id"] != clusters["cluster_rep"], "doc_id"])
    assert survivors == all_ids - dropped
    # every cluster's representative survives
    assert set(clusters["cluster_rep"]) <= survivors


def test_strip_dup_ngrams_removes_planted_boilerplate(ray_session):
    """Plant one 6-token boilerplate line in several docs: after the
    strip, no document contains the planted 5-gram spans, and untouched
    docs come back byte-identical."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        docs_strip_dup_ngrams,
    )

    boiler = "subscribe to our newsletter for daily updates"
    uniq = [f"unique body text number {i} with words w{i} x{i} y{i} z{i}" for i in range(6)]
    texts = [f"{uniq[i]} {boiler}" for i in range(3)] + uniq[3:]
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        out = docs_strip_dup_ngrams(d)
    got = dict(zip(out["doc_id"], out["text"]))
    for i in range(3):
        assert "subscribe" not in got[i] and "newsletter" not in got[i]
        assert got[i].startswith(f"unique body text number {i}")
    for i in range(3, 6):
        assert got[i] == uniq[i]


def test_strip_dup_ngrams_overlapping_spans_union(ray_session):
    """Two dup 5-grams overlapping by 4 tokens remove the 6-token union,
    not just one span."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        docs_strip_dup_ngrams,
    )

    shared = "a b c d e f"  # both 5-grams 'a b c d e' and 'b c d e f' duplicated
    texts = [f"pre1 {shared} post1", f"pre2 {shared} post2"]
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"doc_id": [0, 1], "text": texts}).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        out = docs_strip_dup_ngrams(d)
    assert list(out["text"]) == ["pre1 post1", "pre2 post2"]


def test_curation_funnel_is_monotone_and_anchored(ray_session):
    from knowledge_graph_construction_ray.query.relational import curation_funnel

    out = curation_funnel(SF_DIR)
    n = out["n_rows"].to_numpy()
    assert (n[:-1] >= n[1:]).all()  # each stage only removes
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert n[0] == len(docs)
    assert list(out["stage"]) == ["all", "nonempty", "lang_en", "token_range", "repetition"]


# ---------------------------------------------------------------------------
# Interval-overlap join
# ---------------------------------------------------------------------------


def _overlap_brute(l: pd.DataFrame, r: pd.DataFrame) -> set:
    out = set()
    for _, a in l.iterrows():
        for _, b in r.iterrows():
            if a["s"] <= b["e"] and b["s"] <= a["e"]:
                out.add((a["lid"], b["rid"]))
    return out


def test_interval_join_random_differential(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.interval import (
        interval_overlap_join,
    )

    rng = np.random.default_rng(21)
    for trial in range(4):
        nl, nr = 40, 30
        ls = rng.integers(0, 5000, nl)
        l = pd.DataFrame(
            {"lid": np.arange(nl, dtype=np.int64), "s": ls, "e": ls + rng.integers(0, 800, nl)}
        )
        rs = rng.integers(0, 5000, nr)
        r = pd.DataFrame(
            {"rid": np.arange(nr, dtype=np.int64), "s": rs, "e": rs + rng.integers(0, 800, nr)}
        )
        out = interval_overlap_join(
            rd.from_pandas(l), rd.from_pandas(r),
            bucket_width=256, left_cols=["lid"], right_cols=["rid"],
            num_buckets=4,
        ).to_pandas()
        got = set(zip(out["lid"], out["rid"]))
        assert len(got) == len(out), "pair emitted twice (owner rule broken)"
        assert got == _overlap_brute(l, r)


def test_interval_join_closed_endpoints_and_guard(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.interval import (
        interval_overlap_join,
    )

    # touching endpoints count (closed intervals), disjoint don't
    l = pd.DataFrame({"lid": [0, 1], "s": [0, 100], "e": [10, 110]})
    r = pd.DataFrame({"rid": [0, 1], "s": [10, 111], "e": [20, 120]})
    out = interval_overlap_join(
        rd.from_pandas(l), rd.from_pandas(r),
        bucket_width=64, left_cols=["lid"], right_cols=["rid"],
    ).to_pandas()
    assert set(zip(out["lid"], out["rid"])) == {(0, 0)}

    # replication guard: a giant span must raise, not fan out silently
    wide = pd.DataFrame({"lid": [0], "s": [0], "e": [10_000_000]})
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_replication"):
        interval_overlap_join(
            rd.from_pandas(wide), rd.from_pandas(r),
            bucket_width=64, left_cols=["lid"], right_cols=["rid"],
        ).to_pandas()


def test_kcenter_sample_spread_property(ray_session):
    """k-center greedy invariant: selection distances are non-increasing —
    each new pick's min-distance-to-selected is <= the previous pick's —
    and all picks are distinct."""
    from knowledge_graph_construction_ray.query.relational import (
        embeddings_kcenter_sample,
    )

    out = embeddings_kcenter_sample(SF_DIR, k=8)
    assert out["vec_id"].is_unique and len(out) == 8
    emb = pd.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).set_index("vec_id")["embedding"]
    V = np.stack([np.asarray(emb[v], dtype=np.float64) for v in out["vec_id"]])
    dists = []
    for i in range(1, len(V)):
        d2 = ((V[:i] - V[i]) ** 2).sum(axis=1).min()
        dists.append(d2)
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))


def test_funnel_order_sensitivity(ray_session):
    """A user with purchase BEFORE click must not qualify; one with the
    full ordered sequence must."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        events_funnel_users,
    )

    rows = [
        # user 1: view < click < purchase → qualifies
        (1, "view", "2024-01-01 01:00"), (1, "click", "2024-01-01 02:00"),
        (1, "purchase", "2024-01-01 03:00"),
        # user 2: purchase before click → out
        (2, "view", "2024-01-01 01:00"), (2, "purchase", "2024-01-01 02:00"),
        (2, "click", "2024-01-01 03:00"),
        # user 3: missing view → out
        (3, "click", "2024-01-01 01:00"), (3, "purchase", "2024-01-01 02:00"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["event_id"] = range(len(df))
    df["value"] = 0.0
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = events_funnel_users(d)
    assert list(out["user_id"]) == [1]


def test_retention_counts_each_user_once_per_cell(ray_session):
    from knowledge_graph_construction_ray.query.relational import (
        events_weekly_retention,
    )

    out = events_weekly_retention(SF_DIR)
    users = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    n_users = users["user_id"].nunique()
    # offset-0 cohort cells sum to the distinct-user count exactly
    assert out.loc[out["offset"] == 0, "n_users"].sum() == n_users
    assert (out["n_users"] > 0).all()


def test_outliers_wide_arm_matches_fast_arm_semantics(ray_session):
    """Craft a tiny corpus with a single extreme value: the flagged set is
    exactly the extreme event, and the integer predicate matches the
    Fraction-exact definition (v-mu)^2 > 4 sigma^2."""
    import os
    import tempfile
    from fractions import Fraction

    from knowledge_graph_construction_ray.query.relational import (
        events_value_outliers,
    )

    vals = [10.0] * 20 + [10.5] * 20 + [99.99]
    df = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "event_type": ["x"] * len(vals),
            "value": vals,
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": 0,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = events_value_outliers(d)
    # Fraction reference over cents
    c = [round(v * 100) for v in vals]
    n, s = len(c), sum(c)
    s2 = sum(x * x for x in c)
    mu = Fraction(s, n)
    var = Fraction(n * s2 - s * s, n * n)
    want = {i for i, x in enumerate(c) if (x - mu) ** 2 > 4 * var}
    assert set(out["event_id"]) == want == {len(vals) - 1}


def test_outliers_wide_arm_is_exercised_and_exact(ray_session):
    """Values near the 2^31-cent guard force the Python-int wide arm
    (n·|c|max + |S| squares past 2^62); the flags must still match the
    Fraction-exact definition."""
    import os
    import tempfile
    from fractions import Fraction

    from knowledge_graph_construction_ray.query.relational import (
        events_value_outliers,
    )

    big = 2e7  # 2e9 cents < 2^31 guard, but (n·c)² ≫ 2^62 → wide arm
    vals = [big] * 20 + [big + 1000.0] * 20 + [1.0]
    c = [round(v * 100) for v in vals]
    n, s = len(c), sum(c)
    assert (n * max(abs(x) for x in c) + abs(s)) ** 2 >= 2**62  # precondition
    df = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "event_type": ["x"] * len(vals),
            "value": vals,
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": 0,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = events_value_outliers(d)
    s2 = sum(x * x for x in c)
    mu = Fraction(s, n)
    var = Fraction(n * s2 - s * s, n * n)
    want = {i for i, x in enumerate(c) if (x - mu) ** 2 > 4 * var}
    assert set(out["event_id"]) == want and len(want) > 0


def test_kcenter_duplicate_vectors_match_golden(ray_session):
    """Exact-duplicate embeddings are the tie-dense worst case: the
    distributed arm and the sequential golden must pick identical ids in
    identical order (smallest-id tie-break + selected-point exclusion)."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.golden import kcenter_golden
    from knowledge_graph_construction_ray.query.relational import (
        embeddings_kcenter_sample,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(size=(6, 8)).astype(np.float32)
    vecs = [base[i % 6] for i in range(30)]  # every vector ×5 duplicated
    df = pd.DataFrame(
        {
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
            "label": np.zeros(30, dtype=np.int32),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "embeddings.parquet"))
        got = embeddings_kcenter_sample(d, k=10)
        want = kcenter_golden(d, k=10)
    pd.testing.assert_frame_equal(got, want)


def test_props_extract_drops_unparseable_rows(ray_session):
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        events_props_extract,
    )

    df = pd.DataFrame(
        {
            "event_id": range(5),
            "user_id": 0,
            "event_type": "x",
            "value": 0.0,
            "ts": pd.to_datetime("2024-01-01"),
            "props": ['{"k": 7}', '{"k": -3}', "not json", '{"other": 1}', '{"k": 7}'],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = events_props_extract(d)
    want = pd.DataFrame({"k": [-3, 7], "n": [1, 2]})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


# ---------------------------------------------------------------------------
# Incremental MinHash index
# ---------------------------------------------------------------------------


def test_minhash_index_incremental_equals_full_restricted(ray_session):
    """Index half the corpus, ingest the other half: the incremental
    verified pairs equal the full-corpus pipeline's pairs restricted to
    those touching a new doc (old×old never regenerated, new×new and
    old×new complete)."""
    import tempfile

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        minhash_candidate_pairs,
        query_minhash_index,
        verify_pairs_distributed,
    )

    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    old = docs[docs["doc_id"] % 2 == 0].reset_index(drop=True)
    new = docs[docs["doc_id"] % 2 == 1].reset_index(drop=True)
    TH = 0.2  # low threshold so the synthetic corpus yields real pairs

    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d)
        got = query_minhash_index(
            rd.from_pandas(new), d, rd.from_pandas(old),
            threshold=TH, num_partitions=4,
        )

    full = verify_pairs_distributed(
        minhash_candidate_pairs(rd.from_pandas(docs)),
        rd.from_pandas(docs),
        TH,
        num_partitions=4,
    ).to_pandas()
    new_ids = set(new["doc_id"])
    want = (
        full[full["a"].isin(new_ids) | full["b"].isin(new_ids)]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(want) > 0, "test corpus must produce pairs at this threshold"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_index_small_batch_prunes_buckets(ray_session):
    import tempfile

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    old = docs.iloc[:-2]
    tiny = docs.iloc[-2:]  # 2 docs × 16 bands ≤ 32 of 64 buckets
    stats: dict = {}
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d)
        query_minhash_index(
            rd.from_pandas(tiny), d, rd.from_pandas(old),
            threshold=0.2, num_partitions=4, stats_out=stats,
        )
    assert stats["occupied_buckets"] <= 32


def test_activity_islands_crafted_runs(ray_session):
    """Crafted day patterns: [1,2,3] one island; [1,3,4] two; single days
    are length-1 islands; islands never overlap per user."""
    import os
    import tempfile

    from knowledge_graph_construction_ray.query.relational import (
        events_activity_islands,
    )

    base = pd.Timestamp("2024-01-01")
    rows = []
    for u, days in [(1, [0, 1, 2]), (2, [0, 2, 3]), (3, [5])]:
        for d in days:
            rows.append((u, base + pd.Timedelta(days=d)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = range(len(df))
    df["event_type"] = "x"
    df["value"] = 0.0
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = events_activity_islands(d)
    got = [
        (int(r.user_id), int(r.end_day - r.start_day + 1), int(r.n_days))
        for r in out.itertuples()
    ]
    assert got == [(1, 3, 3), (2, 1, 1), (2, 2, 2), (3, 1, 1)]
    # island length always equals day span (no holes inside an island)
    assert ((out["end_day"] - out["start_day"] + 1) == out["n_days"]).all()


def test_minhash_index_sparse_one_doc_corpus(ray_session):
    """Review repro: 1-doc corpus, 2-doc batch, num_partitions=2 — the
    sparse case where join partitions receive only empty blocks; must
    find the single planted near-dup pair, not crash."""
    import tempfile

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    old = pd.DataFrame(
        {"doc_id": [0],
         "text": ["the quick brown fox jumps over the lazy dog again and again today"]}
    )
    new = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again tonight",
                "completely different words here nothing shared at all whatsoever ok",
            ],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d)
        out = query_minhash_index(
            rd.from_pandas(new), d, rd.from_pandas(old),
            threshold=0.2, num_partitions=2,
        )
    assert list(zip(out["a"], out["b"])) == [(0, 10)]


def test_minhash_index_missing_path_raises(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import query_minhash_index

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x y z"]}))
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="minhash index not found"):
        query_minhash_index(docs, "/tmp/kg_no_such_index_dir", docs)


def test_minhash_index_meta_contract(ray_session):
    """build records num_buckets in meta.json; querying with a different
    value raises instead of silently reading the wrong bucket dirs, and
    omitting it recovers the built layout from the metadata."""
    import json
    import tempfile

    import pytest as _pytest
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    old = pd.DataFrame(
        {"doc_id": [0, 2], "text": ["a b c d e f", "p q r s t u"]}
    )
    new = pd.DataFrame({"doc_id": [1], "text": ["a b c d e f"]})
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d, num_buckets=16)
        assert json.load(open(f"{d}/meta.json"))["num_buckets"] == 16
        with _pytest.raises(ValueError, match="built with num_buckets=16"):
            query_minhash_index(
                rd.from_pandas(new), d, rd.from_pandas(old), num_buckets=64
            )
        # no num_buckets given → layout recovered from meta.json
        out = query_minhash_index(
            rd.from_pandas(new), d, rd.from_pandas(old),
            threshold=0.5, num_partitions=2,
        )
        assert list(zip(out["a"], out["b"])) == [(0, 1)]


def test_minhash_index_rebuild_in_place_raises(ray_session):
    """Parquet writes append — a rebuild over a non-empty bands/ dir
    must fail loudly rather than mix stale band rows into queries."""
    import tempfile

    import pytest as _pytest
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import build_minhash_index

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e f"]})
    )
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(docs, d)
        with _pytest.raises(FileExistsError, match="already exists"):
            build_minhash_index(docs, d)


def test_minhash_index_reingested_id_raises(ray_session):
    """A new batch re-using an already-indexed doc_id would have its
    pairs silently swallowed by the a != b filter — must raise."""
    import tempfile

    import pytest as _pytest
    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    old = pd.DataFrame({"doc_id": [7], "text": ["a b c d e f"]})
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d)
        with _pytest.raises(Exception, match="disjoint"):
            query_minhash_index(
                rd.from_pandas(old), d, rd.from_pandas(old), threshold=0.2
            )


def test_minhash_index_string_doc_ids(ray_session):
    """The index path must accept the repo's '{kind}:{idx}' STRING
    doc_ids end-to-end (a review pass caught an int64 cast regression
    in the candidate-id broadcast)."""
    import tempfile

    import ray.data as rd

    from knowledge_graph_construction_ray.stages.dedupe import (
        build_minhash_index,
        query_minhash_index,
    )

    old = pd.DataFrame(
        {
            "doc_id": ["disease:000001", "disease:000002"],
            "text": ["a b c d e f", "p q r s t u"],
        }
    )
    new = pd.DataFrame(
        {"doc_id": ["disease:000009"], "text": ["a b c d e f"]}
    )
    with tempfile.TemporaryDirectory() as d:
        build_minhash_index(rd.from_pandas(old), d)
        out = query_minhash_index(
            rd.from_pandas(new), d, rd.from_pandas(old),
            threshold=0.5, num_partitions=2,
        )
    assert list(zip(out["a"], out["b"])) == [
        ("disease:000001", "disease:000009")
    ]
