"""Round-5 operators: asymmetric n-gram containment join, hybrid RRF
retrieval fusion, and RFM quartile segmentation.

Three gates per operator, following the repo's independence ratchet:
(1) brute-force / hand-computed parity on crafted corpora (independent
single-process arm), (2) differential fuzzing against the oracle SQL on
seeded random tables, (3) the structural edge cases (asymmetric catch,
hot-list refusal, sparse path, probe-prefix lemma)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from knowledge_graph_construction_ray.query.relational import QUERIES
from knowledge_graph_construction_ray.stages.dedupe import (
    _containment_rows,
    ngram_containment_dedup,
    ngram_jaccard_dedup,
    word_ngrams,
)


# ---------------------------------------------------------------------------
# shared differential harness (same discipline as test_newops_differential)
# ---------------------------------------------------------------------------


def _run(tmp_path, qname: str, tables: dict[str, pd.DataFrame]) -> None:
    for t, df in tables.items():
        df.to_parquet(os.path.join(tmp_path, f"{t}.parquet"), index=False)
    fn, sql = QUERIES[qname]
    got = fn(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    exp = con.execute(sql).df().reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    got = got[sorted(got.columns)].astype(str)
    exp = exp[sorted(got.columns)].astype(str)
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


# ---------------------------------------------------------------------------
# n-gram containment
# ---------------------------------------------------------------------------


def _containment_corpus() -> pd.DataFrame:
    """Quote-containment pairs + near-dup clusters + the shingle edge
    cases (short docs, empties)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    rows: list[tuple] = []
    doc_id = 0
    # 4 quote-containments: short doc fully embedded in a 4x longer one
    for _ in range(4):
        quote = list(rng.choice(vocab, size=12))
        longer = (
            list(rng.choice(vocab, size=20))
            + quote
            + list(rng.choice(vocab, size=20))
        )
        rows.append((doc_id, " ".join(quote)))
        rows.append((doc_id + 1, " ".join(longer)))
        doc_id += 2
    # 3 clusters of perturbed near-identical copies (symmetric near-dups)
    for _ in range(3):
        base = list(rng.choice(vocab, size=25))
        for k in range(3):
            toks = list(base)
            for _ in range(k):
                toks[int(rng.integers(len(toks)))] = str(rng.choice(vocab))
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
    for _ in range(15):  # unrelated docs
        rows.append((doc_id, " ".join(rng.choice(vocab, size=22))))
        doc_id += 1
    rows += [
        (doc_id, "alpha beta"),
        (doc_id + 1, "alpha beta gamma delta epsilon zeta eta theta"),
        (doc_id + 2, ""),
        (doc_id + 3, "   "),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute_containment(df: pd.DataFrame, num: int, den: int) -> pd.DataFrame:
    g = {d: word_ngrams(t) for d, t in zip(df["doc_id"], df["text"])}
    ids = sorted(g)
    rows = []
    for i in range(len(ids) - 1):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ga, gb = g[a], g[b]
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            small = min(len(ga), len(gb))
            if inter * den >= num * small:
                rows.append((a, b, inter, small, len(ga), len(gb)))
    return pd.DataFrame(
        rows, columns=["a", "b", "inter_n", "small_n", "na", "nb"]
    )


@pytest.mark.parametrize("threshold", [(4, 5), (1, 1)])
def test_containment_matches_bruteforce(ray_session, threshold):
    df = _containment_corpus()
    ds = rd.from_pandas(df).repartition(7)
    out = (
        ngram_containment_dedup(
            ds, threshold=threshold, num_partitions=4, sparse_safe=True
        )
        .to_pandas()
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = _brute_containment(df, *threshold)
    assert len(exp) > 0, "fixture must contain containment pairs"
    pd.testing.assert_frame_equal(out, exp.astype("int64"))


def test_containment_catches_what_jaccard_misses(ray_session):
    """The operator's reason to exist: a 12-token quote inside a 52-token
    doc has containment ≈ 1 but Jaccard ≈ 0.2 — the containment join must
    emit the pair, the Jaccard join (threshold 1/2) must not."""
    df = _containment_corpus()
    ds = rd.from_pandas(df).repartition(5)
    cont = (
        ngram_containment_dedup(ds, threshold=(4, 5), sparse_safe=True)
        .to_pandas()
        .astype("int64")
    )
    jac = (
        ngram_jaccard_dedup(ds, threshold=(1, 2), sparse_safe=True)
        .to_pandas()
        .astype("int64")
    )
    cont_pairs = set(zip(cont["a"], cont["b"]))
    jac_pairs = set(zip(jac["a"], jac["b"]))
    quote_pairs = {(0, 1), (2, 3), (4, 5), (6, 7)}  # the 4 planted embeds
    found_quotes = quote_pairs & cont_pairs
    assert found_quotes, "containment must catch planted quote-inclusions"
    assert not (found_quotes & jac_pairs), (
        "planted asymmetric inclusions should be invisible to Jaccard 1/2"
    )
    # symmetric near-dups are caught by both
    assert jac_pairs & cont_pairs


def test_containment_probe_rows_lemma():
    """is_probe flags exactly the n - ceil(t·n) + 1 smallest hashes of
    each doc's distinct-shingle set (the probe-prefix of the SSJoin
    asymmetry); every distinct shingle is present as an index row."""
    df = _containment_corpus()
    rows = _containment_rows(df, 4, 5)
    for doc_id, g in rows.groupby("doc_id"):
        n = int(g["set_size"].iloc[0])
        assert len(g) == n  # full set indexed
        probes = g[g["is_probe"] == 1]
        ceil_tn = -((-4 * n) // 5)
        assert len(probes) == n - ceil_tn + 1
        # probes are the smallest hashes under the global (uint64) order
        hashes = g["shingle"].to_numpy().view(np.uint64)
        probe_hashes = probes["shingle"].to_numpy().view(np.uint64)
        assert set(probe_hashes) == set(np.sort(hashes)[: len(probes)])


def test_containment_hot_list_refusal(ray_session):
    df = pd.DataFrame(
        {"doc_id": range(50), "text": ["same boilerplate trigram here"] * 50}
    )
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="max_list"):
        ngram_containment_dedup(ds, max_list=10, sparse_safe=True).to_pandas()


def test_containment_empty_sparse_path(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [" ".join(f"u{i}_{j}" for j in range(10)) for i in range(8)],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = ngram_containment_dedup(ds, sparse_safe=True)
    assert out.schema().names == ["a", "b", "inter_n", "small_n", "na", "nb"]
    assert out.count() == 0


def test_containment_threshold_validation(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b c"]}))
    with pytest.raises(ValueError, match="rational"):
        ngram_containment_dedup(ds, threshold=(3, 2))


def test_containment_apply_drops_contained_side(ray_session, tmp_path):
    """The removal policy keeps the HOST of every quote-inclusion and
    drops the contained quote; mutual near-identicals keep the min id."""
    fn, _sql = QUERIES["dedup_containment_apply"]
    df = _containment_corpus()
    df.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    survivors = set(fn(str(tmp_path))["doc_id"])
    for q, h in ((0, 1), (2, 3), (4, 5), (6, 7)):  # planted (quote, host)
        assert h in survivors and q not in survivors


@pytest.mark.parametrize("seed", [111, 112])
def test_containment_apply_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(60)]
    rows: list[tuple] = []
    doc_id = 0
    for _ in range(3):
        quote = list(rng.choice(vocab, size=int(rng.integers(8, 15))))
        host = (
            list(rng.choice(vocab, size=int(rng.integers(10, 25))))
            + quote
            + list(rng.choice(vocab, size=int(rng.integers(10, 25))))
        )
        rows.append((doc_id, " ".join(quote)))
        rows.append((doc_id + 1, " ".join(host)))
        doc_id += 2
    for _ in range(int(rng.integers(15, 40))):
        rows.append(
            (doc_id, " ".join(rng.choice(vocab, size=int(rng.integers(3, 25)))))
        )
        doc_id += 1
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    _run(tmp_path, "dedup_containment_apply", {"documents": docs})


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_containment_differential(ray_session, tmp_path, seed):
    """Random corpora with planted inclusions vs the all-pairs SQL."""
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(60)]
    rows: list[tuple] = []
    doc_id = 0
    for _ in range(int(rng.integers(2, 5))):
        quote = list(rng.choice(vocab, size=int(rng.integers(8, 15))))
        host = (
            list(rng.choice(vocab, size=int(rng.integers(10, 30))))
            + quote
            + list(rng.choice(vocab, size=int(rng.integers(10, 30))))
        )
        rows.append((doc_id, " ".join(quote)))
        rows.append((doc_id + 1, " ".join(host)))
        doc_id += 2
    for _ in range(int(rng.integers(20, 60))):
        rows.append(
            (doc_id, " ".join(rng.choice(vocab, size=int(rng.integers(3, 30)))))
        )
        doc_id += 1
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    _run(tmp_path, "dedup_containment", {"documents": docs})


# ---------------------------------------------------------------------------
# hybrid RRF retrieval fusion
# ---------------------------------------------------------------------------


def _embeddings(rng, n: int, dim: int = 16) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [
                rng.standard_normal(dim).astype(np.float32) for _ in range(n)
            ],
            "label": rng.integers(0, 4, size=n).astype(np.int32),
        }
    )


def _query_docs(rng, n: int) -> pd.DataFrame:
    """Docs whose texts contain the BM25 query terms with random
    multiplicity + filler — exercises both fused arms."""
    terms = ["join", "filter", "scan"]
    texts = []
    for _ in range(n):
        toks = list(rng.choice([f"f{i}" for i in range(30)],
                               size=int(rng.integers(3, 40))))
        for t in terms:
            toks += [t] * int(rng.integers(0, 4))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": texts}
    )


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_hybrid_rrf_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 120))
    _run(
        tmp_path,
        "hybrid_search_rrf",
        {"documents": _query_docs(rng, n), "embeddings": _embeddings(rng, n)},
    )


def test_hybrid_rrf_both_arm_winner(ray_session, tmp_path):
    """Hand-computable fusion: the doc ranked 1 in BOTH arms must lead
    with exactly 2·(10^9 // 61); a doc absent from both pools is absent."""
    fn, _sql = QUERIES["hybrid_search_rrf"]
    n = 8
    # doc 3 dominates BM25 (most query-term hits) AND the vector arm
    texts = ["filler only"] * n
    texts[3] = "join join join filter filter scan scan scan scan"
    texts[5] = "join filter"
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    dim = 8
    emb = np.zeros((n, dim), dtype=np.float32)
    emb[0, 0] = 1.0  # the query vector (vec_id 0)
    emb[3, 0] = 2.0  # highest dot with the query
    emb[5, 0] = 0.5
    embeddings = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(emb),
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    embeddings.to_parquet(
        os.path.join(tmp_path, "embeddings.parquet"), index=False
    )
    out = fn(str(tmp_path))
    assert int(out["doc_id"].iloc[0]) == 3
    assert int(out["rrf_score"].iloc[0]) == 2 * (10**9 // 61)
    # docs 1,2,4,6,7 have zero dot and no query terms: vector arm still
    # ranks them (dot 0 ties broken by id), BM25 arm does not
    assert 3 in set(out["doc_id"])


def test_hybrid_rrf_vector_only_when_no_lexical_hits(ray_session, tmp_path):
    """No doc contains a query term → the BM25 arm is empty and the
    fusion degrades to the vector ranking alone."""
    fn, _sql = QUERIES["hybrid_search_rrf"]
    n = 6
    docs = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": ["nothing here"] * n}
    )
    emb = np.zeros((n, 4), dtype=np.float32)
    emb[0, 0] = 1.0
    emb[2, 0] = 3.0  # top dot
    emb[4, 0] = 2.0
    embeddings = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(emb),
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    embeddings.to_parquet(
        os.path.join(tmp_path, "embeddings.parquet"), index=False
    )
    out = fn(str(tmp_path))
    assert list(out["doc_id"][:3]) == [2, 4, 0]  # pure vector order
    assert int(out["rrf_score"].iloc[0]) == 10**9 // 61


def test_hybrid_rrf_missing_query_vector_raises(ray_session, tmp_path):
    from knowledge_graph_construction_ray.query.relational import (
        hybrid_search_rrf,
    )

    embeddings = pd.DataFrame(
        {
            "vec_id": np.arange(3, 6, dtype=np.int64),  # no vec_id 0
            "embedding": [np.ones(4, dtype=np.float32)] * 3,
            "label": np.zeros(3, dtype=np.int32),
        }
    )
    docs = pd.DataFrame({"doc_id": [3], "text": ["join"]})
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    embeddings.to_parquet(
        os.path.join(tmp_path, "embeddings.parquet"), index=False
    )
    with pytest.raises(ValueError, match="vec_id=0"):
        hybrid_search_rrf(str(tmp_path))


def test_kg_mention_cooccurrence_hand_computed(ray_session, tmp_path):
    """Planted co-mentions: 3 docs with (customer, window), 1 with
    (stream, vector, customer), 1 with only one entity, 1 with none."""
    fn, _sql = QUERIES["kg_mention_cooccurrence"]
    texts = [
        "the customer opened a window",
        "customer window again",
        "window for the customers",  # substring match still 'customer'
        "stream of vector data for a customer",
        "just a stream",
        "nothing relevant",
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    out = fn(str(tmp_path))
    got = {
        (r.name_a, r.name_b): int(r.n_docs) for r in out.itertuples()
    }
    assert got == {
        ("customer", "window"): 3,
        ("customer", "stream"): 1,
        ("customer", "vector"): 1,
        ("stream", "vector"): 1,
    }


@pytest.mark.parametrize("seed", [121, 122])
def test_kg_mention_cooccurrence_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    ents = ["customer", "window", "stream", "vector"]
    filler = [f"f{i}" for i in range(20)]
    texts = []
    for _ in range(int(rng.integers(30, 120))):
        toks = list(rng.choice(filler, size=int(rng.integers(2, 10))))
        for e in ents:
            if rng.random() < 0.3:
                toks.append(e)
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    _run(tmp_path, "kg_mention_cooccurrence", {"documents": docs})


@pytest.mark.parametrize("seed", [131, 132, 133])
def test_growth_accounting_differential(ray_session, tmp_path, seed):
    """SPARSE user activity (random weeks with gaps) — the new/retained/
    resurrected/churned state machine vs the SQL self-join oracle."""
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for u in range(int(rng.integers(5, 30))):
        weeks = np.unique(rng.integers(0, 12, size=int(rng.integers(1, 8))))
        for w in weeks:
            for _ in range(int(rng.integers(1, 3))):
                rows.append(
                    (
                        eid,
                        base + pd.Timedelta(weeks=int(w))
                        + pd.Timedelta(hours=int(rng.integers(0, 100))),
                        u,
                        "view",
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    _run(tmp_path, "events_growth_accounting", {"events": events})


def test_growth_accounting_hand_computed(ray_session, tmp_path):
    """One user active weeks 0,1,3 → new@0, retained@1, churn@2 (dropped:
    no activity that week from anyone? week 2 has another user, so kept),
    resurrected@3, churn@4 (dropped — no active week 4)."""
    fn, _sql = QUERIES["events_growth_accounting"]
    base = pd.Timestamp("2024-01-01")
    rows = [
        (0, base, 1, "view", 1.0, "{}"),                            # u1 wk0
        (1, base + pd.Timedelta(weeks=1), 1, "view", 1.0, "{}"),    # u1 wk1
        (2, base + pd.Timedelta(weeks=3), 1, "view", 1.0, "{}"),    # u1 wk3
        (3, base + pd.Timedelta(weeks=2), 2, "view", 1.0, "{}"),    # u2 wk2
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    events.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = fn(str(tmp_path))
    w0 = int(out["week"].min())
    got = {
        int(r.week) - w0: (
            int(r.n_new), int(r.n_retained), int(r.n_resurrected),
            int(r.n_churned),
        )
        for r in out.itertuples()
    }
    assert got == {
        0: (1, 0, 0, 0),          # u1 new
        1: (0, 1, 0, 0),          # u1 retained
        2: (1, 0, 0, 1),          # u2 new; u1 churned out of wk1
        3: (0, 0, 1, 1),          # u1 resurrected; u2 churned out of wk2
    }


@pytest.mark.parametrize("seed", [141, 142])
def test_parts_hhi_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 500))
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": rng.integers(0, 30, size=n).astype(np.int64),
            "l_suppkey": rng.integers(0, 8, size=n).astype(np.int64),
        }
    )
    _run(tmp_path, "parts_supplier_hhi", {"lineitem": li})


def test_parts_hhi_hand_computed(ray_session, tmp_path):
    """Monopoly part scores exactly 10^6; an even 2-way split 500000;
    a 3/1 split (9+1)·10^6 // 16 = 625000."""
    fn, _sql = QUERIES["parts_supplier_hhi"]
    rows = (
        [(i, 1, 5) for i in range(4)]               # part 1: one supplier
        + [(10, 2, 5), (11, 2, 6)]                  # part 2: 1/1 split
        + [(20, 3, 5)] * 3 + [(23, 3, 6)]           # part 3: 3/1 split
    )
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_suppkey"])
    li.astype("int64").to_parquet(
        os.path.join(tmp_path, "lineitem.parquet"), index=False
    )
    out = fn(str(tmp_path)).set_index("p_partkey")
    assert int(out.loc[1, "hhi_ppm"]) == 1_000_000
    assert int(out.loc[2, "hhi_ppm"]) == 500_000
    assert int(out.loc[3, "hhi_ppm"]) == 625_000


def test_running_sum_hypothesis(ray_session):
    """Property: for ANY int values and any partitioning, the cum_col
    emission equals the sequential prefix sum in key order."""
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from knowledge_graph_construction_ray.pipelines.curation import (
        assign_sequential_ids,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-10**6, max_value=10**6),
            min_size=1, max_size=300,
        ),
        nparts=st.integers(min_value=1, max_value=7),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(vals, nparts, seed):
        rng = np.random.default_rng(seed)
        n = len(vals)
        df = pd.DataFrame(
            {
                "key": rng.permutation(n).astype(np.int64),
                "val": np.asarray(vals, dtype=np.int64),
            }
        )
        out = (
            assign_sequential_ids(
                rd.from_pandas(df).repartition(nparts),
                ["key"], "_rank", sum_col="val", cum_col="cum",
            )
            .to_pandas()
            .sort_values("_rank")
        )
        exp = np.cumsum(
            df.sort_values("key")["val"].to_numpy(np.int64)
        )
        assert (out["cum"].to_numpy(np.int64) == exp).all()

    check()


def test_novelty_profile_hand_computed(ray_session, tmp_path):
    """doc0 introduces 2 grams; doc1 repeats doc0 verbatim (0 new);
    doc2 shares a suffix with doc0 and adds one new gram."""
    fn, _sql = QUERIES["docs_novelty_profile"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "a b c d",       # grams: "a b c", "b c d"  -> 2 new
                "a b c d",       # same grams                -> 0 new
                "x b c d",       # "x b c" new, "b c d" seen -> 1 new
            ],
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    out = fn(str(tmp_path)).set_index("doc_id")
    assert (int(out.loc[0, "n_grams"]), int(out.loc[0, "n_new"])) == (2, 2)
    assert (int(out.loc[1, "n_grams"]), int(out.loc[1, "n_new"])) == (2, 0)
    assert (int(out.loc[2, "n_grams"]), int(out.loc[2, "n_new"])) == (2, 1)


@pytest.mark.parametrize("seed", [151, 152])
def test_novelty_profile_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 20))))
        for _ in range(int(rng.integers(30, 150)))
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    _run(tmp_path, "docs_novelty_profile", {"documents": docs})


def test_round5_ops_zero_row_tables(ray_session, tmp_path):
    """Zero-row sources must yield typed empty frames, not KeyErrors or
    schema-less join poison — the repo-wide empty-result trap, pinned
    for every round-5 operator."""
    pd.DataFrame(
        {
            "event_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "user_id": pd.Series(dtype="int64"),
            "event_type": pd.Series(dtype="object"),
            "value": pd.Series(dtype="float64"),
            "props": pd.Series(dtype="object"),
        }
    ).to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    pd.DataFrame(
        {
            "l_orderkey": pd.Series(dtype="int64"),
            "l_partkey": pd.Series(dtype="int64"),
            "l_suppkey": pd.Series(dtype="int64"),
        }
    ).to_parquet(os.path.join(tmp_path, "lineitem.parquet"), index=False)
    pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype="object")}
    ).to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    expected_cols = {
        "events_growth_accounting": [
            "week", "n_new", "n_retained", "n_resurrected", "n_churned"],
        "parts_supplier_hhi": ["p_partkey", "hhi_ppm", "n_shipments"],
        "docs_novelty_profile": ["doc_id", "n_grams", "n_new"],
        "events_rfm_segments": [
            "user_id", "r_tile", "f_tile", "m_tile", "segment"],
        "events_cohort_ltv": [
            "cohort_week", "age_weeks", "n_users", "cum_cents",
            "cum_cents_per_user"],
        "suppliers_full_coverage": ["s_suppkey", "n_covered"],
        "graph_common_neighbors": ["u", "w", "cn"],
        "dedup_containment": ["a", "b", "inter_n", "small_n", "na", "nb"],
        "dedup_containment_apply": ["doc_id"],
    }
    for name, cols in expected_cols.items():
        out = QUERIES[name][0](str(tmp_path))
        assert len(out) == 0, name
        assert list(out.columns) == cols, name


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def _rfm_events(rng, n: int) -> pd.DataFrame:
    users = np.where(
        rng.random(n) < 0.3, 7, rng.integers(0, max(2, n // 6), size=n)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, size=n), unit="s"),
            "user_id": users,
            "event_type": rng.choice(["view", "click", "buy"], size=n),
            "value": np.round(rng.random(n) * 100, 3),
            "props": rng.choice(["{}", '{"a":1}'], size=n),
        }
    )


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_rfm_segments_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 400))
    _run(tmp_path, "events_rfm_segments", {"events": _rfm_events(rng, n)})


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_cohort_ltv_differential(ray_session, tmp_path, seed):
    """First-event times spread over ~12 weeks → multiple cohorts and a
    full (cohort, age) matrix, vs the SQL window oracle."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 500))
    events = _rfm_events(rng, n)
    events["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 86400 * 7 * 12, size=n), unit="s"
    )
    _run(tmp_path, "events_cohort_ltv", {"events": events})


def test_cohort_ltv_hand_computed(ray_session, tmp_path):
    """Two users in different cohorts, hand-traced cumulative cents."""
    fn, _sql = QUERIES["events_cohort_ltv"]
    base = pd.Timestamp("2024-01-01")  # epoch week 2817 (19723 days // 7)
    rows = [
        # user 0: cohort week W, spends 1.00 at age 0 and 2.50 at age 1
        (0, base, 0, "buy", 1.00, "{}"),
        (1, base + pd.Timedelta(days=7), 0, "buy", 2.50, "{}"),
        # user 1: cohort week W+2, spends 0.75 at age 0
        (2, base + pd.Timedelta(days=14), 1, "buy", 0.75, "{}"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    events.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = fn(str(tmp_path))
    w0 = int(out["cohort_week"].min())
    got = {
        (int(r.cohort_week) - w0, int(r.age_weeks)): (
            int(r.n_users), int(r.cum_cents), int(r.cum_cents_per_user)
        )
        for r in out.itertuples()
    }
    # floor(1.00*100)=100 (exact), floor(2.50*100)=250, floor(0.75*100)=75
    # (0.75*100 = 75.0000000000000014 in float64? 0.75 is exact binary, so 75)
    assert got == {
        (0, 0): (1, 100, 100),
        (0, 1): (1, 350, 350),
        (2, 0): (1, 75, 75),
    }


@pytest.mark.parametrize("seed", [61, 62])
def test_knn_graph_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 150))
    emb = _embeddings(rng, n)
    emb.to_parquet(os.path.join(tmp_path, "embeddings.parquet"), index=False)
    _run(tmp_path, "embeddings_knn_graph", {"embeddings": emb})


def test_knn_graph_tiebreak_and_self_mask(ray_session, tmp_path):
    """Identical vectors → all dots tie → neighbors must be the LOWEST
    other ids in order (stable tie-break), never the row itself — also
    regression-pins the -int64.min overflow that once ranked the masked
    self-edge first."""
    fn, _sql = QUERIES["embeddings_knn_graph"]
    n, dim = 6, 4
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [np.ones(dim, dtype=np.float32)] * n,
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    emb.to_parquet(os.path.join(tmp_path, "embeddings.parquet"), index=False)
    out = fn(str(tmp_path))
    for v in range(n):
        nbrs = list(out[out["vec_id"] == v]["nbr_id"])
        expected = [i for i in range(n) if i != v][:3]
        assert nbrs == expected, f"vec {v}: {nbrs} != {expected}"


def test_knn_graph_size_refusal(monkeypatch, tmp_path):
    """The exact arm must refuse corpora past the broadcast budget."""
    import pyarrow.parquet as pq_mod

    from knowledge_graph_construction_ray.query import relational

    emb = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [np.ones(2, dtype=np.float32)] * 4,
            "label": np.zeros(4, dtype=np.int32),
        }
    )
    emb.to_parquet(os.path.join(tmp_path, "embeddings.parquet"), index=False)

    class FakeMeta:
        num_rows = 300_000

    real = pq_mod.read_metadata
    monkeypatch.setattr(
        "pyarrow.parquet.read_metadata", lambda p, *a, **k: FakeMeta()
    )
    try:
        with pytest.raises(ValueError, match="refuses"):
            relational.embeddings_knn_graph(str(tmp_path))
    finally:
        monkeypatch.setattr("pyarrow.parquet.read_metadata", real)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_common_neighbors_differential(ray_session, tmp_path, seed):
    """Random co-purchase graphs (orders of 1-6 parts, skewed part
    popularity) vs the SQL wedge-count + anti-join oracle."""
    rng = np.random.default_rng(seed)
    n_orders = int(rng.integers(20, 120))
    rows = []
    for o in range(n_orders):
        parts = rng.choice(
            np.arange(30) ** 2 % 37, size=int(rng.integers(1, 7)), replace=True
        )
        for p in parts:
            rows.append((o, int(p)))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype("int64")
    # the query only reads these two columns; the view needs no others
    _run(tmp_path, "graph_common_neighbors", {"lineitem": li})


def test_common_neighbors_hand_computed(ray_session, tmp_path):
    """Path graph 1-2-3 (two 2-part orders): the only non-adjacent pair
    with a shared neighbor is (1, 3) through 2."""
    fn, _sql = QUERIES["graph_common_neighbors"]
    li = pd.DataFrame(
        {"l_orderkey": [10, 10, 20, 20], "l_partkey": [1, 2, 2, 3]}
    ).astype("int64")
    li.to_parquet(os.path.join(tmp_path, "lineitem.parquet"), index=False)
    out = fn(str(tmp_path))
    assert out.to_dict("records") == [{"u": 1, "w": 3, "cn": 1}]


def test_common_neighbors_arm_parity(ray_session, tmp_path):
    """The size-dispatched local packed-key kernel and the distributed
    wedge/anti-join plan must produce the identical top-k."""
    from knowledge_graph_construction_ray.query.relational import (
        graph_common_neighbors,
    )

    rng = np.random.default_rng(99)
    rows = []
    for o in range(80):
        for p in rng.choice(25, size=int(rng.integers(2, 6)), replace=False):
            rows.append((o, int(p)))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype("int64")
    li.to_parquet(os.path.join(tmp_path, "lineitem.parquet"), index=False)
    loc = graph_common_neighbors(str(tmp_path)).reset_index(drop=True)
    dist = graph_common_neighbors(
        str(tmp_path), force_distributed=True
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(loc, dist)
    assert len(loc) > 0


def test_common_neighbors_hub_refusal(ray_session, tmp_path):
    """A hub co-purchased with 30 parts must trip max_degree=10."""
    from knowledge_graph_construction_ray.query.relational import (
        graph_common_neighbors,
    )

    rows = [(o, p) for o, p in enumerate(range(1, 31)) for p in (0, p)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype("int64")
    li.to_parquet(os.path.join(tmp_path, "lineitem.parquet"), index=False)
    with pytest.raises(Exception, match="max_degree"):
        graph_common_neighbors(str(tmp_path), max_degree=10)


@pytest.mark.parametrize("seed", [81, 82, 83])
def test_abc_classes_differential(ray_session, tmp_path, seed):
    """Random orders with skewed revenue (one whale customer) vs the SQL
    window-cumsum oracle."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 400))
    cust = np.where(
        rng.random(n) < 0.25, 3, rng.integers(0, max(2, n // 5), size=n)
    ).astype(np.int64)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": cust,
            "o_totalprice": np.round(rng.random(n) * 10_000, 2),
        }
    )
    _run(tmp_path, "customers_abc_classes", {"orders": orders})


def test_abc_classes_hand_computed(ray_session, tmp_path):
    """4 customers with revenue 50/30/15/5 (total 100): running shares
    50/80/95/100 → classes A, A, B, C under the ≤80%/≤95% boundaries."""
    fn, _sql = QUERIES["customers_abc_classes"]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
            "o_totalprice": [50.0, 30.0, 15.0, 5.0],
        }
    )
    orders.to_parquet(os.path.join(tmp_path, "orders.parquet"), index=False)
    out = fn(str(tmp_path)).set_index("c_custkey")
    assert out.loc[1, "abc"] == "A" and int(out.loc[1, "cum_cents"]) == 5000
    assert out.loc[2, "abc"] == "A" and int(out.loc[2, "cum_cents"]) == 8000
    assert out.loc[3, "abc"] == "B" and int(out.loc[3, "cum_cents"]) == 9500
    assert out.loc[4, "abc"] == "C" and int(out.loc[4, "cum_cents"]) == 10000


def test_sequential_ids_running_sum_property(ray_session):
    """The new sum_col/cum_col emission of assign_sequential_ids: the
    running sum in rank order must equal the sequential prefix sum, and
    the last value the global total — at a row count that spans many
    range bins and hash buckets."""
    import ray.data as rd

    from knowledge_graph_construction_ray.pipelines.curation import (
        assign_sequential_ids,
    )

    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame(
        {
            "key": rng.permutation(n).astype(np.int64),
            "val": rng.integers(-100, 100, size=n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    out = (
        assign_sequential_ids(ds, ["key"], "_rank", sum_col="val",
                              cum_col="cum")
        .to_pandas()
        .sort_values("_rank")
        .reset_index(drop=True)
    )
    exp = df.sort_values("key").reset_index(drop=True)
    assert (out["cum"].to_numpy() == np.cumsum(exp["val"].to_numpy())).all()
    assert int(out["cum"].iloc[-1]) == int(df["val"].sum())
    with pytest.raises(ValueError, match="together"):
        assign_sequential_ids(ds, ["key"], "_rank", sum_col="val")


@pytest.mark.parametrize("seed", [91, 92, 93])
def test_full_coverage_differential(ray_session, tmp_path, seed):
    """Relational division on random ship tables vs the HAVING-count SQL."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 600))
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": rng.integers(0, 25, size=n).astype(np.int64),
            "l_suppkey": rng.integers(0, 12, size=n).astype(np.int64),
        }
    )
    _run(tmp_path, "suppliers_full_coverage", {"lineitem": li})


def test_full_coverage_hand_computed(ray_session, tmp_path):
    """Parts 1,2,3 are the top-3 by ship count; supplier 7 ships all
    three, supplier 8 only two → only 7 divides."""
    fn, _sql = QUERIES["suppliers_full_coverage"]
    rows = []
    oid = 0
    for p, reps in ((1, 5), (2, 4), (3, 3), (4, 1)):
        for _ in range(reps):
            rows.append((oid, p, 7))  # supplier 7 ships everything
            oid += 1
    rows += [(oid, 1, 8), (oid + 1, 2, 8)]  # supplier 8 misses part 3
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_suppkey"])
    li.astype("int64").to_parquet(
        os.path.join(tmp_path, "lineitem.parquet"), index=False
    )
    out = fn(str(tmp_path))
    assert out.to_dict("records") == [{"s_suppkey": 7, "n_covered": 3}]


@pytest.mark.parametrize("seed", [101, 102])
@pytest.mark.parametrize("broadcast", [True, False])
def test_trade_balance_differential(ray_session, tmp_path, seed, broadcast):
    """Q7-shape bilateral trade on random 5-table stars, both the
    broadcast-dimension arm and the second-native-join arm."""
    from knowledge_graph_construction_ray.query.relational import (
        NATIONS_TRADE_SQL,
        nations_trade_balance,
    )

    rng = np.random.default_rng(seed)
    n_nat, n_cust, n_supp, n_ord, n_li = 5, 20, 8, 60, 200
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(n_nat, dtype=np.int64),
            "n_name": [f"NAT_{i}" for i in range(n_nat)],
            "n_regionkey": np.zeros(n_nat, dtype=np.int64),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_nationkey": rng.integers(0, n_nat, n_cust).astype(np.int64),
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_nationkey": rng.integers(0, n_nat, n_supp).astype(np.int64),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
            "l_extendedprice": np.round(rng.random(n_li) * 5000, 2),
            "l_discount": np.round(rng.random(n_li) * 0.1, 2),
        }
    )
    tables = {
        "nation": nation, "customer": customer, "supplier": supplier,
        "orders": orders, "lineitem": lineitem,
    }
    for t, df in tables.items():
        df.to_parquet(os.path.join(tmp_path, f"{t}.parquet"), index=False)
    got = nations_trade_balance(
        str(tmp_path), broadcast_max_rows=(10**9 if broadcast else 1)
    ).reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    exp = con.execute(NATIONS_TRADE_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))


def test_rfm_segments_hand_computed(ray_session, tmp_path):
    """4 users, one event each, strictly ordered on every metric →
    quartiles are the identity permutation (best user = tile 1 on all
    three axes).  Computed by hand, not by any shared kernel."""
    fn, _sql = QUERIES["events_rfm_segments"]
    # user 0: most recent, most events, most spend ... user 3: least
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for u in range(4):
        for k in range(4 - u):  # frequency 4,3,2,1
            rows.append(
                (
                    eid,
                    base + pd.Timedelta(days=30 - 10 * u + k),
                    u,
                    "view",
                    float(100 - 30 * u),
                    "{}",
                )
            )
            eid += 1
    events = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    events.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = fn(str(tmp_path)).set_index("user_id")
    for u in range(4):
        assert int(out.loc[u, "r_tile"]) == u + 1
        assert int(out.loc[u, "f_tile"]) == u + 1
        assert int(out.loc[u, "m_tile"]) == u + 1
        assert int(out.loc[u, "segment"]) == (u + 1) * 111
