"""End-to-end Ray pipeline vs the reference-semantics oracle: the P/R gate.

The Ray pipeline's sorted nodes/edges output over the fixture corpus must
EQUAL the single-process oracle output (P/R = 1.0 ≥ the 0.95 gate of
BASELINE.json)."""

import json

import pytest

import knowledge_graph_construction_ray.sources.readers as readers
from knowledge_graph_construction_ray.materialize import (
    edges_to_triples,
    triples_set,
)
from knowledge_graph_construction_ray.oracle import precision_recall
from knowledge_graph_construction_ray.pipelines.kg import build_graph


@pytest.fixture(scope="module")
def built(ray_session, fixture_corpus):
    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
    nodes, edges = build_graph(docs)
    return nodes.to_pandas(), edges.to_pandas(), edges


def test_nodes_match_oracle_exactly(built, oracle_graph):
    nodes_df, _, _ = built
    expected = oracle_graph.nodes_table().to_pandas()
    got = nodes_df.reset_index(drop=True)
    assert len(got) == len(expected)
    assert list(got["label"]) == list(expected["label"])
    assert list(got["name"]) == list(expected["name"])
    # property maps must match key-by-key (JSON key order normalized)
    for g, e in zip(got["props"], expected["props"]):
        assert json.loads(g) == json.loads(e)


def test_edges_match_oracle_exactly(built, oracle_graph):
    _, edges_df, _ = built
    expected = oracle_graph.edges_table().to_pandas()
    assert edges_df.reset_index(drop=True).equals(expected)


def test_triple_precision_recall_gate(built, oracle_graph):
    _, _, edges = built
    predicted = triples_set(edges_to_triples(edges))
    p, r = precision_recall(predicted, oracle_graph.triples())
    assert p == 1.0 and r == 1.0  # gate is >= 0.95; we hold exact parity


def test_salted_two_stage_fold_is_equivalent(ray_session, fixture_corpus, oracle_graph):
    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
    nodes, edges = build_graph(docs, salted=True, num_buckets=16)
    predicted = triples_set(edges_to_triples(edges))
    assert predicted == oracle_graph.triples()
    # spot-check that the upsert fold (incl. null-deletion) survived salting
    df = nodes.to_pandas()
    row = df[(df["label"] == "Disease") & (df["name"] == "病症010")].iloc[0]
    props = json.loads(row["props"])
    assert props["icd_code"] == "ICD-DUP25"
    assert "get_way" not in props


def _frames_equal(a, b):
    a = a.reset_index(drop=True)
    b = b.reset_index(drop=True)
    assert len(a) == len(b)
    for col in a.columns:
        assert list(a[col]) == list(b[col]), col


def test_range_merge_equals_post_sort_exactly(ray_session, fixture_corpus):
    """The sort-free range-partitioned merge (default plan) must emit
    byte-identical row sequences to the original hash-merge + explicit
    Sort plan — the old path IS the parity oracle for the new one, so
    Ray's groupby key-ordering guarantee is pinned here, not assumed."""
    import knowledge_graph_construction_ray.sources.readers as readers

    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
    n_new, e_new = build_graph(docs, num_buckets=16)
    n_old, e_old = build_graph(docs, num_buckets=16, sort_strategy="post_sort")
    _frames_equal(n_new.to_pandas(), n_old.to_pandas())
    _frames_equal(e_new.to_pandas(), e_old.to_pandas())


def test_range_merge_salted_parity(ray_session, fixture_corpus):
    import knowledge_graph_construction_ray.sources.readers as readers

    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
    n_new, e_new = build_graph(docs, num_buckets=16, salted=True)
    n_old, e_old = build_graph(
        docs, num_buckets=16, salted=True, sort_strategy="post_sort"
    )
    _frames_equal(n_new.to_pandas(), n_old.to_pandas())
    _frames_equal(e_new.to_pandas(), e_old.to_pandas())


def test_range_merge_replicated_corpus_parity(ray_session, fixture_corpus):
    """Duplicate-heavy input (the bench corpus shape): every doc ×13 so
    each merge_key shows up in many upstream blocks — exercises the
    combiner + cross-block fold + boundary assignment together."""
    import pyarrow as pa

    import knowledge_graph_construction_ray.sources.readers as readers

    big = pa.concat_tables([fixture_corpus] * 13)
    docs = readers.from_arrow_docs(big, override_num_blocks=16)
    n_new, e_new = build_graph(docs, num_buckets=8)
    n_old, e_old = build_graph(docs, num_buckets=8, sort_strategy="post_sort")
    _frames_equal(n_new.to_pandas(), n_old.to_pandas())
    _frames_equal(e_new.to_pandas(), e_old.to_pandas())


def test_range_merge_falls_back_under_hash_shuffle():
    """ShuffleStrategy.HASH_SHUFFLE places groups by key hash (no global
    key order), so the range plan must detect it and dispatch to the
    explicit-Sort plan instead of silently emitting unsorted output.
    (Dispatch-only: actually executing a groupby under hash shuffle
    stalls in 4-CPU local mode, and the post_sort plan it selects is
    already covered by the parity tests.)"""
    from ray.data.context import DataContext, ShuffleStrategy

    from knowledge_graph_construction_ray.pipelines.kg import (
        _resolve_sort_strategy,
    )

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        assert _resolve_sort_strategy("range_merge") == "post_sort"
        assert _resolve_sort_strategy("post_sort") == "post_sort"
    finally:
        ctx.shuffle_strategy = prev
    assert _resolve_sort_strategy("range_merge") == "range_merge"


def test_unknown_sort_strategy_raises_even_with_canonicalize(
    ray_session, fixture_corpus
):
    import pytest

    import knowledge_graph_construction_ray.sources.readers as readers

    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=4)
    with pytest.raises(ValueError, match="sort_strategy"):
        build_graph(docs, canonicalize=True, sort_strategy="range-merge")


def test_write_graph_sorted_matches_dataset_path(
    ray_session, fixture_corpus, tmp_path
):
    """The fused fold+write path (materialize.write_graph_sorted) must emit
    BYTE-IDENTICAL sorted nodes/edges tables to build_graph + write_parquet
    — same rows, same order (lexicographic part-file order == global
    merge_key order), plain and salted."""
    import pyarrow.dataset as pads

    from knowledge_graph_construction_ray.materialize import write_graph_sorted

    docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
    nodes, edges = build_graph(docs, num_buckets=16)
    n_d = nodes.to_pandas().reset_index(drop=True)
    e_d = edges.to_pandas().reset_index(drop=True)

    for salted in (False, True):
        out = tmp_path / f"wgs_{salted}"
        docs2 = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
        stats = write_graph_sorted(
            docs2,
            str(out / "nodes"),
            str(out / "edges"),
            num_buckets=16,
            salted=salted,
        )
        assert stats["nodes"] == len(n_d) and stats["edges"] == len(e_d)
        n_f = pads.dataset(str(out / "nodes")).to_table().to_pandas()
        e_f = pads.dataset(str(out / "edges")).to_table().to_pandas()
        assert n_f.equals(n_d), f"nodes diverge (salted={salted})"
        assert e_f.equals(e_d), f"edges diverge (salted={salted})"


def test_update_graph_sorted_matches_full_rebuild(
    ray_session, fixture_corpus, tmp_path
):
    """Incremental ingest parity: build on the first half of the corpus,
    update with the second half → byte-identical nodes/edges tables to a
    full build over everything, and only a subset of buckets rewritten.
    Pins the store-lineage (-1,-1) fold semantics, plain and salted."""
    import pyarrow.dataset as pads

    from knowledge_graph_construction_ray.materialize import (
        update_graph_sorted,
        write_graph_sorted,
    )

    half = fixture_corpus.num_rows // 2
    A, B = fixture_corpus.slice(0, half), fixture_corpus.slice(half)
    for salted in (False, True):
        full = tmp_path / f"full_{salted}"
        inc = tmp_path / f"inc_{salted}"
        write_graph_sorted(
            readers.from_arrow_docs(fixture_corpus, override_num_blocks=8),
            str(full / "nodes"), str(full / "edges"),
            num_buckets=16, salted=salted,
        )
        write_graph_sorted(
            readers.from_arrow_docs(A, override_num_blocks=4),
            str(inc / "nodes"), str(inc / "edges"),
            num_buckets=16, salted=salted,
        )
        stats = update_graph_sorted(
            readers.from_arrow_docs(B, override_num_blocks=4),
            str(inc / "nodes"), str(inc / "edges"),
        )
        assert 0 < stats["buckets_touched"] < 33  # incremental, not a rebuild
        for side in ("nodes", "edges"):
            f = pads.dataset(str(full / side)).to_table().to_pandas()
            i = pads.dataset(str(inc / side)).to_table().to_pandas()
            assert f.equals(i), f"{side} diverge (salted={salted})"
        # the meta is invalidated during the rewrite and restored after —
        # a SECOND ingest (idempotent re-ingest of B) must be accepted
        # and leave the store unchanged (MERGE semantics)
        again = update_graph_sorted(
            readers.from_arrow_docs(B, override_num_blocks=4),
            str(inc / "nodes"), str(inc / "edges"),
        )
        assert again["buckets_touched"] == stats["buckets_touched"]
        f = pads.dataset(str(full / "nodes")).to_table().to_pandas()
        i = pads.dataset(str(inc / "nodes")).to_table().to_pandas()
        assert f.equals(i), f"re-ingest changed the store (salted={salted})"


def test_update_graph_sorted_rejects_non_store(ray_session, fixture_corpus, tmp_path):
    import pytest

    from knowledge_graph_construction_ray.materialize import update_graph_sorted

    (tmp_path / "nodes").mkdir()
    (tmp_path / "edges").mkdir()
    with pytest.raises(FileNotFoundError, match="_kg_meta"):
        update_graph_sorted(
            readers.from_arrow_docs(fixture_corpus, override_num_blocks=2),
            str(tmp_path / "nodes"), str(tmp_path / "edges"),
        )


def test_write_and_update_graph_sorted_empty_inputs(
    ray_session, fixture_corpus, tmp_path
):
    """Empty corpus → zero-count build (schema-less empty stats frame must
    not KeyError); empty delta → store byte-untouched."""
    import pyarrow.dataset as pads

    from knowledge_graph_construction_ray.materialize import (
        update_graph_sorted,
        write_graph_sorted,
    )

    empty = fixture_corpus.slice(0, 0)
    out0 = tmp_path / "empty_build"
    st = write_graph_sorted(
        readers.from_arrow_docs(empty, override_num_blocks=1),
        str(out0 / "nodes"), str(out0 / "edges"),
    )
    assert (st["nodes"], st["edges"], st["buckets"]) == (0, 0, 0)

    store = tmp_path / "store"
    write_graph_sorted(
        readers.from_arrow_docs(fixture_corpus, override_num_blocks=4),
        str(store / "nodes"), str(store / "edges"),
    )
    before = pads.dataset(str(store / "nodes")).to_table()
    st = update_graph_sorted(
        readers.from_arrow_docs(empty, override_num_blocks=1),
        str(store / "nodes"), str(store / "edges"),
    )
    assert st["buckets_touched"] == 0
    assert pads.dataset(str(store / "nodes")).to_table().equals(before)


def test_canonicalize_range_merge_matches_post_sort(ray_session, fixture_corpus):
    """The canonicalized range_merge plan (post-remap range-keyed re-merge,
    no finalize Sorts) must emit EXACTLY the post_sort plan's sorted
    nodes/edges — same rows, same order."""
    outs = []
    for strategy in ("range_merge", "post_sort"):
        docs = readers.from_arrow_docs(fixture_corpus, override_num_blocks=8)
        nodes, edges = build_graph(
            docs, canonicalize=True, num_buckets=16, sort_strategy=strategy
        )
        outs.append((nodes.to_pandas().reset_index(drop=True),
                     edges.to_pandas().reset_index(drop=True)))
    assert outs[0][0].equals(outs[1][0])
    assert outs[0][1].equals(outs[1][1])
