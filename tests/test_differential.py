"""Differential fuzzing: seeded random corpora (all record kinds, random
missing fields, duplicate names, random rule-keyword hits, interleaved
media) run through BOTH the Ray pipeline and the single-process oracle —
outputs must be identical.  Catches semantics drift the fixed fixture
corpus can't."""

import json
import random

import pyarrow as pa
import pytest

from knowledge_graph_construction_ray.schema import DOCS_SCHEMA, make_doc_id
from knowledge_graph_construction_ray.spanenc import encode_record


def random_corpus(seed: int) -> pa.Table:
    rng = random.Random(seed)
    doc_ids, span_lists = [], []

    def emit(kind, idx, rec, key=""):
        doc_ids.append(make_doc_id(kind, idx))
        span_lists.append(encode_record(kind, rec, doc_key=key or str(idx)))

    disease_names = [f"随症{rng.randrange(12):02d}" for _ in range(rng.randrange(4, 14))]
    for i, name in enumerate(disease_names):
        rec = {"name": name}
        for f in ("icd_code", "intro", "get_prob", "easy_get", "get_way",
                  "cause", "prevent", "nursing", "treat_detail"):
            if rng.random() < 0.7:
                rec[f] = f"{f}值{rng.randrange(100)}"
        if rng.random() < 0.3:
            rec["cure_dept"] = rng.choice(["  ", "", f"随科{rng.randrange(3)}"])
        for lf, pool in (("symptom", "随兆"), ("drug", "随药"), ("neopathy", "随症")):
            if rng.random() < 0.8:
                rec[lf] = [f"{pool}{rng.randrange(12):02d}" for _ in range(rng.randrange(1, 4))]
        emit("disease", i, rec)

    for i in range(rng.randrange(3, 10)):
        rec = {"name": f"随药{rng.randrange(12):02d}"}
        for f in ("category_code", "subcategory_name", "dosage", "reimbursement_category",
                  "sheet", "category_name"):
            if rng.random() < 0.6:
                rec[f] = f"{f}{rng.randrange(50)}"
        emit("medicine", i, rec)

    for i in range(rng.randrange(2, 8)):
        rec = {
            "名称": rng.choice(["   ", f"随院{rng.randrange(9):02d}", f" 随院{rng.randrange(9):02d} "]),
            "城市": f"随城{rng.randrange(3)}",
            "价格(元/月)": rng.choice(["3000", "价格面议"]),
        }
        if rng.random() < 0.5:
            rec["地址"] = f"路{rng.randrange(99)}号"
        emit("nursing_home", i, rec)

    for i in range(rng.randrange(2, 8)):
        rec = {
            "产品名称": f"随保{rng.randrange(9):02d}号",
            "承保年龄": rng.choice(["18-55周岁", "出生满30天-60周岁", "面向老年群体", "0-160周岁"]),
        }
        if rng.random() < 0.8:
            rec["产品描述"] = "".join(
                rng.sample(["平稳保障。", "涵盖高血压。", "糖尿病可保。", "癌症可赔。",
                            "恶性肿瘤覆盖。", "意外保障。"], k=rng.randrange(1, 4))
            )
        emit("insurance", i, rec)

    for j in range(rng.randrange(1, 5)):
        ins = f"随保{rng.randrange(9):02d}号"
        clauses = []
        for _ in range(rng.randrange(1, 6)):
            clauses.append(rng.choice([
                f"{ins}对随症{rng.randrange(12):02d}提供保障。",
                f"{ins}的投保年龄为{rng.randrange(70)}-{70 + rng.randrange(20)}周岁。",
                f"{ins}不承保既往症{rng.randrange(3)}。",
                f"{ins}拒保随症{rng.randrange(12):02d}。",
                "本条款内容仅供参考。",
            ]))
        emit("policy_text", j, {"title": f"随条款{j}", "clauses": clauses})

    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=DOCS_SCHEMA
    )


@pytest.mark.parametrize("seed", [3, 7, 11, 23, 42, 57, 73, 99, 123, 201])
def test_pipeline_equals_oracle_on_random_corpus(ray_session, seed):
    from knowledge_graph_construction_ray.oracle import GraphOracle
    from knowledge_graph_construction_ray.pipelines.kg import build_graph
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs

    corpus = random_corpus(seed)
    oracle = GraphOracle().build_from_docs(corpus.to_pylist())
    nodes, edges = build_graph(
        from_arrow_docs(corpus, override_num_blocks=4),
        salted=bool(seed % 2),  # alternate fold strategies
    )
    ndf = nodes.to_pandas()
    expected = oracle.nodes_table().to_pandas()
    assert list(ndf["label"]) == list(expected["label"]), f"seed={seed}"
    assert list(ndf["name"]) == list(expected["name"]), f"seed={seed}"
    for got, exp in zip(ndf["props"], expected["props"]):
        assert json.loads(got) == json.loads(exp), f"seed={seed}"
    got_edges = {
        (r.src_label, r.src_name, r.rel, r.dst_label, r.dst_name)
        for r in edges.to_pandas().itertuples()
    }
    assert got_edges == set(oracle.edges), f"seed={seed}"


def test_canonicalize_idempotent(ray_session, fixture_corpus):
    """canonicalize(canonicalize(x)) == canonicalize(x): remapping reaches a
    fixpoint (no canonical name itself maps onward)."""
    from knowledge_graph_construction_ray.merge import merge_elements
    from knowledge_graph_construction_ray.pipelines.kg import extract
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs
    from knowledge_graph_construction_ray.stages.link import (
        build_canonical_map,
        canonicalize_elements,
    )

    merged = merge_elements(
        extract(from_arrow_docs(fixture_corpus, override_num_blocks=4))
    ).materialize()
    once = canonicalize_elements(merged).materialize()
    # fixpoint: a second pass finds nothing to merge
    assert build_canonical_map(once) == {}
    twice = canonicalize_elements(once)
    a = once.to_pandas().sort_values("merge_key").reset_index(drop=True)
    b = twice.to_pandas().sort_values("merge_key").reset_index(drop=True)
    assert list(a["merge_key"]) == list(b["merge_key"])


def test_single_kind_corpora(ray_session):
    """A corpus containing only ONE record kind flows through the full
    pipeline (no cross-kind assumptions)."""
    from knowledge_graph_construction_ray.pipelines.kg import build_graph
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs
    from knowledge_graph_construction_ray.spanenc import encode_docs_table

    meds = encode_docs_table(
        "medicine",
        [{"name": f"独药{i}", "dosage": "1片"} for i in range(5)]
        + [{"name": "独药0"}],  # null-deletion on the duplicate
    )
    nodes, edges = build_graph(from_arrow_docs(meds))
    ndf = nodes.to_pandas()
    assert len(ndf) == 5 and edges.count() == 0
    import json

    dup = json.loads(ndf[ndf["name"] == "独药0"]["props"].iloc[0])
    assert "dosage" not in dup  # later null deleted it


@pytest.mark.parametrize("seed", [3, 17])
def test_fold_bucket_delta_equals_full_refold(seed):
    """The sorted-run delta merge (only delta-touched keys re-fold) is
    row-for-row identical to re-folding the whole bucket — randomized
    stores with stub/real/edge collisions, store lineage (-1, -1)."""
    import random

    import pandas as pd

    from knowledge_graph_construction_ray.merge import (
        _fold_bucket_delta,
        _fold_bucket_sorted,
    )

    rng = random.Random(seed)
    keys = [f"N\x1fD\x1f名{i:03d}" for i in range(40)] + [
        f"E\x1fD\x1f名{i:03d}\x1fREL\x1fS\x1f症{i:03d}" for i in range(20)
    ]

    import json as _json

    def frame(n, ranks, store=False):
        rows = []
        for _ in range(n):
            k = rng.choice(keys)
            rank = -1 if store else rng.choice(ranks)
            seq = -1 if store else rng.randrange(100)
            if k.startswith("E"):
                props = None
            else:
                body = rng.choice([{}, {"a": 1}, {"a": 2, "b": "x"}])
                # props are lineage-TAGGED json: {k: [rank, seq, v]}
                props = _json.dumps(
                    {pk: [rank, seq, pv] for pk, pv in body.items()}
                )
            rows.append(
                {
                    "merge_key": k,
                    "props": props,
                    "src_rank": rank,
                    "seq": seq,
                    "bucket": 7,
                }
            )
        return pd.DataFrame(rows)

    # a stored bucket is folded + sorted (one row per key)
    existing = _fold_bucket_sorted(frame(60, [0, 1], store=True))
    existing["src_rank"] = -1
    existing["seq"] = -1
    delta = frame(25, [2, 3])
    got = _fold_bucket_delta(existing, delta)
    want = _fold_bucket_sorted(
        pd.concat([existing, delta], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # empty-store and empty-delta edges
    empty = existing.iloc[0:0]
    pd.testing.assert_frame_equal(
        _fold_bucket_delta(empty, delta), _fold_bucket_sorted(delta)
    )
    pd.testing.assert_frame_equal(
        _fold_bucket_delta(existing, delta.iloc[0:0]),
        _fold_bucket_sorted(existing),
    )
