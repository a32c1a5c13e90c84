"""Migration converters (raw reference-shaped inputs → docs table) and the
retrieval orchestrator."""

import pyarrow as pa
import pytest


def test_converters_reference_shapes_to_graph(ray_session):
    from knowledge_graph_construction_ray.sources.convert import (
        build_docs_table,
        diseases_json_to_records,
        insurance_json_to_records,
        medicines_json_to_records,
        nursing_csv_to_records,
        policy_text_to_records,
    )

    diseases = diseases_json_to_records(
        '[{"name": "迁症01", "symptom": ["迁兆01"], "cure_dept": "迁科"}]\n'
    )
    medicines = medicines_json_to_records(
        {
            "西药部分": {"categories": [], "medicines": [{"name": "迁药01", "dosage": "1片"}]},
            "协议西药": {"medicines": [{"name": "迁药01", "category_code": "X9"}]},
        }
    )
    assert [m["sheet"] for m in medicines] == ["西药部分", "协议西药"]
    nursing = nursing_csv_to_records(
        "﻿城市,名称,性质,床位,价格(元/月),特色服务,地址\n"
        "迁城,迁院01,民办,80,4000,护理,路1号\n"
        "迁城,   ,民办,10,100,无,路2号\n"
    )
    insurance = insurance_json_to_records(
        '[{"产品名称": "迁保01号", "承保年龄": "60周岁以上", "产品描述": "保高血压"}]'
    )
    policy = policy_text_to_records("迁条款\n迁保01号对迁症01提供保障。\n\n本条款仅供参考。\n")

    docs = build_docs_table(
        diseases=diseases, medicines=medicines, nursing_homes=nursing,
        insurances=insurance, policy_texts=policy,
    )
    assert docs.num_rows == 1 + 2 + 2 + 1 + 1

    # the converted corpus flows through the unchanged pipeline
    from knowledge_graph_construction_ray.pipelines.kg import build_graph
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs

    nodes, edges = build_graph(from_arrow_docs(docs))
    ndf, edf = nodes.to_pandas(), edges.to_pandas()
    by_label = ndf.groupby("label")["name"].apply(set).to_dict()
    # duplicate medicine across sheets upserted into ONE Drug node
    assert by_label["Drug"] == {"迁药01"}
    # blank-name nursing row dropped
    assert by_label["NursingHome"] == {"迁院01"}
    triples = {
        (r.src_label, r.src_name, r.rel, r.dst_label, r.dst_name)
        for r in edf.itertuples()
    }
    assert ("Insurance", "迁保01号", "TARGETS_POPULATION", "Population", "老年人") in triples
    assert ("Insurance", "迁保01号", "COVERS_DISEASE", "Disease", "高血压") in triples
    assert ("Insurance", "迁保01号", "COVERS", "Disease", "迁症01") in triples  # from policy text
    assert ("Disease", "迁症01", "BELONGS_TO_DEPT", "Department", "迁科") in triples


def test_empty_converter_inputs():
    from knowledge_graph_construction_ray.sources.convert import (
        build_docs_table,
        policy_text_to_records,
    )

    assert build_docs_table().num_rows == 0
    assert policy_text_to_records("   \n  \n") == []


@pytest.fixture(scope="module")
def graph(ray_session, fixture_corpus):
    from knowledge_graph_construction_ray.pipelines.kg import build_graph
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs

    nodes, edges = build_graph(from_arrow_docs(fixture_corpus, override_num_blocks=8))
    return nodes.materialize(), edges.materialize()


def test_retrieve_orchestration(graph):
    from knowledge_graph_construction_ray.query.rag import retrieve
    from knowledge_graph_construction_ray.query.understanding import parse_intent

    nodes, edges = graph
    q = parse_intent("我65岁，有恶性肿瘤，预算16000元找养老院",
                     entity_gazetteer={"恶性肿瘤": "Disease"})
    ctx = retrieve(q, nodes, edges)
    assert "【推荐保险】针对 恶性肿瘤" in ctx  # J2 recs
    assert "【适老保险】" in ctx  # J3 (age 65 + 3 targeting products)
    assert "【养老机构推荐】" in ctx  # F1/F2 cards

    # empty-result fallback
    from knowledge_graph_construction_ray.query.rag import EMPTY_CONTEXT

    ctx2 = retrieve(parse_intent("讲个笑话"), nodes, edges)
    assert ctx2 == EMPTY_CONTEXT

    # F7 logic lock: retro-question gets no fresh context
    ctx3 = retrieve(parse_intent("上面的保险哪个好"), nodes, edges)
    assert ctx3 == ""


def test_retrieve_insurance_intent_branch(graph):
    from knowledge_graph_construction_ray.query.rag import retrieve

    nodes, edges = graph
    q = {"intent": "insurance_query", "raw_query": "推荐个保险", "disease": []}
    ctx = retrieve(q, nodes, edges, generic_keywords=["号"])
    assert "【保险产品库】" in ctx and "【产品】" in ctx
    # reference keyword lists hit nothing on the synthetic corpus → falls
    # through to the empty-context fallback
    from knowledge_graph_construction_ray.query.rag import EMPTY_CONTEXT

    assert retrieve(q, nodes, edges) == EMPTY_CONTEXT


def test_pipeline_wired_purely_from_config(ray_session, tmp_path):
    """SURVEY §2.10 row 3: YAML config → named inputs → reader factory →
    span-doc Dataset → unchanged KG pipeline.  Exercises both the explicit
    `sources:` layout and the reference-compatible `data_sources:` groups
    (config.yaml:10-17 semantics: medical routes by filename, senior_care
    is the nursing CSV)."""
    d = tmp_path
    (d / "Diseases").mkdir(); (d / "Drugs").mkdir()
    (d / "NursingHomes").mkdir(); (d / "Insurance").mkdir()
    (d / "Diseases/diseases.json").write_text(
        '[{"name": "配症01", "symptom": ["配兆01"], "cure_dept": "配科"}]',
        encoding="utf-8",
    )
    (d / "Drugs/medicine.json").write_text(
        '{"西药部分": {"medicines": [{"name": "配药01", "dosage": "1片"}]}}',
        encoding="utf-8",
    )
    (d / "NursingHomes/nursing_homes.csv").write_text(
        "﻿城市,名称,性质,床位,价格(元/月),特色服务,地址\n"
        "配城,配院01,民办,80,4000,护理,路1号\n",
        encoding="utf-8",
    )
    (d / "Insurance/insurance_info.json").write_text(
        '[{"产品名称": "配保01号", "承保年龄": "60周岁以上", "产品描述": "保高血压"}]',
        encoding="utf-8",
    )
    (d / "policy.txt").write_text(
        "配条款\n配保01号对配症01提供保障。\n", encoding="utf-8"
    )
    (d / "config.yaml").write_text(
        "data_sources:\n"
        "  medical:\n"
        "    - Diseases/diseases.json\n"
        "    - Drugs/medicine.json\n"
        "  insurance:\n"
        "    - Insurance/insurance_info.json\n"
        "  senior_care:\n"
        "    - NursingHomes/nursing_homes.csv\n"
        "sources:\n"
        "  - {kind: policy_text, path: policy.txt}\n",
        encoding="utf-8",
    )

    from knowledge_graph_construction_ray.pipelines.kg import build_graph
    from knowledge_graph_construction_ray.sources.config import (
        dataset_from_config,
        load_pipeline_config,
        resolve_sources,
    )

    cfg = load_pipeline_config(str(d / "config.yaml"))
    kinds = [k for k, _p in resolve_sources(cfg, str(d))]
    assert sorted(kinds) == [
        "disease", "insurance", "medicine", "nursing_home", "policy_text"
    ]

    docs = dataset_from_config(str(d / "config.yaml"), override_num_blocks=2)
    nodes, edges = build_graph(docs)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()
    by_label = ndf.groupby("label")["name"].apply(set).to_dict()
    assert by_label["Disease"] >= {"配症01"}
    assert by_label["Drug"] == {"配药01"}
    assert by_label["NursingHome"] == {"配院01"}
    triples = {(r.src_name, r.rel, r.dst_name) for r in edf.itertuples()}
    assert ("配保01号", "COVERS_DISEASE", "高血压") in triples
    assert ("配保01号", "COVERS", "配症01") in triples


def test_config_unknown_kind_fails_fast():
    from knowledge_graph_construction_ray.sources.config import resolve_sources

    with pytest.raises(ValueError, match="unknown source kind"):
        resolve_sources({"sources": [{"kind": "bogus", "path": "x.json"}]})


def test_config_unknown_group_fails_fast():
    # a typo'd data_sources group must not silently drop its sources
    from knowledge_graph_construction_ray.sources.config import resolve_sources

    with pytest.raises(ValueError, match="unknown data_sources group"):
        resolve_sources({"data_sources": {"senior_car": ["nh.csv"]}})


def test_cmd_triples_refuses_dirty_out(tmp_path):
    # guard order matters: a typo'd --work must fail BEFORE --out is
    # touched (a prior export must survive), and a dirty --out must
    # refuse before any Ray read happens
    import argparse

    from knowledge_graph_construction_ray.__main__ import cmd_triples

    out = tmp_path / "shared"
    out.mkdir()
    (out / "keep.txt").write_text("precious")
    prior = tmp_path / "prior_export"
    prior.mkdir()
    (prior / "part-0.parquet").write_bytes(b"x")  # a previous triples export

    # absent work dir: fails on --work validation, prior export untouched
    with pytest.raises(SystemExit, match="no graph/edges"):
        cmd_triples(argparse.Namespace(work=str(tmp_path / "absent"), out=str(prior)))
    assert (prior / "part-0.parquet").exists()

    # work dir whose graph/edges exists but holds no parquet (interrupted
    # build): must also fail validation without touching --out
    work = tmp_path / "work"
    (work / "graph" / "edges").mkdir(parents=True)
    with pytest.raises(SystemExit, match="no graph/edges parquet"):
        cmd_triples(argparse.Namespace(work=str(work), out=str(prior)))
    assert (prior / "part-0.parquet").exists()

    # valid-looking work dir + dirty out: refuses before the Ray read
    (work / "graph" / "edges" / "part-0.parquet").write_bytes(b"x")
    with pytest.raises(SystemExit, match="refusing to clear"):
        cmd_triples(argparse.Namespace(work=str(work), out=str(out)))
    assert (out / "keep.txt").read_text() == "precious"


def test_cli_write_then_ingest_roundtrip(ray_session, fixture_corpus, tmp_path):
    """`write` then `ingest` through the CLI command functions equals the
    full-corpus graph (the parity depth lives in test_pipeline_graph; this
    pins the CLI plumbing: arg wiring, meta reuse, stats keys)."""
    import argparse

    import pyarrow.dataset as pads

    from knowledge_graph_construction_ray.__main__ import cmd_ingest, cmd_write
    from knowledge_graph_construction_ray.state.checkpoint import (
        split_docs_to_files,
    )

    half = fixture_corpus.num_rows // 2
    split_docs_to_files(fixture_corpus.slice(0, half), str(tmp_path / "a"), 2)
    split_docs_to_files(fixture_corpus.slice(half), str(tmp_path / "b"), 2)
    out = tmp_path / "graph"
    w = cmd_write(argparse.Namespace(
        input=str(tmp_path / "a"), out=str(out), salted=False, num_buckets=16,
    ))
    assert w["nodes"] > 0 and "buckets" in w
    i = cmd_ingest(argparse.Namespace(input=str(tmp_path / "b"), out=str(out)))
    assert 0 < i["buckets_touched"] <= 33
    assert pads.dataset(str(out / "nodes")).to_table().num_rows == 553
    assert pads.dataset(str(out / "edges")).to_table().num_rows == 322


def test_cli_ingest_with_dedup_store(ray_session, fixture_corpus, tmp_path):
    """End-to-end `write --dedup-store` then `ingest --dedup-store` with a
    delta holding near-dups of STORED docs (fresh ids), near-dups within
    the batch, and genuinely new docs: dups are flagged + dropped before
    the graph, the store stays consistent, and the screening state
    extends so a SECOND batch catches dups of first-batch survivors."""
    import argparse
    import json as _json

    import pyarrow as pa
    import pyarrow.dataset as pads

    from knowledge_graph_construction_ray.__main__ import cmd_ingest, cmd_write
    from knowledge_graph_construction_ray.spanenc import doc_text
    from knowledge_graph_construction_ray.state.checkpoint import (
        split_docs_to_files,
    )

    split_docs_to_files(fixture_corpus, str(tmp_path / "base"), 2)
    out, store = tmp_path / "graph", tmp_path / "dedup"
    w = cmd_write(argparse.Namespace(
        input=str(tmp_path / "base"), out=str(out), salted=False,
        num_buckets=16, dedup_store=str(store),
    ))
    assert w["dedup"]["indexed_docs"] == fixture_corpus.num_rows
    base_nodes = pads.dataset(str(out / "nodes")).to_table().num_rows
    base_edges = pads.dataset(str(out / "edges")).to_table().num_rows

    # delta: near-dup of a stored doc (fresh id), two near-dup copies of
    # one NEW doc (batch-internal), and one genuinely new doc
    rows = fixture_corpus.to_pylist()
    stored = next(
        r for r in rows
        if r["doc_id"].startswith("policy_text:")
        and len(doc_text(r["spans"])) > 40
    )
    near_stored = {
        "doc_id": "policy_text:900000",
        "spans": [dict(s) for s in stored["spans"]],
    }
    near_stored["spans"][-1]["text"] += " 略有改动"

    def clause_doc(doc_id, text):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "clause", "text": text, "media_ref": "",
                       "offset": 0}],
        }

    fresh_text = "保99号对病症000提供保障。全新条款 " + " ".join(f"词{i}" for i in range(40))
    fresh = clause_doc("policy_text:900001", fresh_text)
    fresh_dup = clause_doc("policy_text:900002", fresh_text + " 尾注")
    other = clause_doc(
        "policy_text:900003",
        "另一篇毫无重叠的 " + " ".join(f"独{i}" for i in range(40)),
    )
    delta = pa.Table.from_pylist(
        [near_stored, fresh, fresh_dup, other], schema=fixture_corpus.schema
    )
    split_docs_to_files(delta, str(tmp_path / "delta"), 1)
    i1 = cmd_ingest(argparse.Namespace(
        input=str(tmp_path / "delta"), out=str(out),
        dedup_store=str(store), dedup_threshold=0.5,
    ))
    # dup-of-stored dropped (stored doc canonical); fresh kept (min id of
    # its batch cluster); fresh-001 dropped (batch-internal near-dup)
    assert i1["dedup"]["dropped_docs"] == [
        "policy_text:900000", "policy_text:900002"
    ]
    assert i1["dedup"]["kept_docs"] == 2
    # graph consistency: only the two survivors' elements entered
    nodes_t = pads.dataset(str(out / "nodes")).to_table()
    assert nodes_t.num_rows > base_nodes  # survivors added something
    assert pads.dataset(str(out / "edges")).to_table().num_rows >= base_edges
    meta = _json.loads((out / "nodes" / "_kg_meta.json").read_text())
    assert "bounds" in meta  # store whole again after the update

    # second batch: a near-dup of a FIRST-BATCH survivor must now be
    # caught too (the screening state extended)
    echo = clause_doc("policy_text:910000", fresh_text + " 另一尾注")
    delta2 = pa.Table.from_pylist([echo], schema=fixture_corpus.schema)
    split_docs_to_files(delta2, str(tmp_path / "delta2"), 1)
    i2 = cmd_ingest(argparse.Namespace(
        input=str(tmp_path / "delta2"), out=str(out),
        dedup_store=str(store), dedup_threshold=0.5,
    ))
    assert i2["dedup"]["dropped_docs"] == ["policy_text:910000"]
    assert i2["dedup"]["kept_docs"] == 0 and i2["buckets_touched"] == 0
    # store unchanged by the all-dropped batch
    assert pads.dataset(str(out / "nodes")).to_table().num_rows == nodes_t.num_rows
