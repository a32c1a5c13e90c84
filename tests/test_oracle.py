"""Reference-semantics oracle over the fixture corpus — hand-audited
expectations (these numbers were derived by hand from FIXTURES.md §3 and the
reference rules in neo4j_loader.py / text_graph_builder.py)."""

import json

import pytest


def _props(oracle, label, name):
    return oracle.nodes[(label, name)]


def test_node_counts_by_label(oracle_graph):
    counts = {}
    for (label, _name) in oracle_graph.nodes:
        counts[label] = counts.get(label, 0) + 1
    assert counts == {
        # 38 named diseases (40 docs - 2 dup names) + 2 displaced names that
        # reappear as neopathy stubs (病症025/病症037) + 10 novel neopathy
        # stubs + 3 insurance rule stubs (高血压/糖尿病/恶性肿瘤) + 1 text
        # surface variant (恶性肿瘤-重度)
        "Disease": 54,
        # 350 distinct medicine names + 10 referenced-only stubs (药剂090-099)
        "Drug": 360,
        "Symptom": 60,
        "NursingHome": 47,  # 48 docs - 1 whitespace name
        "Insurance": 15,  # 16 docs - 1 dup name
        "Department": 5,
        "Population": 1,
        "AgeRange": 8,
        "Exclusion": 3,
    }


def test_duplicate_disease_upsert_last_writer_wins_with_null_removal(oracle_graph):
    # doc 10 and doc 25 share name 病症010; doc 25 is later, has
    # icd_code=ICD-DUP25 and is missing get_way → the null DELETES doc 10's
    # get_way through the `SET n +=` fold.
    props = _props(oracle_graph, "Disease", "病症010")
    assert props["icd_code"] == "ICD-DUP25"
    assert "get_way" not in props
    assert props["easy_get"] == "多发于中老年人"


def test_duplicate_drug_upsert_null_deletes_dosage(oracle_graph):
    # medicine doc 360 reuses 药剂110 (from doc 10) and has no dosage span
    props = _props(oracle_graph, "Drug", "药剂110")
    assert "dosage" not in props
    assert props["category_code"] == "X10"
    assert props["reimbursement_category"] == "甲类"


def test_stub_nodes_never_overwrite_props(oracle_graph):
    # 病症001 is both a full disease record (doc 1) and a neopathy reference
    # (doc 0) — the stub must not erase the record's props.
    props = _props(oracle_graph, "Disease", "病症001")
    assert props["icd_code"] == "ICD-0001"
    # referenced-only drugs exist as bare stubs
    assert _props(oracle_graph, "Drug", "药剂090") == {}


def test_whitespace_dept_emits_no_edge(oracle_graph):
    assert not any(
        s_name == "病症008" and rel == "BELONGS_TO_DEPT"
        for (_, s_name, rel, _, _) in oracle_graph.edges
    )


def test_nursing_home_blank_name_dropped_and_dirty_price_kept(oracle_graph):
    assert not any(l == "NursingHome" and not n.strip() for (l, n) in oracle_graph.nodes)
    # price stays a string; dirty value preserved (cast happens at query time)
    name = "城南市安养院07"  # doc 7, city index 7%4=3 → 城西市? verified below
    homes = {n: p for (l, n), p in oracle_graph.nodes.items() if l == "NursingHome"}
    dirty = [n for n, p in homes.items() if p.get("price") == "价格面议"]
    assert len(dirty) == 2


def test_insurance_rule_edges(oracle_graph):
    triples = oracle_graph.triples()
    # '60' substring quirk: 出生满30天-60周岁 targets 老年人 despite not
    # being elderly-targeted wording (reference behavior preserved)
    assert ("Insurance:保02号", "TARGETS_POPULATION", "Population:老年人") in triples
    assert ("Insurance:保09号", "TARGETS_POPULATION", "Population:老年人") in triples
    assert ("Insurance:保04号", "TARGETS_POPULATION", "Population:老年人") in triples
    targets = [t for t in triples if t[1] == "TARGETS_POPULATION"]
    assert len(targets) == 3
    covers = sorted(t for t in triples if t[1] == "COVERS_DISEASE")
    # doc 7 hits both 癌症 and 恶性肿瘤 keywords → exactly ONE edge
    assert covers == [
        ("Insurance:保01号", "COVERS_DISEASE", "Disease:高血压"),
        ("Insurance:保03号", "COVERS_DISEASE", "Disease:糖尿病"),
        ("Insurance:保05号", "COVERS_DISEASE", "Disease:恶性肿瘤"),
        ("Insurance:保06号", "COVERS_DISEASE", "Disease:恶性肿瘤"),
        ("Insurance:保07号", "COVERS_DISEASE", "Disease:恶性肿瘤"),
        ("Insurance:保08号", "COVERS_DISEASE", "Disease:糖尿病"),
        ("Insurance:保08号", "COVERS_DISEASE", "Disease:高血压"),
    ]


def test_hot_symptom_edge_dedup(oracle_graph):
    # 30 docs share 征兆000 but docs 10/25 share a name → 29 distinct edges
    hot = [
        t for t in oracle_graph.edges
        if t[2] == "HAS_SYMPTOM" and t[4] == "征兆000"
    ]
    assert len(hot) == 29


def test_policy_text_triples_and_media_alignment(oracle_graph):
    triples = oracle_graph.triples()
    assert ("Insurance:保00号", "COVERS", "Disease:病症000") in triples
    assert ("Insurance:保00号", "ALLOWS_AGE", "AgeRange:0-60周岁") in triples
    assert ("Insurance:保00号", "EXCLUDES", "Exclusion:既往症0") in triples
    assert ("Insurance:保00号", "REFUSES_DISEASE", "Disease:病症002") in triples
    # surface variant from docs 6/7 → a distinct stub (canonicalization is a
    # separate, later stage; the reference itself keeps the variant)
    assert ("Insurance:保06号", "COVERS", "Disease:恶性肿瘤-重度") in triples
    # media spans never produce subjects/objects
    assert not any("media" in s or "media" in o for s, _, o in triples)


def test_props_json_roundtrip(oracle_graph):
    t = oracle_graph.nodes_table()
    assert t.num_rows == 553
    row = t.slice(0, 1).to_pylist()[0]
    json.loads(row["props"])  # valid JSON


def test_precision_recall_helper():
    from knowledge_graph_construction_ray.oracle import precision_recall

    a = {("s", "p", "o"), ("s2", "p", "o2")}
    assert precision_recall(a, a) == (1.0, 1.0)
    p, r = precision_recall({("s", "p", "o")}, a)
    assert p == 1.0 and r == 0.5
