"""Single-process reference-semantics oracle.

A pure-Python re-implementation of the reference's record→graph semantics
(``neo4j_loader.py`` loaders + Cypher ``MERGE``/``SET +=`` upsert rules and
``text_graph_builder.py`` triple writes), run sequentially over the span-doc
corpus exactly as the reference runs over its source files.  The Ray
pipeline's sorted output must match this oracle's output — that is the
P/R ≥ 0.95 gate (we target P/R = 1.0).

Semantics reproduced (SURVEY.md §1.2/§1.4):

* node identity = (label, name); uniqueness via keyed upsert;
* ``MERGE (n:L {name}) SET n += props`` — per-key last-writer-wins where a
  present-but-null value DELETES the key (Cypher ``+=`` null semantics) and
  Neo4j never stores null properties;
* bare ``MERGE`` endpoint references create stub nodes and never overwrite
  properties (outer-join-with-create, neo4j_loader.py:126-147);
* edges dedup by (src_label, src_name, rel, dst_label, dst_name);
* source order diseases → medicines → nursing homes → insurances → text
  (neo4j_loader.py:74-77; the text pipeline is a separate later run).
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pyarrow as pa

from .functions.ie_patterns import clause_triples
from .schema import (
    EDGES_SCHEMA,
    MEDIA_KIND,
    NODES_SCHEMA,
    SRC_RANK,
    TRIPLES_SCHEMA,
    doc_kind,
)
from .spanenc import decode_doc

EdgeKey = tuple[str, str, str, str, str]


class GraphOracle:
    """Accumulates nodes/edges with reference upsert semantics."""

    def __init__(self) -> None:
        self.nodes: dict[tuple[str, str], dict[str, Any]] = {}
        self.edges: dict[EdgeKey, None] = {}  # insertion-ordered set

    # -- graph primitives ---------------------------------------------------

    def merge_node(
        self, label: str, name: str, props: dict[str, Any] | None = None
    ) -> None:
        if name is None:
            raise ValueError(f"MERGE with null name for label {label}")
        node = self.nodes.setdefault((label, name), {})
        if props:
            for key, value in props.items():
                if value is None:
                    node.pop(key, None)  # Cypher `+=` null deletes the key
                else:
                    node[key] = value

    def merge_edge(
        self, src_label: str, src_name: str, rel: str, dst_label: str, dst_name: str
    ) -> None:
        self.edges.setdefault((src_label, src_name, rel, dst_label, dst_name))

    # -- per-kind loaders (record views come from the span codec) -----------

    def load_disease(self, record: dict[str, Any]) -> None:
        # neo4j_loader.py:92-117 projection + 120-147 Cypher
        props = {
            key: record.get(key)
            for key in (
                "name", "icd_code", "intro", "get_prob", "easy_get",
                "get_way", "cause", "prevent", "nursing", "treat_detail",
            )
        }
        name = props["name"]
        self.merge_node("Disease", name, props)
        for symptom in record.get("symptom", []):
            self.merge_node("Symptom", symptom)
            self.merge_edge("Disease", name, "HAS_SYMPTOM", "Symptom", symptom)
        dept = (record.get("cure_dept") or "").strip()
        if dept:
            self.merge_node("Department", dept)
            self.merge_edge("Disease", name, "BELONGS_TO_DEPT", "Department", dept)
        for drug in record.get("drug", []):
            self.merge_node("Drug", drug)
            self.merge_edge("Disease", name, "TREATED_BY", "Drug", drug)
        for compl in record.get("neopathy", []):
            self.merge_node("Disease", compl)
            self.merge_edge("Disease", name, "HAS_COMPLICATION", "Disease", compl)

    def load_medicine(self, record: dict[str, Any]) -> None:
        # neo4j_loader.py:166-178
        props = {
            key: record.get(key)
            for key in (
                "name", "category_code", "subcategory_name", "dosage",
                "reimbursement_category",
            )
        }
        self.merge_node("Drug", props["name"], props)

    def load_nursing_home(self, record: dict[str, Any]) -> None:
        # neo4j_loader.py:192-213 — blank-name rows dropped, CN→EN rename
        name = record.get("名称")
        if not name or not name.strip():
            return
        props = {
            "name": name.strip(),
            "city": record.get("城市"),
            "nature": record.get("性质"),
            "beds": record.get("床位"),
            "price": record.get("价格(元/月)"),
            "address": record.get("地址"),
            "services": record.get("特色服务"),
        }
        self.merge_node("NursingHome", props["name"], props)

    def load_insurance(self, record: dict[str, Any]) -> None:
        # neo4j_loader.py:228-266
        props = {
            "name": record.get("产品名称"),
            "category": record.get("险种分类"),
            "company": record.get("承保公司"),
            "age_limit": record.get("承保年龄"),
            "duration": record.get("保障期限"),
            "price_desc": record.get("价格"),
            "description": record.get("产品描述", ""),
        }
        name = props["name"]
        self.merge_node("Insurance", name, props)
        age_limit = props["age_limit"]
        description = props["description"] or ""
        # CONTAINS on null is null (falsy) in Cypher; '60' quirk preserved —
        # it also matches 160/360周岁 (neo4j_loader.py:249).
        if age_limit and ("老年" in age_limit or "60" in age_limit):
            self.merge_node("Population", "老年人")
            self.merge_edge("Insurance", name, "TARGETS_POPULATION", "Population", "老年人")
        if "高血压" in description:
            self.merge_node("Disease", "高血压")
            self.merge_edge("Insurance", name, "COVERS_DISEASE", "Disease", "高血压")
        if "糖尿病" in description:
            self.merge_node("Disease", "糖尿病")
            self.merge_edge("Insurance", name, "COVERS_DISEASE", "Disease", "糖尿病")
        if "癌症" in description or "恶性肿瘤" in description:
            self.merge_node("Disease", "恶性肿瘤")
            self.merge_edge("Insurance", name, "COVERS_DISEASE", "Disease", "恶性肿瘤")

    def load_policy_text(self, spans: list[dict[str, Any]]) -> None:
        # text_graph_builder.py:71-91 — per-triple dynamic-label MERGE;
        # media spans never yield heads/tails.
        for span in spans:
            if span["kind"] == MEDIA_KIND:
                continue
            for t in clause_triples(span["text"]):
                self.merge_node(t["type"], t["head"])
                self.merge_node(t["tail_type"], t["tail"])
                self.merge_edge(
                    t["type"], t["head"], t["relation"], t["tail_type"], t["tail"]
                )

    # -- corpus driver ------------------------------------------------------

    def build_from_docs(self, docs: Iterable[dict[str, Any]]) -> "GraphOracle":
        """Process a span-doc corpus in reference order: kinds in SRC_RANK
        order, docs within a kind in doc_id order."""
        docs = list(docs)
        unknown = {doc_kind(d["doc_id"]) for d in docs} - set(SRC_RANK)
        if unknown:
            raise ValueError(f"unknown doc kind(s): {sorted(unknown)}")
        ordered = sorted(
            docs, key=lambda d: (SRC_RANK[doc_kind(d["doc_id"])], d["doc_id"])
        )
        for doc in ordered:
            kind = doc_kind(doc["doc_id"])
            if kind == "policy_text":
                self.load_policy_text(doc["spans"])
                continue
            record = decode_doc(doc["doc_id"], doc["spans"])
            if kind == "disease":
                self.load_disease(record)
            elif kind == "medicine":
                self.load_medicine(record)
            elif kind == "nursing_home":
                self.load_nursing_home(record)
            elif kind == "insurance":
                self.load_insurance(record)
            else:
                raise ValueError(f"unknown doc kind: {kind}")
        return self

    # -- outputs ------------------------------------------------------------

    def nodes_table(self) -> pa.Table:
        rows = sorted(self.nodes.items())
        return pa.Table.from_pydict(
            {
                "label": [label for (label, _), _ in rows],
                "name": [name for (_, name), _ in rows],
                "props": [
                    json.dumps(props, ensure_ascii=False, sort_keys=True)
                    for _, props in rows
                ],
            },
            schema=NODES_SCHEMA,
        )

    def edges_table(self) -> pa.Table:
        rows = sorted(self.edges)
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return pa.Table.from_pydict(
            dict(zip(EDGES_SCHEMA.names, [list(c) for c in cols])),
            schema=EDGES_SCHEMA,
        )

    def triples(self) -> set[tuple[str, str, str]]:
        return {
            (f"{sl}:{sn}", rel, f"{dl}:{dn}")
            for (sl, sn, rel, dl, dn) in self.edges
        }

    def triples_table(self) -> pa.Table:
        rows = sorted(self.triples())
        cols = list(zip(*rows)) if rows else [[], [], []]
        return pa.Table.from_pydict(
            dict(zip(TRIPLES_SCHEMA.names, [list(c) for c in cols])),
            schema=TRIPLES_SCHEMA,
        )


def precision_recall(
    predicted: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    """P/R of emitted (subj, pred, obj) triples vs the oracle (the
    BASELINE.json correctness gate: both ≥ 0.95; we target 1.0)."""
    if not predicted:
        return (0.0 if expected else 1.0, 0.0 if expected else 1.0)
    tp = len(predicted & expected)
    return tp / len(predicted), tp / len(expected) if expected else 1.0
