"""Arrow schemas, record-kind registry and ontology for the KG engine.

The input contract (BASELINE.json input_hint) is one table of interleaved
text + media documents::

    doc_id : string                  # "{kind}:{row_index:06d}"
    spans  : list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Each reference record kind (diseases / medicines / nursing homes / insurance
products / raw policy text — see /root/reference/insurance_medical_kgqa/src/
kg_construction/neo4j_loader.py:79-269 and text_graph_builder.py:93-111) is
deterministically span-encoded per FIXTURES.md §2.  The per-row invariant the
whole pipeline preserves is span-sequence equality on
``(kind, text, media_ref, order)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# Core Arrow schemas
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Unified "graph element" stream emitted by the extract stages.  One wide
# schema for both nodes and edges keeps extraction single-pass (one
# map_batches emits both element kinds); the merge phase groups on
# ``merge_key`` and the materialize phase splits on ``kind``.
#
# ``props`` holds a *tagged* JSON property map {key: [src_rank, seq, value]}
# so that the upsert fold (Cypher `MERGE … SET n += props` last-writer-wins
# with null-deletion, neo4j_loader.py:122-123) is a commutative,
# associative per-key max-by-lineage merge — safe under combiners, salting
# and arbitrary shuffle splits.
ELEMENTS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'node' | 'edge'
        ("label", pa.string()),  # node label (null for edges)
        ("name", pa.string()),  # node name (null for edges)
        ("props", pa.string()),  # tagged-JSON props (nodes; '{}' for stubs)
        ("src_label", pa.string()),
        ("src_name", pa.string()),
        ("rel", pa.string()),
        ("dst_label", pa.string()),
        ("dst_name", pa.string()),
        ("src_rank", pa.int32()),  # source-order lineage (see SRC_RANK)
        ("seq", pa.int64()),  # row index within source
        ("merge_key", pa.string()),  # precomputed shuffle key
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("label", pa.string()),
        ("name", pa.string()),
        ("props", pa.string()),  # plain JSON {key: value}, nulls stripped
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src_label", pa.string()),
        ("src_name", pa.string()),
        ("rel", pa.string()),
        ("dst_label", pa.string()),
        ("dst_name", pa.string()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),  # "{src_label}:{src_name}"
        ("pred", pa.string()),
        ("obj", pa.string()),  # "{dst_label}:{dst_name}"
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("offset", pa.int32()),  # char offset of the mention in the doc text
        ("surface", pa.string()),
        ("label", pa.string()),
    ]
)

EXTRACTED_TRIPLES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("offset", pa.int32()),
        ("head", pa.string()),
        ("head_type", pa.string()),
        ("relation", pa.string()),
        ("tail", pa.string()),
        ("tail_type", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# Record-kind registry (span encodings, FIXTURES.md §2)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RecordKind:
    """Span encoding + graph projection rules for one record kind.

    ``span_order``: canonical field order; a trailing ``*`` marks a list
    field (one span per element), ``?`` an optional field (only emitted when
    present).  Absent/null fields emit no span.

    ``prop_kinds``: the property keys the loader projects with ``dict.get``
    — these are *always* written into the node property map (null when the
    span is absent) so that the Cypher ``SET n += props`` null-deletion
    semantics are reproducible (neo4j_loader.py:92-103, 166-172, 198-206,
    228-236; SURVEY.md §1.4).
    """

    kind: str
    label: str
    span_order: tuple[str, ...]
    prop_kinds: tuple[str, ...]
    # mapping from span kind -> node property key (identity when omitted)
    prop_rename: dict[str, str] = field(default_factory=dict)


DISEASE = RecordKind(
    kind="disease",
    label="Disease",
    span_order=(
        "id", "icd_code", "name", "intro", "get_prob", "cure_dept",
        "easy_get", "get_way", "neopathy*", "drug*", "cause", "prevent",
        "symptom*", "treat_detail", "nursing",
    ),
    # neo4j_loader.py:92-103 — 10 scalar props; cure_dept/id are NOT props.
    prop_kinds=(
        "name", "icd_code", "intro", "get_prob", "easy_get", "get_way",
        "cause", "prevent", "nursing", "treat_detail",
    ),
)

MEDICINE = RecordKind(
    kind="medicine",
    label="Drug",
    span_order=(
        "id", "name", "sheet", "reimbursement_category", "category_code",
        "category_name", "subcategory_code", "subcategory_name",
        "all_category_codes*", "dosage", "note?", "payment_standard*?",
        "validity_period?",
    ),
    # neo4j_loader.py:166-172 — only 5 fields are projected.
    prop_kinds=(
        "name", "category_code", "subcategory_name", "dosage",
        "reimbursement_category",
    ),
)

NURSING_HOME = RecordKind(
    kind="nursing_home",
    label="NursingHome",
    span_order=("城市", "名称", "性质", "床位", "价格(元/月)", "特色服务", "地址"),
    # neo4j_loader.py:198-206 — Chinese→English rename; name is stripped and
    # rows with empty/blank 名称 are dropped (193-195).
    prop_kinds=("名称", "城市", "性质", "床位", "价格(元/月)", "地址", "特色服务"),
    prop_rename={
        "名称": "name",
        "城市": "city",
        "性质": "nature",
        "床位": "beds",
        "价格(元/月)": "price",
        "地址": "address",
        "特色服务": "services",
    },
)

INSURANCE = RecordKind(
    kind="insurance",
    label="Insurance",
    span_order=("产品名称", "险种分类", "承保公司", "承保年龄", "保障期限", "产品描述", "价格"),
    # neo4j_loader.py:228-236 — rename; 产品描述 defaults to "" (never null).
    prop_kinds=("产品名称", "险种分类", "承保公司", "承保年龄", "保障期限", "价格", "产品描述"),
    prop_rename={
        "产品名称": "name",
        "险种分类": "category",
        "承保公司": "company",
        "承保年龄": "age_limit",
        "保障期限": "duration",
        "价格": "price_desc",
        "产品描述": "description",
    },
)

POLICY_TEXT = RecordKind(
    kind="policy_text",
    label="",  # produces dynamic-label nodes via extracted triples
    span_order=("title", "clause*"),
    prop_kinds=(),
)

RECORD_KINDS: dict[str, RecordKind] = {
    rk.kind: rk for rk in (DISEASE, MEDICINE, NURSING_HOME, INSURANCE, POLICY_TEXT)
}

# Source processing order (neo4j_loader.load_all, lines 74-77: diseases →
# drugs → nursing homes → insurances; the text pipeline runs after).  This is
# the major lineage key for the last-writer-wins upsert fold.
SRC_RANK: dict[str, int] = {
    "disease": 0,
    "medicine": 1,
    "nursing_home": 2,
    "insurance": 3,
    "policy_text": 4,
}

MEDIA_KIND = "media"


def doc_kind(doc_id: str) -> str:
    return doc_id.split(":", 1)[0]


def doc_seq(doc_id: str) -> int:
    return int(doc_id.split(":", 1)[1])


def make_doc_id(kind: str, idx: int) -> str:
    return f"{kind}:{idx:06d}"


# ---------------------------------------------------------------------------
# Ontology registry (reference: ontology_design.py:8-41 — the user-extension
# surface; text schema: text_graph_builder.py:33-43)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ontology:
    """Entity-type / relationship registry mirroring the reference's
    ``ontology_design.py`` accessor surface."""

    entity_types: dict[str, tuple[str, ...]]
    relationships: tuple[tuple[str, str, str], ...]  # (head_label, rel, tail_label)

    def get_entity_types(self) -> list[str]:
        return list(self.entity_types)

    def get_entity_props(self, label: str) -> tuple[str, ...]:
        return self.entity_types.get(label, ())

    def get_relationship_types(self) -> list[str]:
        return sorted({rel for _, rel, _ in self.relationships})

    def get_relationships(self) -> list[tuple[str, str, str]]:
        return list(self.relationships)

    def validate_edge(self, head_label: str, rel: str, tail_label: str) -> bool:
        return (head_label, rel, tail_label) in set(self.relationships)


# Graph ontology of the structured loaders (neo4j_loader.py:44-52, 120-147,
# 243-266).
RECORD_ONTOLOGY = Ontology(
    entity_types={
        "Disease": DISEASE.prop_kinds,
        "Drug": MEDICINE.prop_kinds,
        "Symptom": ("name",),
        "NursingHome": tuple(NURSING_HOME.prop_rename.values()),
        "Insurance": tuple(INSURANCE.prop_rename.values()),
        "Department": ("name",),
        "Population": ("name",),
    },
    relationships=(
        ("Disease", "HAS_SYMPTOM", "Symptom"),
        ("Disease", "BELONGS_TO_DEPT", "Department"),
        ("Disease", "TREATED_BY", "Drug"),
        ("Disease", "HAS_COMPLICATION", "Disease"),
        ("Insurance", "TARGETS_POPULATION", "Population"),
        ("Insurance", "COVERS_DISEASE", "Disease"),
    ),
)

# Schema the text extractor is constrained to (text_graph_builder.py:33-43).
TEXT_ONTOLOGY = Ontology(
    entity_types={
        "Insurance": ("name",),
        "Disease": ("name",),
        "AgeRange": ("name",),
        "Exclusion": ("name",),
    },
    relationships=(
        ("Insurance", "COVERS", "Disease"),
        ("Insurance", "EXCLUDES", "Exclusion"),
        ("Insurance", "ALLOWS_AGE", "AgeRange"),
        ("Insurance", "REFUSES_DISEASE", "Disease"),
    ),
)
