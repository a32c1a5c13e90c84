"""Raw reference-shaped inputs → span-doc table (the migration path).

A user of the reference system holds exactly these files
(IMK/DataCleaned/*): a diseases JSON list, the NESTED medicine JSON
(4 sheets → {categories, medicines}), a nursing-homes CSV with Chinese
headers, an insurance JSON list, and raw policy text.  These converters
turn each raw shape into records for the span codec and then one docs
table — after which every pipeline in this engine applies unchanged.

Semantics preserved per source operator:
* S2 sheet flatten (neo4j_loader.py:162-165): sheet order as in the JSON
  object, ``sheet`` recorded per medicine;
* S3 CSV (utf-8-sig headers, all columns present, empty cells = "");
* S5 text: title = first line, clauses = remaining non-empty lines, media
  spans interleaved by the codec's deterministic rule.
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any, Iterable

import pyarrow as pa

from ..spanenc import encode_docs_table
from .readers import read_json_tolerant_lines


def diseases_json_to_records(payload: str | list) -> list[dict[str, Any]]:
    """S1/S4: diseases JSON list (tolerant parse when given text)."""
    if isinstance(payload, str):
        return read_json_tolerant_lines(payload.splitlines())
    return list(payload)


def medicines_json_to_records(payload: str | dict) -> list[dict[str, Any]]:
    """S2: nested sheet dict → flat per-medicine records with ``sheet``
    (flatten order: sheets in JSON object order, medicines in list order —
    matching the reference's sequential loader and therefore the upsert
    lineage for duplicate names across sheets)."""
    data = json.loads(payload) if isinstance(payload, str) else payload
    out: list[dict[str, Any]] = []
    for sheet_name, content in data.items():
        for med in (content or {}).get("medicines", []):
            rec = dict(med)
            rec["sheet"] = sheet_name
            out.append(rec)
    return out


def nursing_csv_to_records(payload: str) -> list[dict[str, Any]]:
    """S3: CSV text (utf-8-sig tolerated) → records keyed by the Chinese
    headers the codec expects; blank-name rows are KEPT here (the extractor
    drops them, preserving the reference's division of labor)."""
    payload = payload.lstrip("﻿")
    return [dict(row) for row in csv.DictReader(io.StringIO(payload))]


def insurance_json_to_records(payload: str | list) -> list[dict[str, Any]]:
    if isinstance(payload, str):
        return json.loads(payload)
    return list(payload)


def policy_text_to_records(text: str) -> list[dict[str, Any]]:
    """S5: one raw policy text → one record {title, clauses} (first
    non-empty line is the title; remaining non-empty lines are clauses,
    text_graph_builder.py:96-101 consumes the same whole file)."""
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not lines:
        return []
    return [{"title": lines[0], "clauses": lines[1:]}]


def build_docs_table(
    *,
    diseases: Iterable[dict] = (),
    medicines: Iterable[dict] = (),
    nursing_homes: Iterable[dict] = (),
    insurances: Iterable[dict] = (),
    policy_texts: Iterable[dict] = (),
) -> pa.Table:
    """Assemble the full span-doc table from converted records (doc ids are
    per-kind sequential — the lineage order the upsert fold folds in)."""
    tables = []
    for kind, records in (
        ("disease", list(diseases)),
        ("medicine", list(medicines)),
        ("nursing_home", list(nursing_homes)),
        ("insurance", list(insurances)),
        ("policy_text", list(policy_texts)),
    ):
        if records:
            tables.append(encode_docs_table(kind, records))
    if not tables:
        return pa.Table.from_pydict(
            {"doc_id": [], "spans": []},
            schema=encode_docs_table("disease", []).schema,
        )
    return pa.concat_tables(tables)
