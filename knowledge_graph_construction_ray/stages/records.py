"""Record extraction: span-doc batches → graph-element batches.

Implements the reference's structured-loader semantics (operators M1-M6 of
SURVEY.md §2.2: neo4j_loader.py:89-147 disease projector + edge FOREACHes,
162-178 drug sheet flatten + projection, 192-213 nursing-home filter/rename,
227-266 insurance projection + rule edges) and the text-triple emission
(text_graph_builder.py:71-91) as ONE stateless, vectorized ``map_batches``
kernel over zero-copy Arrow batches.

The kernel is single-pass: each input batch of docs yields one Arrow batch of
unified graph *elements* (node rows with tagged property maps + edge rows),
ready for the merge shuffle.  Span regrouping is pure Arrow/numpy
(``list_parent_indices`` + flatten + boolean masks + fancy-index scatter);
the only per-row Python is JSON serialization of the property map and the
regex triple extraction for policy text.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ie_patterns import clause_triples
from ..schema import (
    DISEASE,
    ELEMENTS_SCHEMA,
    INSURANCE,
    MEDIA_KIND,
    MEDICINE,
    NURSING_HOME,
    SRC_RANK,
)

SEP = "\x1f"


def node_merge_key(label: str, name: str) -> str:
    return f"N{SEP}{label}{SEP}{name}"


def edge_merge_key(sl: str, sn: str, rel: str, dl: str, dn: str) -> str:
    return f"E{SEP}{sl}{SEP}{sn}{SEP}{rel}{SEP}{dl}{SEP}{dn}"


class _Out:
    """Column accumulator for the unified elements batch."""

    def __init__(self) -> None:
        self.cols: dict[str, list[Any]] = {name: [] for name in ELEMENTS_SCHEMA.names}

    def node(self, label: str, name: str, props: str, rank: int, seq: int) -> None:
        c = self.cols
        c["kind"].append("node")
        c["label"].append(label)
        c["name"].append(name)
        c["props"].append(props)
        c["src_label"].append(None)
        c["src_name"].append(None)
        c["rel"].append(None)
        c["dst_label"].append(None)
        c["dst_name"].append(None)
        c["src_rank"].append(rank)
        c["seq"].append(seq)
        c["merge_key"].append(node_merge_key(label, name))

    def edge(
        self, sl: str, sn: str, rel: str, dl: str, dn: str, rank: int, seq: int
    ) -> None:
        c = self.cols
        c["kind"].append("edge")
        c["label"].append(None)
        c["name"].append(None)
        c["props"].append(None)
        c["src_label"].append(sl)
        c["src_name"].append(sn)
        c["rel"].append(rel)
        c["dst_label"].append(dl)
        c["dst_name"].append(dn)
        c["src_rank"].append(rank)
        c["seq"].append(seq)
        c["merge_key"].append(edge_merge_key(sl, sn, rel, dl, dn))
        # edge endpoints are MERGE-created stubs (outer-join-with-create,
        # neo4j_loader.py:126-147) — emit a bare node row for the dst; the
        # src stub is emitted by callers that have no props row for it.
        self.node(dl, dn, "{}", rank, seq)

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(self.cols, schema=ELEMENTS_SCHEMA)


def _scatter(
    ndocs: int,
    span_in_doc: np.ndarray,
    flat_kind: np.ndarray,
    flat_text: np.ndarray,
    parent: np.ndarray,
    kind: str,
) -> np.ndarray:
    """Scatter the (single) span of ``kind`` per doc into a doc-aligned
    object array (None where the doc has no such span)."""
    arr = np.full(ndocs, None, dtype=object)
    m = span_in_doc & (flat_kind == kind)
    arr[parent[m]] = flat_text[m]
    return arr


def _tagged_props(
    keys: tuple[str, ...],
    values: list[Any],
    rank: int,
    seq: int,
) -> str:
    """Tagged property map {key: [rank, seq, value]} — the commutative
    upsert-fold representation (see schema.ELEMENTS_SCHEMA docstring)."""
    return json.dumps(
        {k: [rank, seq, v] for k, v in zip(keys, values)},
        ensure_ascii=False,
    )


def extract_elements(batch: pa.Table, strict: bool = True) -> pa.Table:
    """The M1-M6 kernel: one docs batch → one elements batch.

    ``strict=True`` (default) fails fast on malformed docs whose identity
    span (``name``/``名称``/``产品名称``) is missing — the reference would
    silently drop the whole 1000-record Cypher batch on such rows
    (neo4j_loader.py:278-282); silent data loss is incompatible with the
    P/R gate, so we surface it.  ``strict=False`` emits null-name rows for
    inspection pipelines."""
    batch = batch.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()

    split = pc.split_pattern(doc_ids, pattern=":")
    kind_np = pc.list_element(split, 0).to_numpy(zero_copy_only=False)
    seq_np = pc.cast(pc.list_element(split, 1), pa.int64()).to_numpy()

    doc_np = doc_ids.to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(spans).to_numpy()
    flat = spans.flatten()
    flat_kind = flat.field("kind").to_numpy(zero_copy_only=False)
    flat_text = flat.field("text").to_numpy(zero_copy_only=False)

    ndocs = len(batch)
    out = _Out()

    for kind in np.unique(kind_np):
        is_doc = kind_np == kind
        span_in = is_doc[parent] if len(parent) else np.zeros(0, dtype=bool)
        rank = SRC_RANK[kind]

        if kind == "disease":
            _extract_disease(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np)
        elif kind == "medicine":
            _extract_medicine(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np)
        elif kind == "nursing_home":
            _extract_nursing(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank)
        elif kind == "insurance":
            _extract_insurance(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np)
        elif kind == "policy_text":
            _extract_policy(out, span_in, flat_kind, flat_text, parent, seq_np, rank)
        else:
            raise ValueError(f"unknown doc kind: {kind}")

    return out.table()


def _list_edges(
    out: _Out,
    span_kind: str,
    rel: str,
    dst_label: str,
    names: np.ndarray,
    span_in: np.ndarray,
    flat_kind: np.ndarray,
    flat_text: np.ndarray,
    parent: np.ndarray,
    seq_np: np.ndarray,
    rank: int,
) -> None:
    """One edge per element of a list field (FOREACH semantics,
    neo4j_loader.py:126-147) — fully vectorized selection."""
    m = span_in & (flat_kind == span_kind)
    if not m.any():
        return
    p = parent[m]
    for src, dst, seq in zip(names[p], flat_text[m], seq_np[p]):
        out.edge("Disease", src, rel, dst_label, dst, rank, int(seq))


def _check_names(strict: bool, names, sel, doc_np) -> None:
    """Fail fast on identity-less records (see extract_elements docstring);
    nursing homes are exempt — blank 名称 rows are silently dropped by the
    reference itself (neo4j_loader.py:193-195)."""
    if not strict:
        return
    bad = [str(doc_np[i]) for i in sel if names[i] is None]
    if bad:
        raise ValueError(f"docs missing identity span: {bad[:10]}")


def _extract_disease(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np):
    sel = np.nonzero(is_doc)[0]
    if not len(sel):
        return
    scat = {
        k: _scatter(ndocs, span_in, flat_kind, flat_text, parent, k)
        for k in DISEASE.prop_kinds + ("cure_dept",)
    }
    names = scat["name"]
    _check_names(strict, names, sel, doc_np)
    for i in sel:
        seq = int(seq_np[i])
        out.node(
            "Disease",
            names[i],
            _tagged_props(DISEASE.prop_kinds, [scat[k][i] for k in DISEASE.prop_kinds], rank, seq),
            rank,
            seq,
        )
        dept = (scat["cure_dept"][i] or "").strip()
        if dept:
            out.edge("Disease", names[i], "BELONGS_TO_DEPT", "Department", dept, rank, seq)
    _list_edges(out, "symptom", "HAS_SYMPTOM", "Symptom", names, span_in, flat_kind, flat_text, parent, seq_np, rank)
    _list_edges(out, "drug", "TREATED_BY", "Drug", names, span_in, flat_kind, flat_text, parent, seq_np, rank)
    _list_edges(out, "neopathy", "HAS_COMPLICATION", "Disease", names, span_in, flat_kind, flat_text, parent, seq_np, rank)


def _extract_medicine(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np):
    sel = np.nonzero(is_doc)[0]
    if not len(sel):
        return
    scat = {
        k: _scatter(ndocs, span_in, flat_kind, flat_text, parent, k)
        for k in MEDICINE.prop_kinds
    }
    _check_names(strict, scat["name"], sel, doc_np)
    for i in sel:
        seq = int(seq_np[i])
        out.node(
            "Drug",
            scat["name"][i],
            _tagged_props(MEDICINE.prop_kinds, [scat[k][i] for k in MEDICINE.prop_kinds], rank, seq),
            rank,
            seq,
        )


def _extract_nursing(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank):
    sel = np.nonzero(is_doc)[0]
    if not len(sel):
        return
    scat = {
        k: _scatter(ndocs, span_in, flat_kind, flat_text, parent, k)
        for k in NURSING_HOME.prop_kinds
    }
    out_keys = tuple(NURSING_HOME.prop_rename[k] for k in NURSING_HOME.prop_kinds)
    for i in sel:
        name = scat["名称"][i]
        if not name or not name.strip():  # blank-name rows dropped (M3)
            continue
        seq = int(seq_np[i])
        values = [name.strip()] + [scat[k][i] for k in NURSING_HOME.prop_kinds[1:]]
        out.node("NursingHome", name.strip(), _tagged_props(out_keys, values, rank, seq), rank, seq)


def _extract_insurance(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank, strict, doc_np):
    sel = np.nonzero(is_doc)[0]
    if not len(sel):
        return
    scat = {
        k: _scatter(ndocs, span_in, flat_kind, flat_text, parent, k)
        for k in INSURANCE.prop_kinds
    }
    _check_names(strict, scat["产品名称"], sel, doc_np)
    out_keys = tuple(INSURANCE.prop_rename[k] for k in INSURANCE.prop_kinds)
    for i in sel:
        name = scat["产品名称"][i]
        seq = int(seq_np[i])
        desc = scat["产品描述"][i]
        desc = "" if desc is None else desc  # description defaults "" (M4)
        values = [scat[k][i] for k in INSURANCE.prop_kinds[:-1]] + [desc]
        out.node("Insurance", name, _tagged_props(out_keys, values, rank, seq), rank, seq)
        # M5 rule edges (neo4j_loader.py:249-266); CONTAINS-on-null is falsy;
        # the '60' quirk (matches 160/360周岁) is reference behavior.
        age = scat["承保年龄"][i]
        if age and ("老年" in age or "60" in age):
            out.edge("Insurance", name, "TARGETS_POPULATION", "Population", "老年人", rank, seq)
        if "高血压" in desc:
            out.edge("Insurance", name, "COVERS_DISEASE", "Disease", "高血压", rank, seq)
        if "糖尿病" in desc:
            out.edge("Insurance", name, "COVERS_DISEASE", "Disease", "糖尿病", rank, seq)
        if "癌症" in desc or "恶性肿瘤" in desc:
            out.edge("Insurance", name, "COVERS_DISEASE", "Disease", "恶性肿瘤", rank, seq)


def _extract_policy(out, span_in, flat_kind, flat_text, parent, seq_np, rank):
    # Schema-constrained triple extraction over text spans; media spans are
    # skipped but offsets stay aligned (media_ref-aware span alignment).
    m = span_in & (flat_kind != MEDIA_KIND)
    if not m.any():
        return
    p = parent[m]
    for text, seq in zip(flat_text[m], seq_np[p]):
        for t in clause_triples(text):
            # head has no props row of its own → emit its stub too
            out.node(t["type"], t["head"], "{}", rank, int(seq))
            out.edge(
                t["type"], t["head"], t["relation"], t["tail_type"], t["tail"],
                rank, int(seq),
            )
