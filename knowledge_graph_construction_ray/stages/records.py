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
import re
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
    """Column accumulator for the unified elements batch.

    Emission is BATCHED: callers hand over whole arrays per doc-kind and
    each of the 12 columns grows by one ``list.extend`` — the per-element
    ``append`` fan-out was the dominant UDF cost of the headline pipeline
    (round-1 profile: ~37% of kernel time in node()/edge() appends)."""

    def __init__(self) -> None:
        self.cols: dict[str, list[Any]] = {name: [] for name in ELEMENTS_SCHEMA.names}

    def nodes(self, label: str, names, props, rank: int, seqs) -> None:
        self.nodes_multilabel([label] * len(names), names, props, rank, seqs)

    def nodes_multilabel(self, labels, names, props, rank: int, seqs) -> None:
        n = len(names)
        if not n:
            return
        c = self.cols
        c["kind"].extend(["node"] * n)
        c["label"].extend(labels)
        c["name"].extend(names)
        c["props"].extend(props)
        none = [None] * n
        c["src_label"].extend(none)
        c["src_name"].extend(none)
        c["rel"].extend(none)
        c["dst_label"].extend(none)
        c["dst_name"].extend(none)
        c["src_rank"].extend([rank] * n)
        c["seq"].extend(seqs)
        c["merge_key"].extend(
            [node_merge_key(l, nm) for l, nm in zip(labels, names)]
        )

    def edges(self, sl: str, sns, rel: str, dl: str, dns, rank: int, seqs) -> None:
        """Edge rows + the dst MERGE-created stub nodes (outer-join-with-
        create, neo4j_loader.py:126-147); src stubs are emitted by callers
        that have no props row for them."""
        n = len(sns)
        self.edges_multi([sl] * n, sns, [rel] * n, [dl] * n, dns, rank, seqs)

    def edges_multi(self, sls, sns, rels, dls, dns, rank: int, seqs) -> None:
        """Fully array-typed edge emit (policy-text triples: every field
        varies per row) + dst stub nodes."""
        n = len(sns)
        if not n:
            return
        c = self.cols
        c["kind"].extend(["edge"] * n)
        none = [None] * n
        c["label"].extend(none)
        c["name"].extend(none)
        c["props"].extend(none)
        c["src_label"].extend(sls)
        c["src_name"].extend(sns)
        c["rel"].extend(rels)
        c["dst_label"].extend(dls)
        c["dst_name"].extend(dns)
        c["src_rank"].extend([rank] * n)
        c["seq"].extend(seqs)
        c["merge_key"].extend(
            [
                edge_merge_key(a, b, r, x, y)
                for a, b, r, x, y in zip(sls, sns, rels, dls, dns)
            ]
        )
        self.nodes_multilabel(dls, dns, ["{}"] * n, rank, seqs)

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


_NEEDS_JSON_ESC = re.compile(r'[\x00-\x1f"\\]')


def _enc_json_str(v) -> str:
    """Byte-identical to ``json.dumps(v, ensure_ascii=False)`` for str/None
    — the fast path skips the encoder entirely when no escaping is needed
    (the overwhelming majority of span texts)."""
    if v is None:
        return "null"
    if _NEEDS_JSON_ESC.search(v) is None:
        return f'"{v}"'
    return json.dumps(v, ensure_ascii=False)


def _tagged_props_batch(
    keys: tuple[str, ...],
    value_cols: list,
    rank: int,
    seqs,
) -> list[str]:
    """Vectorized ``_tagged_props`` over a doc batch: ``value_cols`` is one
    doc-aligned array per key.  Output strings are byte-identical to the
    per-doc ``json.dumps`` (same separators, same escaping) — asserted by
    the fast-encoder parity pytest."""
    encs = [[_enc_json_str(v) for v in col] for col in value_cols]
    return [
        "{"
        + ", ".join(
            f'"{k}": [{rank}, {s}, {e[i]}]' for k, e in zip(keys, encs)
        )
        + "}"
        for i, s in enumerate(seqs)
    ]


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
    neo4j_loader.py:126-147) — vectorized selection, one batched emit."""
    m = span_in & (flat_kind == span_kind)
    if not m.any():
        return
    p = parent[m]
    out.edges(
        "Disease", names[p].tolist(), rel, dst_label, flat_text[m].tolist(),
        rank, seq_np[p].tolist(),
    )


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
    seqs_sel = seq_np[sel].tolist()
    props = _tagged_props_batch(
        DISEASE.prop_kinds, [scat[k][sel] for k in DISEASE.prop_kinds], rank, seqs_sel
    )
    out.nodes("Disease", names[sel].tolist(), props, rank, seqs_sel)
    dept = scat["cure_dept"][sel]
    dmask = np.array([bool(d and d.strip()) for d in dept], dtype=bool)
    if dmask.any():
        out.edges(
            "Disease", names[sel][dmask].tolist(), "BELONGS_TO_DEPT", "Department",
            [d.strip() for d in dept[dmask]], rank, seq_np[sel][dmask].tolist(),
        )
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
    seqs_sel = seq_np[sel].tolist()
    props = _tagged_props_batch(
        MEDICINE.prop_kinds, [scat[k][sel] for k in MEDICINE.prop_kinds], rank, seqs_sel
    )
    out.nodes("Drug", scat["name"][sel].tolist(), props, rank, seqs_sel)


def _extract_nursing(out, is_doc, span_in, flat_kind, flat_text, parent, seq_np, ndocs, rank):
    sel = np.nonzero(is_doc)[0]
    if not len(sel):
        return
    scat = {
        k: _scatter(ndocs, span_in, flat_kind, flat_text, parent, k)
        for k in NURSING_HOME.prop_kinds
    }
    out_keys = tuple(NURSING_HOME.prop_rename[k] for k in NURSING_HOME.prop_kinds)
    raw = scat["名称"]
    keep = [i for i in sel if raw[i] and raw[i].strip()]  # blank-name rows dropped (M3)
    if not keep:
        return
    names_k = [raw[i].strip() for i in keep]
    seqs_k = seq_np[keep].tolist()
    value_cols = [names_k] + [scat[k][keep] for k in NURSING_HOME.prop_kinds[1:]]
    props = _tagged_props_batch(out_keys, value_cols, rank, seqs_k)
    out.nodes("NursingHome", names_k, props, rank, seqs_k)


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
    names_sel = scat["产品名称"][sel]
    seqs_arr = seq_np[sel]
    desc = ["" if d is None else d for d in scat["产品描述"][sel]]  # defaults "" (M4)
    value_cols = [scat[k][sel] for k in INSURANCE.prop_kinds[:-1]] + [desc]
    props = _tagged_props_batch(out_keys, value_cols, rank, seqs_arr.tolist())
    out.nodes("Insurance", names_sel.tolist(), props, rank, seqs_arr.tolist())
    # M5 rule edges (neo4j_loader.py:249-266); CONTAINS-on-null is falsy;
    # the '60' quirk (matches 160/360周岁) is reference behavior.
    age = scat["承保年龄"][sel]
    elder = np.array([bool(a and ("老年" in a or "60" in a)) for a in age], dtype=bool)
    if elder.any():
        out.edges(
            "Insurance", names_sel[elder].tolist(), "TARGETS_POPULATION",
            "Population", ["老年人"] * int(elder.sum()), rank, seqs_arr[elder].tolist(),
        )
    for kws, dis in ((("高血压",), "高血压"), (("糖尿病",), "糖尿病"),
                     (("癌症", "恶性肿瘤"), "恶性肿瘤")):
        mask = np.array([any(kw in d for kw in kws) for d in desc], dtype=bool)
        if mask.any():
            out.edges(
                "Insurance", names_sel[mask].tolist(), "COVERS_DISEASE",
                "Disease", [dis] * int(mask.sum()), rank, seqs_arr[mask].tolist(),
            )


def _extract_policy(out, span_in, flat_kind, flat_text, parent, seq_np, rank):
    # Schema-constrained triple extraction over text spans; media spans are
    # skipped but offsets stay aligned (media_ref-aware span alignment).
    m = span_in & (flat_kind != MEDIA_KIND)
    if not m.any():
        return
    p = parent[m]
    types, heads, rels, tail_types, tails, seqs = [], [], [], [], [], []
    for text, seq in zip(flat_text[m], seq_np[p]):
        s = int(seq)
        for t in clause_triples(text):
            types.append(t["type"])
            heads.append(t["head"])
            rels.append(t["relation"])
            tail_types.append(t["tail_type"])
            tails.append(t["tail"])
            seqs.append(s)
    # heads have no props row of their own → emit their stubs too (the
    # tail stubs come from edges_multi)
    out.nodes_multilabel(types, heads, ["{}"] * len(heads), rank, seqs)
    out.edges_multi(types, heads, rels, tail_types, tails, rank, seqs)
