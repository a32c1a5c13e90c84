"""Record ⇄ span-sequence codec ("the reference loader").

Implements the deterministic span encoding of each reference record kind
(FIXTURES.md §2) and the per-row invariant every pipeline stage must
preserve: span-sequence equality on ``(kind, text, media_ref, order)``.

Offset arithmetic (FIXTURES.md §1): walking spans in order, ``offset[i]`` is
the running total of ``len(text[j]) + 1`` over all preceding *text* spans j
(the ``+1`` is the '\\n' joiner).  Media spans carry the current offset and
contribute 0 characters — media interleaving is observable without
disturbing text alignment.
"""

from __future__ import annotations

from typing import Any, Iterable

import pyarrow as pa

from .schema import (
    DOCS_SCHEMA,
    MEDIA_KIND,
    POLICY_TEXT,
    RECORD_KINDS,
    make_doc_id,
)

Span = dict[str, Any]  # {"kind", "text", "media_ref", "offset"}


def _parse_field(spec: str) -> tuple[str, bool, bool]:
    """'name' / 'name*' / 'name?' / 'name*?' → (name, is_list, is_optional)."""
    is_opt = spec.endswith("?")
    if is_opt:
        spec = spec[:-1]
    is_list = spec.endswith("*")
    if is_list:
        spec = spec[:-1]
    return spec, is_list, is_opt


def text_span(kind: str, text: str, offset: int) -> Span:
    return {"kind": kind, "text": text, "media_ref": "", "offset": offset}


def media_span(media_ref: str, offset: int) -> Span:
    return {"kind": MEDIA_KIND, "text": "", "media_ref": media_ref, "offset": offset}


def encode_record(kind: str, record: dict[str, Any], doc_key: str = "") -> list[Span]:
    """Span-encode one source record.

    ``record`` maps field name → str (scalar) or list[str] (list fields).
    Absent / ``None`` fields emit no span (matching the reference's dynamic
    property bags, neo4j_loader.py:92-103).  ``policy_text`` records are
    ``{"title": str, "clauses": [str, ...]}`` and get a deterministic media
    span interleaved after every 2nd clause (FIXTURES.md §2.5), with
    ``media_ref = f"media://policy/{doc_key}/{k}"``.
    """
    rk = RECORD_KINDS[kind]
    spans: list[Span] = []
    offset = 0

    def emit_text(field_kind: str, value: str) -> None:
        nonlocal offset
        spans.append(text_span(field_kind, value, offset))
        offset += len(value) + 1

    if kind == POLICY_TEXT.kind:
        title = record.get("title")
        if title is not None:
            emit_text("title", str(title))
        media_count = 0
        for i, clause in enumerate(record.get("clauses") or []):
            emit_text("clause", str(clause))
            if (i + 1) % 2 == 0:
                spans.append(
                    media_span(f"media://policy/{doc_key}/{media_count}", offset)
                )
                media_count += 1
        return spans

    for spec in rk.span_order:
        name, is_list, _ = _parse_field(spec)
        value = record.get(name)
        if value is None:
            continue
        if is_list:
            for element in value:
                emit_text(name, str(element))
        else:
            emit_text(name, str(value))
    return spans


def decode_doc(doc_id: str, spans: Iterable[Span]) -> dict[str, Any]:
    """Reconstruct the record view of a span doc.

    Scalar span kinds → str; repeated kinds → list[str] in span order; media
    spans are skipped (they never contribute record fields).  This is the
    record view the graph extractors and the reference-semantics oracle
    consume.
    """
    kind = doc_id.split(":", 1)[0]
    rk = RECORD_KINDS.get(kind)
    list_fields = set()
    if rk is not None:
        for spec in rk.span_order:
            name, is_list, _ = _parse_field(spec)
            if is_list:
                list_fields.add(name)
    record: dict[str, Any] = {}
    for span in spans:
        k = span["kind"]
        if k == MEDIA_KIND:
            continue
        if k in list_fields:
            record.setdefault(k, []).append(span["text"])
        elif k in record:  # repeated unexpectedly → promote to list
            prev = record[k]
            record[k] = (prev if isinstance(prev, list) else [prev]) + [span["text"]]
        else:
            record[k] = span["text"]
    return record


def doc_text(spans: Iterable[Span]) -> str:
    """The doc's concatenated text: '\\n'-joined text spans (media excluded)."""
    return "\n".join(s["text"] for s in spans if s["kind"] != MEDIA_KIND)


def span_signature(spans: Iterable[Span]) -> list[tuple[str, str, str, int]]:
    """The invariant tuple sequence: (kind, text, media_ref, order)."""
    return [
        (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(spans)
    ]


def check_offsets(spans: Iterable[Span]) -> None:
    """Validate the offset arithmetic; raises ``ValueError`` on violation."""
    expected = 0
    for i, s in enumerate(spans):
        if s["offset"] != expected:
            raise ValueError(
                f"span {i} (kind={s['kind']!r}) has offset {s['offset']}, "
                f"expected {expected}"
            )
        if s["kind"] == MEDIA_KIND:
            if s["text"]:
                raise ValueError(f"media span {i} carries text")
            if not s["media_ref"]:
                raise ValueError(f"media span {i} missing media_ref")
        else:
            if s["media_ref"]:
                raise ValueError(f"text span {i} carries media_ref")
            expected += len(s["text"]) + 1


def encode_docs_table(
    kind: str,
    records: Iterable[dict[str, Any]],
    start_idx: int = 0,
) -> pa.Table:
    """Encode records of one kind into an Arrow docs table
    (``doc_id``, ``spans``) with doc ids ``{kind}:{idx:06d}``."""
    doc_ids: list[str] = []
    span_lists: list[list[Span]] = []
    for i, record in enumerate(records):
        doc_id = make_doc_id(kind, start_idx + i)
        doc_ids.append(doc_id)
        span_lists.append(encode_record(kind, record, doc_key=str(start_idx + i)))
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=DOCS_SCHEMA
    )


def docs_table_to_pylist(table: pa.Table) -> list[dict[str, Any]]:
    """Small-scale helper: docs table → [{'doc_id', 'spans': [span, ...]}]."""
    return table.to_pylist()
