"""Span codec: offset arithmetic, round-trip, and the per-row invariant
(span-sequence equality on (kind, text, media_ref, order))."""

import pyarrow as pa
import pytest

from knowledge_graph_construction_ray import spanenc
from knowledge_graph_construction_ray.fixtures import generate_corpus
from knowledge_graph_construction_ray.schema import DOCS_SCHEMA, MEDIA_KIND


def test_offset_arithmetic_text_only():
    spans = spanenc.encode_record(
        "insurance",
        {"产品名称": "保00号", "险种分类": "医疗险", "产品描述": "描述文本"},
    )
    assert [s["kind"] for s in spans] == ["产品名称", "险种分类", "产品描述"]
    assert [s["offset"] for s in spans] == [0, 5, 9]  # len+1 running totals
    spanenc.check_offsets(spans)


def test_media_spans_do_not_advance_offsets():
    rec = {"title": "条款", "clauses": ["甲对乙提供保障。", "仅供参考。", "丙拒保丁。"]}
    spans = spanenc.encode_record("policy_text", rec, doc_key="7")
    kinds = [s["kind"] for s in spans]
    # media inserted after every 2nd clause
    assert kinds == ["title", "clause", "clause", MEDIA_KIND, "clause"]
    media = spans[3]
    assert media["media_ref"] == "media://policy/7/0"
    assert media["text"] == ""
    # media carries the running offset; the next text span has the SAME offset
    assert media["offset"] == spans[4]["offset"]
    spanenc.check_offsets(spans)
    assert spanenc.doc_text(spans) == "条款\n甲对乙提供保障。\n仅供参考。\n丙拒保丁。"


def test_check_offsets_rejects_broken_sequence():
    spans = spanenc.encode_record("medicine", {"name": "药剂100", "dosage": "1片/日"})
    spans[1]["offset"] = 999
    with pytest.raises(ValueError):
        spanenc.check_offsets(spans)


def test_roundtrip_every_kind_in_fixture_corpus(fixture_corpus):
    """decode(encode(record)) == record view, and every doc satisfies the
    offset invariant — for all 5 record kinds including media interleaving."""
    assert fixture_corpus.schema.equals(DOCS_SCHEMA)
    docs = fixture_corpus.to_pylist()
    assert len(docs) == 40 + 380 + 48 + 16 + 8
    kinds_seen = set()
    for doc in docs:
        kinds_seen.add(doc["doc_id"].split(":")[0])
        spanenc.check_offsets(doc["spans"])
        sig = spanenc.span_signature(doc["spans"])
        # re-encode the decoded record: for non-policy kinds this must give
        # the identical signature (policy docs round-trip via signature only,
        # their media positions are generator-owned)
        if not doc["doc_id"].startswith("policy_text"):
            rec = spanenc.decode_doc(doc["doc_id"], doc["spans"])
            re_spans = spanenc.encode_record(doc["doc_id"].split(":")[0], rec)
            assert spanenc.span_signature(re_spans) == sig, doc["doc_id"]
    assert kinds_seen == {"disease", "medicine", "nursing_home", "insurance", "policy_text"}


def test_absent_fields_emit_no_span():
    spans = spanenc.encode_record("disease", {"name": "病症001", "icd_code": None})
    assert [s["kind"] for s in spans] == ["name"]


def test_corpus_is_deterministic():
    a = generate_corpus()
    b = generate_corpus()
    assert a.equals(b)


def test_replicated_corpus_mutates_deterministically():
    from knowledge_graph_construction_ray.fixtures import generate_replicated

    t = generate_replicated(2)
    assert t.num_rows == 2 * 492
    ids = t.column("doc_id").to_pylist()
    assert len(set(ids)) == t.num_rows  # re-suffixed doc ids stay unique
    assert generate_replicated(2).equals(t)
