"""Property-based tests (hypothesis): codec round-trip/offset invariants
and merge-fold commutativity under arbitrary splits — the two invariants
the whole engine rests on."""

import json

import pandas as pd
from hypothesis import given, settings, strategies as st

from knowledge_graph_construction_ray import spanenc
from knowledge_graph_construction_ray.merge import fold_frame
from knowledge_graph_construction_ray.stages.records import extract_elements, node_merge_key

# CJK-ish + latin text without the reserved separator characters
_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x1f\x1e",
    ),
    min_size=0, max_size=40,
)
_name = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x1f\x1e:"),
    min_size=1, max_size=20,
).map(str.strip).filter(lambda s: s)


@st.composite
def disease_records(draw):
    rec = {"name": draw(_name)}
    for field in ("icd_code", "intro", "get_prob", "easy_get", "get_way",
                  "cause", "prevent", "nursing", "treat_detail", "cure_dept"):
        if draw(st.booleans()):
            rec[field] = draw(_text)
    for field in ("symptom", "drug", "neopathy"):
        if draw(st.booleans()):
            rec[field] = draw(st.lists(_name, min_size=1, max_size=4))
    return rec


@settings(max_examples=200, deadline=None)
@given(disease_records())
def test_codec_roundtrip_and_offsets(rec):
    spans = spanenc.encode_record("disease", rec)
    spanenc.check_offsets(spans)  # offset arithmetic always holds
    decoded = spanenc.decode_doc("disease:000000", spans)
    re_spans = spanenc.encode_record("disease", decoded)
    # the invariant: span-sequence equality on (kind, text, media_ref, order)
    assert spanenc.span_signature(re_spans) == spanenc.span_signature(spans)


@st.composite
def policy_records(draw):
    return {
        "title": draw(_text),
        "clauses": draw(st.lists(_text, min_size=0, max_size=6)),
    }


@settings(max_examples=100, deadline=None)
@given(policy_records(), st.integers(min_value=0, max_value=999))
def test_policy_media_interleaving_invariant(rec, key):
    spans = spanenc.encode_record("policy_text", rec, doc_key=str(key))
    spanenc.check_offsets(spans)
    text_spans = [s for s in spans if s["kind"] != "media"]
    media_spans = [s for s in spans if s["kind"] == "media"]
    # one media span after every 2nd clause
    assert len(media_spans) == len(rec["clauses"]) // 2
    # doc text is exactly the '\n'-join of text spans, media contributes 0
    assert spanenc.doc_text(spans) == "\n".join(s["text"] for s in text_spans)


@st.composite
def element_rows(draw):
    """Random node rows across a small key space with tagged props."""
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        name = draw(st.sampled_from(["甲", "乙", "丙"]))
        rank = draw(st.integers(min_value=0, max_value=3))
        seq = draw(st.integers(min_value=0, max_value=50))
        props = {
            k: [rank, seq, draw(st.one_of(st.none(), st.integers(0, 9).map(str)))]
            for k in draw(st.sets(st.sampled_from(["p", "q", "r"]), min_size=0, max_size=3))
        }
        rows.append(
            {
                "kind": "node", "label": "Disease", "name": name,
                "props": json.dumps(props, ensure_ascii=False),
                "src_label": None, "src_name": None, "rel": None,
                "dst_label": None, "dst_name": None,
                "src_rank": rank, "seq": seq,
                "merge_key": node_merge_key("Disease", name),
            }
        )
    return pd.DataFrame(rows)


def _final_props(df: pd.DataFrame) -> dict:
    out = {}
    for r in df.itertuples():
        merged = json.loads(r.props)
        out[r.name] = {k: v for k, (_, _, v) in ((k, t) for k, t in merged.items())}
    return out


@settings(max_examples=150, deadline=None)
@given(element_rows(), st.integers(min_value=1, max_value=5))
def test_fold_commutative_under_arbitrary_splits(df, nsplits):
    """fold(all rows) == fold(concat(fold(split_i))) for ANY partitioning —
    the property that makes combiners, salting and shuffle splits exact."""
    whole = _final_props(fold_frame(df))
    parts = [df.iloc[i::nsplits] for i in range(nsplits)]
    refolded = fold_frame(
        pd.concat([fold_frame(p) for p in parts], ignore_index=True)
    )
    assert _final_props(refolded) == whole


def test_tagged_props_batch_matches_json_dumps():
    """The fast batched props encoder must be byte-identical to the per-doc
    json.dumps representation, including escaping edge cases."""
    from knowledge_graph_construction_ray.stages.records import (
        _tagged_props,
        _tagged_props_batch,
    )

    keys = ("a", "b", "c")
    cols = [
        ["plain", 'quo"te', None],
        ["换行\n文本", "", "tab\tval"],
        [None, "中文 text", "back\\slash\x01ctl"],
    ]
    seqs = [3, 7, 11]
    batch = _tagged_props_batch(keys, cols, 2, seqs)
    for i, s in enumerate(seqs):
        assert batch[i] == _tagged_props(keys, [c[i] for c in cols], 2, s)


# ---------------------------------------------------------------------------
# MinHash/SimHash batch-kernel properties (vectorized in round 3)
# ---------------------------------------------------------------------------

_doc = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x1f\x1e"),
    min_size=0,
    max_size=120,
)


@given(st.lists(_doc, min_size=1, max_size=30), st.integers(1, 29))
@settings(max_examples=50, deadline=None)
def test_minhash_signatures_batch_split_invariant(docs, cut):
    """A doc's signature must not depend on how the corpus is batched —
    computing sigs over the whole list equals computing them over any
    two-way split (block boundaries are arbitrary in Ray)."""
    import numpy as np

    from knowledge_graph_construction_ray.stages.dedupe import (
        minhash_signatures_batch,
    )

    cut = min(cut, len(docs))
    whole = minhash_signatures_batch(docs)
    split = np.vstack(
        [minhash_signatures_batch(docs[:cut]), minhash_signatures_batch(docs[cut:])]
    ) if cut < len(docs) else minhash_signatures_batch(docs)
    assert (whole == split).all()


@given(_doc)
@settings(max_examples=50, deadline=None)
def test_identical_docs_collide_in_every_band(doc):
    """Two byte-identical docs must share every band hash (LSH recall on
    exact duplicates is 1 by construction)."""
    from knowledge_graph_construction_ray.stages.dedupe import (
        band_hashes,
        minhash_signatures_batch,
    )

    sigs = minhash_signatures_batch([doc, doc])
    bh = band_hashes(sigs)
    assert (bh[0] == bh[1]).all()


@given(st.lists(_doc, min_size=1, max_size=20), st.integers(1, 19))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_split_invariant(docs, cut):
    import numpy as np

    from knowledge_graph_construction_ray.stages.dedupe import simhash_batch

    cut = min(cut, len(docs))
    whole = simhash_batch(docs)
    if cut < len(docs):
        split = np.concatenate(
            [simhash_batch(docs[:cut]), simhash_batch(docs[cut:])]
        )
    else:
        split = simhash_batch(docs)
    assert (whole == split).all()
