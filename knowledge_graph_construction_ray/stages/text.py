"""Text IE stages: mention detection + schema-constrained triple extraction
with media_ref-aware span alignment (reference pipeline 3.2,
text_graph_builder.py:93-111; extractor surface entity_extraction.py:21-56).

Both stages are ``map_batches`` callables.  ``TextTripleExtractor`` is
stateless (compiled patterns are module-level).  ``MentionDetector`` is an
actor-pool class: the gazetteer (alias dictionary — the reference's planned
HanLP/BERT NER surface, entity_extraction.py:12-19, holds model state the
same way) is broadcast once with ``ray.put`` and the combined regex is
compiled once per actor in ``__init__``, then reused across batches.

Every emitted row carries ``(doc_id, span_idx, offset)`` provenance where
``offset`` is the character offset in the doc's concatenated text
('\n'-joined text spans).  Media spans are skipped but KEEP the running
offset consistent (they contribute 0 chars) — extractors never emit
heads/tails from media spans.
"""

from __future__ import annotations

import re
from typing import Any

import pyarrow as pa

from ..functions.ie_patterns import clause_triples
from ..schema import (
    EXTRACTED_TRIPLES_SCHEMA,
    MEDIA_KIND,
    MENTIONS_SCHEMA,
)


def _iter_text_spans(batch: pa.Table):
    """Yield (doc_id, span_idx, kind, text, offset) for non-media spans.

    Reads the list<struct> column through its FLATTENED child arrays
    (one ``to_pylist`` per child) instead of materializing a Python dict
    per span — at 2M docs the per-span dict construction was a measurable
    slice of both the mention-detection and extract kernels."""
    batch = batch.combine_chunks()
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = spans_col.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    offsets = flat.field("offset").to_pylist()
    # raw offsets of a SLICED ListArray don't start at 0 relative to
    # flatten()'s output — rebase on the first offset
    bounds = spans_col.offsets.to_pylist()
    base = bounds[0] if bounds else 0
    for i, doc_id in enumerate(doc_ids):
        lo = bounds[i] - base
        for pos in range(lo, bounds[i + 1] - base):
            kind = kinds[pos]
            if kind == MEDIA_KIND:
                continue
            yield doc_id, pos - lo, kind, texts[pos], offsets[pos]


def _span_arrays(batch: pa.Table):
    """Arrow-native batch prep for vectorized span kernels: media spans
    filter out in C, only the KEPT span texts become Python strings, and
    all provenance stays numpy / Arrow.

    Returns (texts, doc_idx, span_idx, offsets, doc_ids) where ``texts``
    is a list[str] of non-media span texts, the three arrays align with
    it (``doc_idx`` indexes into the batch's rows, ``span_idx`` counts
    positions among ALL spans of the doc including media, ``offsets`` is
    the concatenated-text char offset), and ``doc_ids`` is the batch's
    Arrow doc_id column (gather it with ``pc.take`` — doc ids never
    round-trip through Python).  ``_iter_text_spans`` measured as 92% of
    the mention kernel once the DFA scan vectorized; the ``to_pylist``
    of every span child was the cost."""
    import numpy as np
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    doc_ids = batch.column("doc_id")
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = spans_col.flatten()
    bounds = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    bounds = bounds - bounds[0]  # sliced ListArray offsets don't start at 0
    counts = np.diff(bounds)
    n_spans = int(bounds[-1]) if len(bounds) else 0
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    span_idx = np.arange(n_spans, dtype=np.int64) - np.repeat(
        bounds[:-1], counts
    )
    keep = pc.not_equal(flat.field("kind"), MEDIA_KIND).to_numpy(
        zero_copy_only=False
    )
    offsets = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    kidx = np.flatnonzero(keep)
    texts = flat.field("text").take(pa.array(kidx)).to_pylist()
    return texts, doc_idx[kidx], span_idx[kidx], offsets[kidx], doc_ids


def extract_text_triples(batch: pa.Table) -> pa.Table:
    """Stateless kernel: policy-text docs → provenance-carrying triples
    (the deterministic A2 extractor; same output contract as the reference's
    LLM extractor, text_graph_builder.py:50-54).  Batch prep via
    ``_span_arrays`` (Arrow-native media filter + numpy provenance);
    only the clause regexes and the per-hit appends stay Python."""
    cols: dict[str, list[Any]] = {n: [] for n in EXTRACTED_TRIPLES_SCHEMA.names}
    texts, doc_idx, span_idx, offsets, doc_ids = _span_arrays(batch)
    doc_id_list = doc_ids.to_pylist()
    for i, text in enumerate(texts):
        triples = clause_triples(text)
        if not triples:
            continue
        doc_id = doc_id_list[doc_idx[i]]
        si = int(span_idx[i])
        off = int(offsets[i])
        for t in triples:
            cols["doc_id"].append(doc_id)
            cols["span_idx"].append(si)
            cols["offset"].append(off)
            cols["head"].append(t["head"])
            cols["head_type"].append(t["type"])
            cols["relation"].append(t["relation"])
            cols["tail"].append(t["tail"])
            cols["tail_type"].append(t["tail_type"])
    return pa.Table.from_pydict(cols, schema=EXTRACTED_TRIPLES_SCHEMA)


class MentionDetector:
    """A4: gazetteer mention detection as an actor-pool stage.

    ``gazetteer``: dict name → label (node names; 403 diseases + 3,365
    medicines + 1,256 symptoms in the reference corpus — small enough to
    broadcast).  Pass a ``ray.ObjectRef`` (from ``ray.put``) so the dict
    ships to each actor ONCE via the object store, not per batch.

    Matching is longest-match-first at the leftmost position,
    non-overlapping left-to-right — a deterministic stand-in for the
    reference's declared NER surface.  The vectorized-DFA Aho-Corasick
    automaton is the default at EVERY gazetteer size (measured: its
    batch scan + Arrow-gather assembly beats the compiled alternation
    regex 1.5× even at 4 names, and ~4× at a 5k-name reference-sized
    gazetteer, because the regex arm also pays the per-row Python span
    walk).  The regex arm survives behind ``AC_THRESHOLD`` (set it above
    the gazetteer size to force it) as the independent-semantics
    reference — the randomized parity pytest asserts both engines
    produce identical matches.
    """

    AC_THRESHOLD = 0

    def __init__(self, gazetteer: Any):
        try:
            import ray

            if isinstance(gazetteer, ray.ObjectRef):
                gazetteer = ray.get(gazetteer)
        except ImportError:  # pragma: no cover
            pass
        self.gazetteer: dict[str, str] = dict(gazetteer)
        names = sorted(self.gazetteer, key=len, reverse=True)
        self.pattern = None
        self.automaton = None
        if len(names) > self.AC_THRESHOLD:
            import numpy as np

            from ..functions.ahocorasick import AhoCorasick

            self.automaton = AhoCorasick(names)
            # pattern-id → surface / label gather tables: the scan reports
            # WHICH name matched, so output assembly never re-slices text
            # or re-hashes surfaces through the gazetteer dict
            self._names_pa = pa.array(names, type=pa.string())
            self._labels_pa = pa.array(
                [self.gazetteer[n] for n in names], type=pa.string()
            )
        elif names:
            self.pattern = re.compile("|".join(re.escape(n) for n in names))

    def _matches(self, text: str) -> "list[tuple[int, int]]":
        if self.automaton is not None:
            return self.automaton.find_leftmost_longest(text)
        return [(m.start(), m.end()) for m in self.pattern.finditer(text)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list[Any]] = {n: [] for n in MENTIONS_SCHEMA.names}
        if self.pattern is None and self.automaton is None:
            return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)
        if self.automaton is not None:
            # one lock-step vectorized DFA scan over the WHOLE batch —
            # the per-(doc, char) Python walk was the engine's single
            # most expensive stage at a 5k-name gazetteer (r4 verdict 3);
            # batch prep is Arrow-native (_span_arrays) and output
            # columns assemble by pattern-id GATHER — no per-mention
            # Python appends / slices / dict lookups
            import numpy as np
            import pyarrow.compute as pc

            texts, doc_idx, span_idx, offsets, doc_ids = _span_arrays(batch)
            sdoc, sstart, _send, spid = self.automaton.scan_selected(texts)
            if not len(sdoc):
                return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)
            spid_pa = pa.array(spid)
            return pa.Table.from_arrays(
                [
                    pc.take(doc_ids, pa.array(doc_idx[sdoc])),
                    pa.array(span_idx[sdoc].astype(np.int32), type=pa.int32()),
                    pa.array(
                        (offsets[sdoc] + sstart).astype(np.int32), type=pa.int32()
                    ),
                    pc.take(self._names_pa, spid_pa),
                    pc.take(self._labels_pa, spid_pa),
                ],
                schema=MENTIONS_SCHEMA,
            )
        for doc_id, span_idx, _kind, text, offset in _iter_text_spans(batch):
            for m in self.pattern.finditer(text):
                surface = m.group(0)
                cols["doc_id"].append(doc_id)
                cols["span_idx"].append(span_idx)
                cols["offset"].append(offset + m.start())
                cols["surface"].append(surface)
                cols["label"].append(self.gazetteer[surface])
        return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)


class ModelMentionDetector:
    """A4 variant: MODEL-backed mention detection with the same output
    contract as :class:`MentionDetector` (MENTIONS_SCHEMA rows with
    doc-concatenation offsets, media spans skipped).

    The reference declares a HanLP/BERT NER surface
    (entity_extraction.py:12-19, IMK/requirements.txt:8-12).  This class
    is that surface as an actor-pool stage: ``model_factory`` is a
    zero-argument callable returning an object with

        .predict(texts: list[str]) -> list[list[tuple[int, int, str]]]

    (per text: (start, end, label) character spans) — loaded ONCE per
    actor in ``__init__``, batched inference in ``__call__``.  The
    default factory tries the public libraries the reference names and
    raises with injection instructions when absent (this container ships
    neither); tests inject a deterministic fake and assert contract
    parity with the gazetteer detector.
    """

    def __init__(self, model_factory=None):
        if model_factory is None:
            model_factory = _default_ner_model_factory
        self.model = model_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = list(_iter_text_spans(batch))
        preds = self.model.predict([r[3] for r in rows]) if rows else []
        if len(preds) != len(rows):
            # zip would silently truncate — a model that drops inputs
            # must fail loudly, not lose trailing spans' mentions
            raise ValueError(
                f"model returned {len(preds)} prediction lists for "
                f"{len(rows)} text spans — .predict must be 1:1 with its "
                "input"
            )
        cols: dict[str, list[Any]] = {n: [] for n in MENTIONS_SCHEMA.names}
        for (doc_id, span_idx, _kind, text, offset), spans in zip(rows, preds):
            for start, end, label in spans:
                cols["doc_id"].append(doc_id)
                cols["span_idx"].append(span_idx)
                cols["offset"].append(offset + start)
                cols["surface"].append(text[start:end])
                cols["label"].append(label)
        return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)


def _default_ner_model_factory():
    """Try the reference's declared NER stacks; raise with injection
    instructions when neither is installed (entity_extraction.py:12-19)."""
    try:  # pragma: no cover — not installed in this container
        import hanlp  # type: ignore # noqa: F401

        raise NotImplementedError(
            "hanlp is importable but no bundled pipeline is configured — "
            "inject model_factory wrapping your hanlp NER pipeline as "
            ".predict(texts) -> [[(start, end, label)]]"
        )
    except ImportError:
        pass
    raise NotImplementedError(
        "no NER model available in this environment; inject model_factory "
        "returning an object with .predict(texts: list[str]) -> "
        "list[list[(start, end, label)]] (e.g. a HanLP or BERT token-"
        "classification pipeline, the stacks the reference declares in "
        "entity_extraction.py:12-19)"
    )


class LLMTripleExtractor:
    """A2 variant: LLM-backed extractor with the same output contract.

    The reference builds a lazily-initialized OpenAI-compatible client per
    process (llm_integration.py:28-50) and post-processes with a markdown
    fence strip + json.loads (text_graph_builder.py:62-63).  Here the client
    is built once per actor in ``__init__`` from an injectable factory.
    With no explicit factory, the env-configured live arm is tried
    (``KG_LLM_BASE_URL``/``KG_LLM_MODEL`` → stages/llm_client.py); when no
    endpoint is configured either, construction raises with injection
    instructions — tests inject a deterministic fake or the
    recorded-response ``ReplayLLMClient`` (stages/llm_replay.py).
    """

    def __init__(self, client_factory=None, prompt_template: str | None = None):
        if client_factory is None:
            from .llm_client import env_client_factory

            client_factory = env_client_factory()
        if client_factory is None:
            raise NotImplementedError(
                "no LLM endpoint configured: set KG_LLM_BASE_URL + "
                "KG_LLM_MODEL (OpenAI-compatible /chat/completions, see "
                "stages/llm_client.py) or inject client_factory returning "
                "an object with .generate(prompt) -> str (JSON triple "
                "list, possibly fenced); a recorded-response "
                "ReplayLLMClient (stages/llm_replay.py) replays offline"
            )
        self.client = client_factory()
        self.prompt_template = prompt_template

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from ..functions.ie_patterns import strip_markdown_fences
        from ..functions.prompts import build_extraction_prompt

        cols: dict[str, list[Any]] = {n: [] for n in EXTRACTED_TRIPLES_SCHEMA.names}
        for doc_id, span_idx, _kind, text, offset in _iter_text_spans(batch):
            raw = self.client.generate(
                build_extraction_prompt(text, self.prompt_template)
            )
            try:
                triples = json.loads(strip_markdown_fences(raw))
            except (json.JSONDecodeError, TypeError):
                triples = []  # empty-result fallback (text_graph_builder.py:66-69)
            if not isinstance(triples, list):
                triples = []
            for t in triples:
                # malformed items are skipped per triple, mirroring the
                # reference's per-triple try/except (text_graph_builder.py:
                # 89-91) — one bad item must not sink the whole batch task
                if not isinstance(t, dict) or not (
                    {"head", "relation", "tail", "tail_type"} <= t.keys()
                ):
                    continue
                cols["doc_id"].append(doc_id)
                cols["span_idx"].append(span_idx)
                cols["offset"].append(offset)
                cols["head"].append(t["head"])
                cols["head_type"].append(t.get("type", "Insurance"))
                cols["relation"].append(t["relation"])
                cols["tail"].append(t["tail"])
                cols["tail_type"].append(t["tail_type"])
        return pa.Table.from_pydict(cols, schema=EXTRACTED_TRIPLES_SCHEMA)


def detect_mentions(docs, gazetteer, *, concurrency: int = 4, batch_size: int = 2048):
    """docs Dataset → mentions Dataset via a MentionDetector actor pool.

    The gazetteer is ``ray.put`` once on the driver; each actor reads it
    from the object store in ``__init__`` (broadcast join pattern — no
    shuffle).  The default batch is wide (2048 docs) because the DFA
    scan steps ALL of a batch's docs per numpy op — wider batches
    amortize per-step dispatch (measured 5.45 s → 4.8 s over 2M docs at
    512 → 2048); text payloads are small, so 2048 × ~1 KB stays far
    under any worker heap concern."""
    import ray

    ref = ray.put(dict(gazetteer))
    return docs.map_batches(
        MentionDetector,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def detect_mentions_model(
    docs, model_factory=None, *, concurrency: int = 4, batch_size: int = 64
):
    """docs Dataset → mentions Dataset via a ModelMentionDetector actor
    pool — the model loads once per actor in ``__init__``; the smaller
    default batch keeps per-batch inference latency bounded (model
    batches are compute-heavy where gazetteer batches are not)."""
    return docs.map_batches(
        ModelMentionDetector,
        fn_constructor_args=(model_factory,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_triples_pipeline(docs, *, batch_size: int = 512):
    """docs Dataset → provenance-carrying extracted triples Dataset."""
    return docs.map_batches(
        extract_text_triples, batch_format="pyarrow", batch_size=batch_size
    )
