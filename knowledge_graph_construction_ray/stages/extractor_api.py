"""The pluggable extractor protocol (user-extension surface).

Mirrors the reference's declared extractor API
(IMK/src/kg_construction/entity_extraction.py:21-56 and
IMK/docs/module_interfaces.md:32-40): ``extract_entities``,
``extract_entities_batch``, ``extract_triples_from_text``,
``extract_triples_from_records``.  The reference leaves these abstract
(HanLP/BERT NER declared but not wired); here the default implementation is
deterministic (gazetteer mentions + pattern triples + the structured-record
rules), and any object satisfying :class:`ExtractorProtocol` can be dropped
into the pipeline stages (they are plain ``map_batches`` callables).
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Protocol, runtime_checkable

from ..functions.ie_patterns import Triple, clause_triples
from ..oracle import GraphOracle
from ..schema import Ontology, TEXT_ONTOLOGY


@runtime_checkable
class ExtractorProtocol(Protocol):
    def extract_entities(self, text: str) -> list[tuple[str, str, int]]: ...

    def extract_entities_batch(
        self, texts: Iterable[str]
    ) -> list[list[tuple[str, str, int]]]: ...

    def extract_triples_from_text(self, text: str) -> list[Triple]: ...

    def extract_triples_from_records(
        self, records: Iterable[dict[str, Any]], kind: str
    ) -> list[tuple[str, str, str]]: ...


class DeterministicExtractor:
    """Default extractor: warm gazetteer (alias dictionary) + compiled
    schema-constrained patterns — the same state an NER-model-backed
    implementation would hold (load once, reuse per call)."""

    def __init__(self, gazetteer: dict[str, str] | None = None,
                 ontology: Ontology = TEXT_ONTOLOGY):
        self.gazetteer = dict(gazetteer or {})
        self.ontology = ontology
        names = sorted(self.gazetteer, key=len, reverse=True)
        self._pattern = (
            re.compile("|".join(re.escape(n) for n in names)) if names else None
        )

    # -- entity surface -----------------------------------------------------

    def extract_entities(self, text: str) -> list[tuple[str, str, int]]:
        """→ [(surface, label, offset)], longest-match-first."""
        if self._pattern is None:
            return []
        return [
            (m.group(0), self.gazetteer[m.group(0)], m.start())
            for m in self._pattern.finditer(text)
        ]

    def extract_entities_batch(self, texts):
        return [self.extract_entities(t) for t in texts]

    # -- triple surface -----------------------------------------------------

    def extract_triples_from_text(self, text: str) -> list[Triple]:
        """Schema-constrained triples; invalid (head_label, rel, tail_label)
        combinations are dropped against the ontology registry."""
        out = []
        for t in clause_triples(text):
            if self.ontology.validate_edge(t["type"], t["relation"], t["tail_type"]):
                out.append(t)
        return out

    def extract_triples_from_records(
        self, records: Iterable[dict[str, Any]], kind: str
    ) -> list[tuple[str, str, str]]:
        """Structured records → canonical (subj, pred, obj) strings via the
        reference loader rules (neo4j_loader.py loaders)."""
        oracle = GraphOracle()
        loader = {
            "disease": oracle.load_disease,
            "medicine": oracle.load_medicine,
            "nursing_home": oracle.load_nursing_home,
            "insurance": oracle.load_insurance,
        }.get(kind)
        if loader is None:
            raise ValueError(f"unknown record kind: {kind}")
        for record in records:
            loader(record)
        return sorted(oracle.triples())
