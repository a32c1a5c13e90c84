"""Deterministic schema-constrained triple extraction patterns.

The reference extracts ``{head, type, relation, tail, tail_type}`` triples
from policy text with an LLM constrained to a fixed schema (entity types
Insurance/Disease/AgeRange/Exclusion, relations COVERS/EXCLUDES/ALLOWS_AGE/
REFUSES_DISEASE — text_graph_builder.py:30-55).  Our engine's default
extractor honours the same output contract but is a deterministic
rule/pattern extractor, so the P/R gate is reproducible offline; an
LLM-backed actor is a drop-in variant (same contract — see
stages/text.py).

This module is *pure* (no Ray): it is the single definition of the
extraction contract, consumed both by the distributed stage and by the
single-process oracle.
"""

from __future__ import annotations

import re
from typing import TypedDict


class Triple(TypedDict):
    head: str
    type: str
    relation: str
    tail: str
    tail_type: str


# Clause grammar of the synthetic policy corpus (FIXTURES.md §2.5).  Each
# pattern maps one clause sentence to one (relation, tail_type) pair; the
# head is always an Insurance product (the reference makes the same
# assumption, text_graph_builder.py:82).
_ENTITY = r"[^\s，。；,.;:：]+"
PATTERNS: tuple[tuple[re.Pattern[str], str, str], ...] = (
    (re.compile(rf"({_ENTITY})对({_ENTITY})提供保障"), "COVERS", "Disease"),
    (re.compile(rf"({_ENTITY})不承保({_ENTITY})"), "EXCLUDES", "Exclusion"),
    (re.compile(rf"({_ENTITY})的投保年龄为({_ENTITY})"), "ALLOWS_AGE", "AgeRange"),
    (re.compile(rf"({_ENTITY})拒保({_ENTITY})"), "REFUSES_DISEASE", "Disease"),
)

HEAD_TYPE = "Insurance"


def clause_triples(text: str) -> list[Triple]:
    """Extract all schema-constrained triples from one clause string.

    Deterministic: patterns are tried in fixed order, matches in left-to-
    right order.  Returns [] for non-matching text (title spans, filler
    clauses) — mirroring the reference's empty-result fallback
    (text_graph_builder.py:66-69).
    """
    out: list[Triple] = []
    for pattern, relation, tail_type in PATTERNS:
        for m in pattern.finditer(text):
            out.append(
                Triple(
                    head=m.group(1),
                    type=HEAD_TYPE,
                    relation=relation,
                    tail=m.group(2),
                    tail_type=tail_type,
                )
            )
    return out


def strip_markdown_fences(text: str) -> str:
    """M9: strip ```json / ``` fences then trim (text_graph_builder.py:62;
    query_understanding.py:47-50) — used by the LLM-backed extractor
    variant's post-processor."""
    return text.replace("```json", "").replace("```", "").strip()
