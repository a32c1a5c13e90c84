"""Query understanding: intent parsing + query rewrite (reference A3/M11/F7
— src/graph_rag/query_understanding.py:12-63, rag_engine.py:15-53, 92-96).

The reference parses intent with an LLM and post-processes with a markdown
fence strip + ``json.loads`` with a ``{'intent': 'general_qa'}`` fallback on
any error (M11).  Here the default parser is deterministic (keyword /
pattern rules over the same output schema) and an LLM client is an optional
drop-in: its raw output goes through the identical fence-clean → parse →
fallback path.

Output schema (query_understanding.py prompt):
``{intent, age?, disease: [..], drug: [..], city?, price_max?}`` with
intent ∈ {disease_query, insurance_query, nursing_home_search, general_qa}.
"""

from __future__ import annotations

import json
import re
from typing import Any

from ..functions.ie_patterns import strip_markdown_fences

INTENT_KEYWORDS = {
    "insurance_query": ("保险", "投保", "承保", "保费", "理赔"),
    "nursing_home_search": ("养老院", "安养", "养老机构", "敬老院"),
    "disease_query": ("病", "症", "症状", "并发", "药"),
}

# F7: retro-question keyword gate (rag_engine.py:92-96) — when the user
# refers back to earlier answers, retrieval context is masked ("logic lock")
RETRO_KEYWORDS = ("上面的", "刚才", "之前说", "上述", "前面提到")

_AGE = re.compile(r"(\d{1,3})\s*岁")
_PRICE = re.compile(r"(\d{3,6})\s*元")


def is_retro_question(text: str) -> bool:
    return any(kw in text for kw in RETRO_KEYWORDS)


def parse_intent(
    text: str,
    *,
    entity_gazetteer: dict[str, str] | None = None,
    llm_response: str | None = None,
) -> dict[str, Any]:
    """Deterministic intent parse; ``llm_response`` (a raw LLM string) takes
    precedence and goes through the reference's clean/parse/fallback path."""
    if llm_response is not None:
        try:
            parsed = json.loads(strip_markdown_fences(llm_response))
            parsed.setdefault("intent", "general_qa")  # M11 default
            return parsed
        except (json.JSONDecodeError, AttributeError):
            return {"intent": "general_qa"}

    out: dict[str, Any] = {"intent": "general_qa", "disease": [], "drug": []}
    for intent, kws in INTENT_KEYWORDS.items():
        if any(kw in text for kw in kws):
            out["intent"] = intent
            break
    m = _AGE.search(text)
    if m:
        out["age"] = int(m.group(1))
    m = _PRICE.search(text)
    if m:
        out["price_max"] = int(m.group(1))
    if entity_gazetteer:
        for name, label in entity_gazetteer.items():
            if name and name in text:
                if label == "Disease":
                    out["disease"].append(name)
                elif label == "Drug":
                    out["drug"].append(name)
                elif label == "NursingHome" and "city" not in out:
                    out["city"] = name
    out["raw_query"] = text  # rag_engine.py:70 injects the raw query
    return out


def rewrite_query(text: str, history: list[tuple[str, str]] | None = None,
                  llm_response: str | None = None) -> str:
    """A3 rewriter contract: consumes the last 4 history turns
    (rag_engine.py:15-53).  Deterministic fallback returns the text
    unchanged; an LLM-backed rewrite is used verbatim after trimming."""
    _ = (history or [])[-4:]
    if llm_response:
        cleaned = strip_markdown_fences(llm_response)
        if cleaned:
            return cleaned
    return text
