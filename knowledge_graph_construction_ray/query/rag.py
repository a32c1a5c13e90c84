"""Retrieval orchestration (reference ``GraphRetriever.retrieve``,
graph_retriever.py:23-246): parsed intent → up to four operator templates →
formatted context string.  The LLM prompt/answer shell around it is out of
scope (no network); everything data-side is reproduced:

1. per-disease: profile card (J1+G1) + covering-insurance recs (J2);
2. age ≥ 60 → elderly-insurance semi-join (J3), LIMIT 5;
3. ``insurance_query`` intent → product search (T1/F6) with series
   precedence and seeded generic shuffle;
4. ``nursing_home_search`` intent OR city/price present → filtered
   nursing-home cards (F1/F2), LIMIT 5;
5. empty result → the reference's fixed fallback string;
6. retro-questions (F7) → context masked ("logic lock",
   rag_engine.py:87-96).
"""

from __future__ import annotations

from . import ops
from .context import (
    EMPTY_CONTEXT,
    format_context,
    format_disease_info,
    format_insurance_recs,
    format_nursing_cards,
    format_product_cards,
)
from .understanding import is_retro_question


def retrieve(parsed_query: dict, nodes, edges, *, seed: int = 42,
             known_series=None, generic_keywords=None) -> str:
    """Parsed intent dict (see query/understanding.py) → context string."""
    raw_query = parsed_query.get("raw_query", "")
    if raw_query and is_retro_question(raw_query):
        return ""  # logic lock: retro-questions get no fresh context

    parts: list[str] = []
    intent = parsed_query.get("intent", "general_qa")
    city = parsed_query.get("city")
    price_max = parsed_query.get("price_max")

    for disease in parsed_query.get("disease", []):
        profile = ops.disease_profile(nodes, edges, disease)
        if profile["props"] is not None or profile["symptoms"]:
            parts.append(format_disease_info(profile))
        recs = ops.insurance_by_disease(nodes, edges, disease)
        part = format_insurance_recs(disease, recs)
        if part:
            parts.append(part)

    age = parsed_query.get("age")
    if age is not None and age >= 60:
        eld = ops.elderly_insurance(nodes, edges, age)
        if len(eld):
            parts.append(
                f"【适老保险】适合 {age} 岁人群的保险产品: "
                + ", ".join(f"{r.ins_name} ({r.age_limit})" for r in eld.itertuples())
            )

    if intent == "insurance_query":
        prods = ops.product_search(
            nodes, raw_query, seed=seed,
            known_series=known_series, generic_keywords=generic_keywords,
        )
        part = format_product_cards(prods)
        if part:
            parts.append(part)

    if intent == "nursing_home_search" or city or price_max is not None:
        homes = ops.nursing_home_search(nodes, city=city, price_max=price_max)
        parts.append(format_nursing_cards(homes, city=city, price_max=price_max))

    return format_context(parts)


__all__ = ["retrieve", "EMPTY_CONTEXT"]
