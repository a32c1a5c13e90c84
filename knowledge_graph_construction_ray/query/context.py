"""Context formatters (operator M12: graph_retriever.py:64-75, 170-177,
217-240, 243-246) — presentation-side truncation/joins that turn retrieval
results into prompt context strings."""

from __future__ import annotations

import pandas as pd

EMPTY_CONTEXT = "知识图谱检索完成，但在图谱中未发现与该特定实体或条件直接匹配的记录。"


def format_disease_info(profile: dict) -> str:
    """Disease info card: optional prop lines + [:5]-truncated joined lists
    (graph_retriever.py:64-75)."""
    props = profile.get("props") or {}
    info = f"【疾病信息】{profile['name']}:\n"
    if props.get("intro"):
        info += f"  - 简介: {props['intro']}\n"
    if props.get("treat_detail"):
        info += f"  - 治疗: {props['treat_detail']}\n"
    if profile.get("symptoms"):
        info += f"  - 症状: {', '.join(profile['symptoms'][:5])}\n"
    if profile.get("complications"):
        info += f"  - 并发症: {', '.join(profile['complications'][:5])}\n"
    if profile.get("drugs"):
        info += f"  - 常用药物: {', '.join(profile['drugs'][:5])}\n"
    return info


def format_insurance_recs(disease_name: str, recs: pd.DataFrame) -> str:
    """Recommended-insurance line (graph_retriever.py:83-86)."""
    if recs.empty:
        return ""
    items = [f"{r.ins_name} (年龄限制: {r.age_limit})" for r in recs.itertuples()]
    return f"【推荐保险】针对 {disease_name} 的相关保险产品: {', '.join(items)}"


def format_product_cards(products: pd.DataFrame, keyword: str = "") -> str:
    """Product cards with [:50] description truncation
    (graph_retriever.py:170-177)."""
    if products.empty:
        return ""
    cards = [
        f"【产品】{r.name}\n   - 险种: {r.category}\n   - 投保年龄: {r.age_limit}"
        f"\n   - 描述: {(r.desc or '')[:50]}..."
        for r in products.itertuples()
    ]
    return (
        f"【保险产品库】(已根据关键词 '{keyword or '通用'}' 筛选):\n" + "\n".join(cards)
    )


def format_nursing_cards(homes: pd.DataFrame, city=None, price_max=None) -> str:
    """Nursing-home cards with [:100] services truncation and None-safe
    optional lines (graph_retriever.py:217-240)."""
    if homes.empty:
        return f"【养老机构】未找到符合条件的养老院 (城市: {city}, 预算: {price_max})。"
    cards = []
    for r in homes.itertuples():
        detail = f"【{r.name}】\n  - 价格: {r.price}元/月\n  - 地址: {r.address}"
        if r.nature:
            detail += f"\n  - 性质: {r.nature}"
        if r.beds:
            detail += f"\n  - 床位: {r.beds}"
        if r.services:
            s = str(r.services)
            detail += f"\n  - 特色服务: {s[:100] + '...' if len(s) > 100 else s}"
        cards.append(detail)
    return (
        f"【养老机构推荐】(筛选条件: 城市={city or '不限'}, 预算<{price_max or '不限'}):\n"
        + "\n".join(cards)
    )


def format_context(parts: list[str]) -> str:
    """Join non-empty parts; reference empty-result fallback string
    (graph_retriever.py:243-246)."""
    parts = [p for p in parts if p]
    return "\n".join(parts) if parts else EMPTY_CONTEXT
