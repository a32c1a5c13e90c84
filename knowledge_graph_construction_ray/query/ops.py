"""Graph retrieval operators (reference's production Cypher templates
re-expressed as Dataset compositions — SURVEY.md §2.4-2.8).

All operators take the materialized ``nodes`` / ``edges`` Datasets (schema
NODES_SCHEMA / EDGES_SCHEMA).  Lookup keys (entity names, small key sets)
are broadcast predicates — never shuffles; grouped collects are groupby
aggregates; the k-hop expansion is an iterative frontier semi-join.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _filter_batches(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow")


def _to_pandas(ds, columns: list[str]) -> pd.DataFrame:
    """to_pandas that keeps column names when the result is empty (an empty
    Ray dataset loses its schema)."""
    df = ds.to_pandas()
    if df.empty and not list(df.columns):
        return pd.DataFrame(columns=columns)
    return df


def node_props(nodes, label: str, name: str) -> dict | None:
    """Point lookup of one node's property map (broadcast predicate)."""
    hits = _filter_batches(
        nodes,
        lambda t: t.filter(
            pc.and_(pc.equal(t["label"], label), pc.equal(t["name"], name))
        ),
    ).take(1)
    return json.loads(hits[0]["props"]) if hits else None


def disease_profile(nodes, edges, name: str) -> dict:
    """J1+G1: OPTIONAL MATCH 3 edge types + collect(DISTINCT …)
    (graph_retriever.py:47-55).  Left-outer semantics: a disease with no
    neighbors still returns empty lists; a missing disease returns None
    props with empty lists."""
    out = edges.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.equal(t["src_label"], "Disease"), pc.equal(t["src_name"], name)),
                pc.is_in(t["rel"], value_set=pa.array(
                    ["HAS_COMPLICATION", "TREATED_BY", "HAS_SYMPTOM"]
                )),
            )
        ),
        batch_format="pyarrow",
    )
    out = _to_pandas(out, ["src_label", "src_name", "rel", "dst_label", "dst_name"])
    collect = lambda rel: sorted(set(out[out["rel"] == rel]["dst_name"]))
    return {
        "name": name,
        "props": node_props(nodes, "Disease", name),
        "complications": collect("HAS_COMPLICATION"),
        "drugs": collect("TREATED_BY"),
        "symptoms": collect("HAS_SYMPTOM"),
    }


def insurance_by_disease(nodes, edges, disease_name: str) -> pd.DataFrame:
    """J2: reverse lookup (i:Insurance)-[:COVERS_DISEASE]->(d {name})
    returning i props (graph_retriever.py:78-86).  Semi-join on the edge
    side, then a broadcast name-set probe into nodes."""
    ins_names = set(
        _to_pandas(
            edges.map_batches(
                lambda t: t.filter(
                    pc.and_(
                        pc.equal(t["rel"], "COVERS_DISEASE"),
                        pc.equal(t["dst_name"], disease_name),
                    )
                ),
                batch_format="pyarrow",
            ),
            ["src_label", "src_name", "rel", "dst_label", "dst_name"],
        )["src_name"]
    )
    rows = _to_pandas(
        _filter_batches(
            nodes,
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["label"], "Insurance"),
                    pc.is_in(t["name"], value_set=pa.array(sorted(ins_names) or [""])),
                )
            ),
        ),
        ["label", "name", "props"],
    )
    props = rows["props"].map(json.loads)
    return pd.DataFrame(
        {
            "ins_name": rows["name"],
            "desc": props.map(lambda p: p.get("description")),
            "age_limit": props.map(lambda p: p.get("age_limit")),
        }
    ).sort_values("ins_name").reset_index(drop=True)


def elderly_insurance(nodes, edges, age: int, limit: int = 5) -> pd.DataFrame:
    """J3: population semi-join, only when age ≥ 60; LIMIT 5 with
    deterministic order (graph_retriever.py:89-102)."""
    if age < 60:
        return pd.DataFrame(columns=["ins_name", "age_limit"])
    names = set(
        _to_pandas(
            edges.map_batches(
                lambda t: t.filter(
                    pc.and_(
                        pc.equal(t["rel"], "TARGETS_POPULATION"),
                        pc.equal(t["dst_name"], "老年人"),
                    )
                ),
                batch_format="pyarrow",
            ),
            ["src_label", "src_name", "rel", "dst_label", "dst_name"],
        )["src_name"]
    )
    rows = _to_pandas(
        _filter_batches(
            nodes,
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["label"], "Insurance"),
                    pc.is_in(t["name"], value_set=pa.array(sorted(names) or [""])),
                )
            ),
        ),
        ["label", "name", "props"],
    ).sort_values("name").head(limit)
    props = rows["props"].map(json.loads)
    return pd.DataFrame(
        {"ins_name": list(rows["name"]), "age_limit": list(props.map(lambda p: p.get("age_limit")))}
    )


KNOWN_SERIES = ["蓝医保", "好医保", "金医保", "平安", "众安", "长相安"]
GENERIC_KEYWORDS = ["重疾", "医疗", "护理", "防癌"]


def product_search(nodes, raw_query: str, *, seed: int = 42,
                   limit_specific: int = 6, limit_generic: int = 20,
                   known_series: list[str] | None = None,
                   generic_keywords: list[str] | None = None) -> pd.DataFrame:
    """T1+F6: first-match series precedence, else keyword-any + SEEDED
    shuffle + limit (graph_retriever.py:112-156 — `ORDER BY rand()` made
    deterministic per SURVEY T1).  Keyword lists default to the reference's
    hard-coded series/keywords and are configurable (the reference marks
    them as the business-data extension point)."""
    series = known_series if known_series is not None else KNOWN_SERIES
    keywords = generic_keywords if generic_keywords is not None else GENERIC_KEYWORDS
    specific = next((s for s in series if s in raw_query), "")
    ins = _filter_batches(nodes, lambda t: t.filter(pc.equal(t["label"], "Insurance")))
    if specific:
        hits = _filter_batches(
            ins, lambda t: t.filter(pc.match_substring(t["name"], specific))
        ).sort("name").limit(limit_specific)
    else:
        def generic(t: pa.Table) -> pa.Table:
            mask = None
            for kw in keywords:
                m = pc.match_substring(t["name"], kw)
                mask = m if mask is None else pc.or_(mask, m)
            if mask is None:  # empty keyword list → no matches
                return t.slice(0, 0)
            return t.filter(mask)

        hits = (
            _filter_batches(ins, generic)
            .random_shuffle(seed=seed)
            .limit(limit_generic)
        )
    rows = _to_pandas(hits, ["label", "name", "props"])
    props = rows["props"].map(json.loads)
    return pd.DataFrame(
        {
            "name": rows["name"],
            "category": props.map(lambda p: p.get("category", "未知")),
            "age_limit": props.map(lambda p: p.get("age_limit")),
            "desc": props.map(lambda p: (p.get("description") or "")[:50]),
        }
    )


def nursing_home_search(nodes, *, city: str | None = None,
                        price_max: int | None = None, limit: int = 5) -> pd.DataFrame:
    """F1+F2: city CONTAINS over address/name, toInteger(price) <= max with
    dirty values (价格面议) → null → filtered out (graph_retriever.py:182-213);
    LIMIT with deterministic name order."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # label partition + props parse + city/price predicates all run in
        # the WORKER — only matching rows (≤ label partition, usually ≪)
        # ever reach the driver (ADVICE r1: the label partition is
        # unbounded in general, so the filters must ride along)
        df = df[df["label"] == "NursingHome"]
        props = df["props"].map(json.loads)
        out = pd.DataFrame(
            {
                "name": df["name"],
                "price": props.map(lambda p: p.get("price")),
                "address": props.map(lambda p: p.get("address")),
                "services": props.map(lambda p: p.get("services")),
                "beds": props.map(lambda p: p.get("beds")),
                "nature": props.map(lambda p: p.get("nature")),
            }
        )
        if city:
            out = out[
                out["address"].fillna("").str.contains(city, regex=False)
                | out["name"].str.contains(city, regex=False)
            ]
        if price_max is not None:
            price_int = pd.to_numeric(out["price"], errors="coerce")  # 价格面议 → NaN
            out = out[price_int.notna() & (price_int <= price_max)]
        return out

    df = _to_pandas(
        nodes.map_batches(kernel, batch_format="pandas"),
        ["name", "price", "address", "services", "beds", "nature"],
    )
    return df.sort_values("name").head(limit).reset_index(drop=True)


def label_counts(nodes) -> pd.DataFrame:
    """G2: node counts by label (the frontend stats panel)."""
    from ray.data.aggregate import Count

    return (
        nodes.groupby("label")
        .aggregate(Count(alias_name="n_nodes"))
        .sort("label")
        .to_pandas()
    )


def khop_subgraph(edges, entities: list[str], hops: int = 2,
                  limit: int = 50) -> pd.DataFrame:
    """J5: undirected variable-length expansion (start)-[*1..h]-(related)
    (graph_retrieval.py:25-50) as h rounds of frontier semi-joins — the
    frontier (small) is the broadcast side each round; LIMIT 50 triples
    with deterministic order, first-occurrence dedup (D3 semantics)."""
    frontier = set(entities)
    seen_edges: list[tuple] = []
    seen_keys: set[tuple] = set()
    for _ in range(hops):
        if not frontier:
            break  # nothing matched — pa.array([]) would be null-typed
        fr = sorted(frontier)
        hop = _to_pandas(
            edges.map_batches(
                lambda t, fr=fr: t.filter(
                    pc.or_(
                        pc.is_in(t["src_name"], value_set=pa.array(fr)),
                        pc.is_in(t["dst_name"], value_set=pa.array(fr)),
                    )
                ),
                batch_format="pyarrow",
            ),
            ["src_label", "src_name", "rel", "dst_label", "dst_name"],
        ).sort_values(
            ["src_label", "src_name", "rel", "dst_label", "dst_name"]
        )
        next_frontier = set()
        for r in hop.itertuples():
            key = (r.src_label, r.src_name, r.rel, r.dst_label, r.dst_name)
            if key not in seen_keys:
                seen_keys.add(key)
                seen_edges.append(key)
            next_frontier.add(r.src_name)
            next_frontier.add(r.dst_name)
        frontier = next_frontier
        if len(seen_edges) >= limit:
            break
    out = pd.DataFrame(
        seen_edges[:limit],
        columns=["src_label", "src_name", "rel", "dst_label", "dst_name"],
    )
    return out


def subgraph_to_triple_text(df: pd.DataFrame, cap: int = 30) -> str:
    """Context formatter: triples → prompt lines, capped [:30]
    (graph_retrieval.py:103-106)."""
    lines = ["三元组："]
    for r in df.head(cap).itertuples():
        lines.append(f"  ({r.src_name}) -[{r.rel}]-> ({r.dst_name})")
    return "\n".join(lines)
