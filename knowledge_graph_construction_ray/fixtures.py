"""Deterministic synthetic fixture corpus (FIXTURES.md §3, seed=42).

Generates the span-doc corpus the conformance tests and benchmarks run on.
Name pools are synthetic CJK-ish tokens (病症{i}, 药剂{i}, 保{i}号,
{city}安养院{i}…) — no reference data content is copied.  Sizes mirror the
reference corpus shape at ~1/10 scale; the deliberate edge cases (duplicate
names, missing fields, whitespace names, the '60' substring quirk, hot-key
skew, media interleaving, surface variants) are baked in per FIXTURES.md.

``variant`` > 0 produces a deterministic mutation of the corpus for bench
replication: a stable ~half of the entity names get a ``·{variant}`` suffix
(new entities → graph growth), the other half are kept (duplicate entities →
dedup/upsert load), so dedup work scales realistically with --replicate K.
"""

from __future__ import annotations

import zlib
from typing import Any

import pyarrow as pa

from .spanenc import encode_docs_table, encode_record
from .schema import DOCS_SCHEMA, make_doc_id

SEED = 42  # all content below is a pure function of indices — no RNG needed

CITIES = ("城北市", "城南市", "城东市", "城西市")
SHEETS = ("西药部分", "中成药部分", "协议西药", "协议中成药")
EASY_GET = ("多发于中老年人", "儿童易感", "青年人群", "中年人群", "老年人群易发")

N_DISEASE = 40
N_MEDICINE = 380
N_NURSING = 48
N_INSURANCE = 16
N_POLICY = 8


def _tag(name: str, variant: int) -> str:
    """Stable half-and-half mutation for bench replication."""
    if variant == 0:
        return name
    if (zlib.crc32(name.encode("utf-8")) + variant) % 2 == 0:
        return name
    return f"{name}·{variant}"


def _disease_name(i: int, variant: int = 0) -> str:
    return _tag(f"病症{i:03d}", variant)


def _symptom_name(i: int, variant: int = 0) -> str:
    return _tag(f"征兆{i:03d}", variant)


def _drug_name(i: int, variant: int = 0) -> str:
    return _tag(f"药剂{i:03d}", variant)


def _insurance_name(i: int, variant: int = 0) -> str:
    return _tag(f"保{i:02d}号", variant)


def disease_records(variant: int = 0) -> list[dict[str, Any]]:
    out = []
    for i in range(N_DISEASE):
        # 2 duplicate names with differing props (upsert / null-removal path)
        if i == 25:
            name = _disease_name(10, variant)
        elif i == 37:
            name = _disease_name(12, variant)
        else:
            name = _disease_name(i, variant)
        rec: dict[str, Any] = {
            "id": str(i + 1),
            "icd_code": f"ICD-{i:04d}",
            "name": name,
            "intro": f"{name}是一种常见的慢性疾病，病程进展缓慢。",
            "get_prob": f"0.0{i % 10}%",
            "cure_dept": "  " if i == 8 else f"科室{i % 5}",
            "easy_get": EASY_GET[i % len(EASY_GET)],
            "get_way": "接触传播" if i % 3 == 0 else "无传染性",
            "cause": f"{name}的病因包括遗传因素与环境因素的长期交互作用。",
            "prevent": f"预防{name}须坚持健康生活方式。" * 8,  # multi-KB-ish wide field
            "symptom": [_symptom_name((i * 3 + j) % 60, variant) for j in range(3)],
            "treat_detail": f"{name}的治疗以综合管理为主，结合药物与康复训练。" * 6,
            "nursing": f"护理{name}患者需要定期复查。",
        }
        # hot symptom shared by 30 docs (head-entity skew exercise)
        if i < 30:
            rec["symptom"].append(_symptom_name(0, variant))
        # 3 docs missing `drug`
        if i not in (5, 6, 7):
            rec["drug"] = [
                _drug_name(90 + (i * 7 + j) % 30, variant) for j in range(2)
            ]
        # 1 doc missing `get_way` — the duplicate, so the null DELETES the
        # earlier record's value through the upsert fold
        if i == 25:
            del rec["get_way"]
            rec["icd_code"] = "ICD-DUP25"
        if i == 37:
            rec["icd_code"] = "ICD-DUP37"
        # complications: some match other disease docs, some are novel stubs
        if i % 4 == 0:
            rec["neopathy"] = [_disease_name((i + 1) % N_DISEASE, variant)]
        elif i % 4 == 2:
            rec["neopathy"] = [_tag(f"病症9{i:02d}", variant)]
        out.append(rec)
    return out


def medicine_records(variant: int = 0) -> list[dict[str, Any]]:
    out = []
    for i in range(N_MEDICINE):
        if i < 190:
            sheet = SHEETS[0]
        elif i < 310:
            sheet = SHEETS[1]
        elif i < 345:
            sheet = SHEETS[2]
        else:
            sheet = SHEETS[3]
        # 30 duplicate names across sheets: docs 350..379 reuse 0..29's names
        base = i - 350 if i >= 350 else i
        name = _drug_name(100 + base, variant)
        rec: dict[str, Any] = {
            "id": f"M{i:05d}",
            "name": name,
            "sheet": sheet,
            "reimbursement_category": "甲类" if i % 2 == 0 else "乙类",
            "category_code": f"X{i % 50:02d}",
            "category_name": f"类别{i % 50:02d}",
            "subcategory_code": f"X{i % 50:02d}{i % 7}",
            "subcategory_name": f"子类{i % 7}",
            "all_category_codes": [f"X{i % 50:02d}", f"X{i % 50:02d}{i % 7}"],
            "dosage": f"{i % 3 + 1}片/日",
        }
        # a duplicate missing dosage → null deletes the original's dosage
        if i == 360:
            del rec["dosage"]
        # 协议-sheet extras on 40 docs (310..349)
        if 310 <= i < 350:
            rec["note"] = f"限医保协议期内使用，备注{i}。"
            rec["payment_standard"] = [f"{(i % 9 + 1) * 10}元/片", "按比例支付"]
            rec["validity_period"] = "2025-12-31"
        out.append(rec)
    return out


def nursing_home_records(variant: int = 0) -> list[dict[str, Any]]:
    out = []
    for i in range(N_NURSING):
        city = CITIES[i % len(CITIES)]
        name = "   " if i == 13 else _tag(f"{city}安养院{i:02d}", variant)
        out.append(
            {
                "城市": city,
                "名称": name,
                "性质": "民办" if i % 3 else "公办",
                "床位": str(50 + i * 3),
                "价格(元/月)": "价格面议" if i in (7, 21) else str((i + 1) * 500),
                "特色服务": f"提供康复护理与膳食服务，特色项目{i % 6}。",
                "地址": f"{city}幸福路{i}号",
            }
        )
    return out


def insurance_records(variant: int = 0) -> list[dict[str, Any]]:
    out = []
    for i in range(N_INSURANCE):
        # 1 duplicate name (doc 15 reuses doc 3's)
        name = _insurance_name(3 if i == 15 else i, variant)
        if i in (2, 9):
            age_limit = "出生满30天-60周岁"  # the '60' substring quirk
        elif i == 4:
            age_limit = "面向老年群体"
        else:
            age_limit = "18-55周岁"
        desc = f"{name}提供住院医疗费用保障。"
        if i == 1:
            desc += "涵盖高血压等慢性疾病。"
        elif i == 3:
            desc += "对糖尿病患者可投保。"
        elif i == 5:
            desc += "包含癌症医疗保障。"
        elif i == 6:
            desc += "覆盖恶性肿瘤治疗费用。"
        elif i == 7:
            desc += "针对癌症及恶性肿瘤提供赔付。"  # both keywords → ONE edge
        elif i == 8:
            desc += "保障高血压、糖尿病等慢病人群。"  # two rule edges
        out.append(
            {
                "产品名称": name,
                "险种分类": "医疗险" if i % 2 == 0 else "重疾险",
                "承保公司": f"承保公司{i % 4}",
                "承保年龄": age_limit,
                "保障期限": "1年" if i % 2 else "终身",
                "产品描述": desc,
                "价格": f"{(i + 1) * 100}元起",
            }
        )
    return out


def policy_text_records(variant: int = 0) -> list[dict[str, Any]]:
    """Clause grammar matching functions/ie_patterns.py; docs 6 and 7 emit
    surface variants (恶性肿瘤-重度) to exercise canonicalization."""
    out = []
    for j in range(N_POLICY):
        ins = _insurance_name(j % N_INSURANCE, variant)
        dis = _disease_name((j * 5) % N_DISEASE, variant)
        dis2 = _disease_name((j * 5 + 2) % N_DISEASE, variant)
        clauses = [
            f"{ins}对{dis}提供保障。",
            "本条款内容仅供参考。",
            f"{ins}的投保年龄为{j * 5}-{60 + j}周岁。",
            f"{ins}不承保既往症{j % 3}。",
            f"{ins}拒保{dis2}。",
        ]
        if j in (6, 7):
            clauses.append(f"{ins}对{_tag('恶性肿瘤', variant)}-重度提供保障。")
        out.append({"title": f"保险条款{j:02d}", "clauses": clauses})
    return out


ALL_KINDS = (
    ("disease", disease_records),
    ("medicine", medicine_records),
    ("nursing_home", nursing_home_records),
    ("insurance", insurance_records),
    ("policy_text", policy_text_records),
)


def generate_corpus(variant: int = 0, idx_offset: int = 0) -> pa.Table:
    """The full fixture corpus as one Arrow docs table (492 docs at
    variant=0).  ``idx_offset`` shifts doc indices for replication."""
    tables = []
    for kind, maker in ALL_KINDS:
        records = maker(variant)
        if kind == "policy_text":
            # policy docs need a doc_key for media refs; encode individually
            doc_ids, span_lists = [], []
            for i, rec in enumerate(records):
                idx = idx_offset + i
                doc_ids.append(make_doc_id(kind, idx))
                span_lists.append(encode_record(kind, rec, doc_key=str(idx)))
            tables.append(
                pa.Table.from_pydict(
                    {"doc_id": doc_ids, "spans": span_lists}, schema=DOCS_SCHEMA
                )
            )
        else:
            tables.append(encode_docs_table(kind, records, start_idx=idx_offset))
    return pa.concat_tables(tables)


def generate_replicated(replicate: int = 1, mutate: bool = True) -> pa.Table:
    """Bench corpus: ``replicate`` deterministic copies.  With ``mutate``
    each replica r>0 renames a stable ~half of the entities (·r suffix), so
    the merge phase sees realistic mixed dedup + growth."""
    tables = [
        generate_corpus(variant=(r if mutate else 0), idx_offset=r * 1_000_000)
        for r in range(replicate)
    ]
    return pa.concat_tables(tables)


def write_corpus(
    path: str, replicate: int = 1, mutate: bool = True, files: int = 1
) -> pa.Table:
    """``files=1``: one parquet file at ``path``.  ``files>1``: a DIRECTORY
    of equal slices — ray.data.read_parquet schedules one read task per
    FILE, so a single-file corpus is DECODED by one task no matter how
    many row groups or ``override_num_blocks`` it has (measured: a ~4.7 s
    serial head on the 2M-doc bench at 16 CPUs; SplitBlocks only re-slices
    already-decoded output).  Multi-file is also the shape a real at-scale
    corpus has."""
    import pyarrow.parquet as pq

    table = generate_replicated(replicate, mutate)
    if files <= 1:
        # small row groups so downstream re-slicing stays cheap
        pq.write_table(table, path, row_group_size=65536)
        return table
    import os

    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = -(-n // files)
    for i in range(files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(
                part, f"{path}/part-{i:05d}.parquet", row_group_size=65536
            )
    return table
