"""Config-driven source registry (reference: config_loader.py:17-60 YAML +
env override, data_collection.py:20-45 grouped source lists,
config.yaml:10-17 data_sources layout).

Two accepted layouts:

1. **Explicit** (this engine's native form) — every entry names its kind::

       sources:
         - {kind: disease,      path: Diseases/diseases.json}
         - {kind: medicine,     path: Drugs/medicine.json}
         - {kind: nursing_home, path: NursingHomes/nursing_homes.csv}
         - {kind: insurance,    path: Insurance/insurance_info.json}
         - {kind: policy_text,  path: Policies/policy.txt}

2. **Reference-compatible** (``config.yaml:10-17``) — grouped lists under
   ``data_sources`` with the reference's fixed group semantics: ``medical``
   entries route by filename (``medicine`` substring → the nested medicine
   sheets converter, else diseases), ``insurance`` → insurance JSON,
   ``senior_care`` → nursing-home CSV — mirroring what
   ``data_collection.py`` hard-codes per group.

Paths resolve against ``base_path`` (data_collection.py:21-26).  Unknown
kinds fail fast.  The output is the engine's span-doc table, so every
downstream pipeline applies unchanged.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa


def load_pipeline_config(source: "str | dict") -> dict:
    """YAML path or already-parsed dict → config dict (config_loader.py:17-37;
    the reference's .env overrides target Neo4j/LLM credentials, which this
    engine does not hold — sources come through as data)."""
    if isinstance(source, dict):
        return source
    import yaml

    with open(source, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def resolve_sources(cfg: dict, base_path: "str | None" = None) -> list[tuple[str, str]]:
    """Config → ordered [(kind, absolute_path)] list."""
    out: list[tuple[str, str]] = []

    def resolve(p: str) -> str:
        if base_path and not os.path.isabs(p):
            return os.path.join(base_path, p)
        return p

    for entry in cfg.get("sources", []):
        kind, path = entry["kind"], entry["path"]
        if kind not in ("disease", "medicine", "nursing_home", "insurance", "policy_text"):
            raise ValueError(f"unknown source kind: {kind}")
        out.append((kind, resolve(path)))
    groups = cfg.get("data_sources", {})
    unknown_groups = set(groups) - {"medical", "insurance", "senior_care"}
    if unknown_groups:  # silent drop would lose whole sources on a typo
        raise ValueError(f"unknown data_sources group(s): {sorted(unknown_groups)}")
    for path in groups.get("medical", []):
        kind = "medicine" if "medicine" in os.path.basename(path).lower() else "disease"
        out.append((kind, resolve(path)))
    for path in groups.get("insurance", []):
        out.append(("insurance", resolve(path)))
    for path in groups.get("senior_care", []):
        out.append(("nursing_home", resolve(path)))
    return out


def build_docs_from_config(cfg_or_path: "str | dict",
                           base_path: "str | None" = None) -> pa.Table:
    """Named inputs → converter per kind → one span-doc table.  This is the
    reference's config → data_collection → loader wiring as one call; the
    result feeds ``pipelines.kg.build_graph`` / any other pipeline."""
    from .convert import (
        build_docs_table,
        diseases_json_to_records,
        insurance_json_to_records,
        medicines_json_to_records,
        nursing_csv_to_records,
        policy_text_to_records,
    )

    cfg = load_pipeline_config(cfg_or_path)
    if base_path is None and isinstance(cfg_or_path, str):
        base_path = os.path.dirname(os.path.abspath(cfg_or_path))

    collected: dict[str, list] = {
        "disease": [], "medicine": [], "nursing_home": [],
        "insurance": [], "policy_text": [],
    }
    for kind, path in resolve_sources(cfg, base_path):
        with open(path, "r", encoding="utf-8-sig") as f:
            payload = f.read()
        if kind == "disease":
            collected[kind].extend(diseases_json_to_records(payload))
        elif kind == "medicine":
            collected[kind].extend(medicines_json_to_records(payload))
        elif kind == "nursing_home":
            collected[kind].extend(nursing_csv_to_records(payload))
        elif kind == "insurance":
            collected[kind].extend(insurance_json_to_records(payload))
        else:
            collected[kind].extend(policy_text_to_records(payload))
    return build_docs_table(
        diseases=collected["disease"],
        medicines=collected["medicine"],
        nursing_homes=collected["nursing_home"],
        insurances=collected["insurance"],
        policy_texts=collected["policy_text"],
    )


def dataset_from_config(cfg_or_path: "str | dict", *,
                        base_path: "str | None" = None,
                        override_num_blocks: "int | None" = None):
    """Config → span-doc Ray Dataset (the one-liner pipeline entry)."""
    from .readers import from_arrow_docs

    return from_arrow_docs(
        build_docs_from_config(cfg_or_path, base_path),
        override_num_blocks=override_num_blocks,
    )
