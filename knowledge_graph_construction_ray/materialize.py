"""Final sorted, deduplicated graph materialization (operator T3) and the
canonical triple view for the P/R gate.

The reference approximates "sorted deduplicated graph" via Neo4j's keyed
store; here it is an explicit ``sort`` + partitioned Parquet write (Lance
when pylance is available — see sources.readers).  Output layout is
resumable: ``nodes/`` and ``edges/`` are directories of part files, never
one giant file.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from .schema import EDGES_SCHEMA, NODES_SCHEMA, TRIPLES_SCHEMA

try:
    from ray.data import Dataset
except ImportError:  # pragma: no cover
    Dataset = object  # type: ignore


def _strip_tags(props: str) -> str:
    """Tagged {k: [rank, seq, v]} → plain {k: v}, nulls (deletions) removed,
    keys sorted for deterministic output."""
    merged = json.loads(props)
    return json.dumps(
        {k: tag[2] for k, tag in merged.items() if tag[2] is not None},
        ensure_ascii=False,
        sort_keys=True,
    )


def _nodes_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df[df["kind"] == "node"]
    # strip once per DISTINCT props string: the JSON round-trip is the
    # dominant node-side cost, and props values repeat heavily (stub '{}'
    # rows, replicated/re-ingested corpora) — factorize makes the cost
    # O(distinct) instead of O(rows) with identical output
    import numpy as np
    import pandas as pd

    codes, uniq = pd.factorize(df["props"].to_numpy())
    stripped_uniq = np.asarray([_strip_tags(p) for p in uniq], dtype=object)
    stripped = stripped_uniq[codes] if len(codes) else stripped_uniq
    return pa.Table.from_pydict(
        {
            "label": df["label"].tolist(),
            "name": df["name"].tolist(),
            "props": stripped.tolist(),
        },
        schema=NODES_SCHEMA,
    )


def _edges_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df[df["kind"] == "edge"]
    return pa.Table.from_pydict(
        {name: df[name].tolist() for name in EDGES_SCHEMA.names},
        schema=EDGES_SCHEMA,
    )


def finalize_nodes(merged_elements: "Dataset", *, assume_sorted: bool = False) -> "Dataset":
    """Deduped elements → sorted nodes table (label, name, props-json).

    ``assume_sorted=True`` skips the Sort exchange: the upstream
    ``merge_elements_sorted`` plan already emits blocks globally ordered
    by ``merge_key`` (sort-faithful to ``(label, name)`` within nodes),
    and the split projection below preserves block order."""
    nodes = merged_elements.map_batches(_nodes_batch, batch_format="pyarrow")
    return nodes if assume_sorted else nodes.sort(["label", "name"])


def finalize_edges(merged_elements: "Dataset", *, assume_sorted: bool = False) -> "Dataset":
    """Deduped elements → sorted edges table (5-tuple)."""
    edges = merged_elements.map_batches(_edges_batch, batch_format="pyarrow")
    return edges if assume_sorted else edges.sort(list(EDGES_SCHEMA.names))


def _triples_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    return pa.Table.from_pydict(
        {
            "subj": (df["src_label"] + ":" + df["src_name"]).tolist(),
            "pred": df["rel"].tolist(),
            "obj": (df["dst_label"] + ":" + df["dst_name"]).tolist(),
        },
        schema=TRIPLES_SCHEMA,
    )


def edges_to_triples(edges: "Dataset") -> "Dataset":
    """Canonical (subj, pred, obj) strings — the P/R-gate view
    (subj = "{src_label}:{src_name}", obj = "{dst_label}:{dst_name}")."""
    return edges.map_batches(_triples_batch, batch_format="pyarrow")


def triples_set(triples: "Dataset") -> set[tuple[str, str, str]]:
    """Small-result helper for tests/gating: collect to a Python set."""
    out: set[tuple[str, str, str]] = set()
    for b in triples.iter_batches(batch_size=65536, batch_format="pandas"):
        out.update(zip(b["subj"], b["pred"], b["obj"]))
    return out


def nodes_to_pandas(nodes: "Dataset") -> pd.DataFrame:
    return nodes.to_pandas()
