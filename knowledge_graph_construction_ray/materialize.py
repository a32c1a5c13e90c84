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


def _strip_props_column(props) -> list:
    """Strip once per DISTINCT props string: the JSON round-trip is the
    dominant node-side cost, and props values repeat heavily (stub '{}'
    rows, replicated/re-ingested corpora) — factorize makes the cost
    O(distinct) instead of O(rows) with identical output."""
    import numpy as np

    codes, uniq = pd.factorize(np.asarray(props, dtype=object))
    stripped_uniq = np.asarray([_strip_tags(p) for p in uniq], dtype=object)
    stripped = stripped_uniq[codes] if len(codes) else stripped_uniq
    return stripped.tolist()


def _nodes_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df[df["kind"] == "node"]
    return pa.Table.from_pydict(
        {
            "label": df["label"].tolist(),
            "name": df["name"].tolist(),
            "props": _strip_props_column(df["props"].to_numpy()),
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


def write_graph_sorted(
    docs: "Dataset",
    nodes_dir: str,
    edges_dir: str,
    *,
    num_buckets: int = 64,
    salted: bool = False,
    batch_size: int | None = None,
) -> dict:
    """The fused at-scale T3 path: extract → combine → range exchange →
    per-bucket fold + sorted split + DIRECT partitioned write, all inside
    the bucket task.

    Versus ``build_graph(...)`` + two ``write_parquet`` consumers this
    removes the merged-elements materialization (one object-store write +
    TWO full scans) and both finalize projections — the folded bucket
    never leaves the worker that folds it.  Output layout is
    ``{nodes,edges}_dir/part-{bucket:05d}.parquet``: deterministic names
    make task retries idempotent (a re-executed bucket overwrites its own
    file), the per-bucket fragments are the resumable unit, and because
    bucket ids ascend with merge_key ranges (``merge.range_bucketed_elements``)
    the lexicographic file order gives readers the same globally sorted
    tables the Dataset API path materializes.  Buckets are pure-kind by
    the stratified boundary construction; the split below handles the
    bounds-empty degenerate case (single mixed bucket) all the same.

    Returns ``{"nodes": N, "edges": M, "buckets": B}`` (counts summed
    from the per-bucket stats rows — the only thing that reaches the
    driver)."""
    import os

    import pyarrow.parquet as pq

    from .merge import (
        _fold_bucket_sorted,
        _is_edge_mask,
        range_bucketed_elements,
    )
    from .pipelines.kg import extract

    os.makedirs(nodes_dir, exist_ok=True)
    os.makedirs(edges_dir, exist_ok=True)
    kwargs = {"batch_size": batch_size} if batch_size else {}
    # narrow exchange: merge_key already encodes kind + every identity
    # field; the fold needs only (merge_key, props, src_rank, seq) and the
    # writer below reconstructs the fields by splitting the key
    bucketed = range_bucketed_elements(
        extract(docs, **kwargs), num_buckets=num_buckets, salted=salted, narrow=True
    )
    if salted:
        from .merge import _fold_bucket, _to_narrow_table

        bucketed = bucketed.groupby(["bucket", "salt"]).map_groups(
            lambda df: _to_narrow_table(_fold_bucket(df), ("bucket",)),
            batch_format="pandas",
        )

    def fold_write(df: pd.DataFrame) -> pd.DataFrame:
        # output dirs must be shared storage on a multi-node cluster
        # (object store / NFS URI), same contract as write_parquet
        os.makedirs(nodes_dir, exist_ok=True)
        os.makedirs(edges_dir, exist_ok=True)
        df = _fold_bucket_sorted(df)
        bucket = int(df["bucket"].iloc[0]) if len(df) else 0
        is_edge = _is_edge_mask(df)
        nodes = df[~is_edge]
        edges = df[is_edge]
        if len(nodes):
            # N \x1f label \x1f name — n=2 keeps any later separator
            # inside `name` (key injectivity needs \x1f-free fields
            # anyway; see range_bucketed_elements)
            parts = nodes["merge_key"].str.split("\x1f", n=2, expand=True)
            pq.write_table(
                pa.Table.from_pydict(
                    {
                        "label": parts[1].tolist(),
                        "name": parts[2].tolist(),
                        "props": _strip_props_column(nodes["props"].to_numpy()),
                    },
                    schema=NODES_SCHEMA,
                ),
                f"{nodes_dir}/part-{bucket:05d}.parquet",
            )
        if len(edges):
            parts = edges["merge_key"].str.split("\x1f", n=5, expand=True)
            pq.write_table(
                pa.Table.from_pydict(
                    {
                        name: parts[i + 1].tolist()
                        for i, name in enumerate(EDGES_SCHEMA.names)
                    },
                    schema=EDGES_SCHEMA,
                ),
                f"{edges_dir}/part-{bucket:05d}.parquet",
            )
        return pd.DataFrame(
            {"bucket": [bucket], "nodes": [len(nodes)], "edges": [len(edges)]}
        )

    stats_ds = bucketed.groupby("bucket").map_groups(
        fold_write, batch_format="pandas"
    ).materialize()
    stats = stats_ds.to_pandas()
    return {
        "nodes": int(stats["nodes"].sum()),
        "edges": int(stats["edges"].sum()),
        "buckets": int(len(stats)),
        "ray_stats": stats_ds.stats(),
    }


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
