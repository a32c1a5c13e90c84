"""The KG-construction pipeline (reference entry point 3.1 + 3.2 re-shaped
Ray-Data-first, SURVEY.md §3):

    read docs → map_batches(extract_elements) → merge shuffle (upsert/dedup)
    → [optional canonicalization] → sorted nodes/edges materialization

No driver-side materialization of the input; the only full pin is the
*deduped* graph (`merged.materialize()`) in the in-memory API, which is the
final result set, not the input stream.  The checkpointed at-scale path
(`state.checkpoint.run_checkpointed`) streams extract output to disk per
partition instead.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..materialize import (
    edges_to_triples,
    finalize_edges,
    finalize_nodes,
)
from ..merge import merge_elements
from ..stages.records import extract_elements

if TYPE_CHECKING:  # pragma: no cover
    from ray.data import Dataset

EXTRACT_BATCH_SIZE = 1024  # docs per batch; span text varies ~100× in length


def extract(docs: "Dataset", batch_size: int = EXTRACT_BATCH_SIZE) -> "Dataset":
    """Docs → unified graph-element stream (stateless vectorized tasks)."""
    return docs.map_batches(
        extract_elements, batch_format="pyarrow", batch_size=batch_size
    )


def build_graph(
    docs: "Dataset",
    *,
    num_buckets: int = 64,
    salted: bool = False,
    canonicalize: bool = False,
    batch_size: int = EXTRACT_BATCH_SIZE,
):
    """Full pipeline → (nodes Dataset, edges Dataset), both sorted.

    ``canonicalize=True`` additionally runs the surface-form union-find
    clustering (D5) and remaps node names and both edge endpoints; the
    default is off to match the reference's emitted graph exactly
    (canonicalization is the reference's *planned* alias stage —
    Documents/2.16优化汇总.md:98)."""
    merged = merge_elements(
        extract(docs, batch_size), num_buckets=num_buckets, salted=salted
    )
    if canonicalize:
        from ..stages.link import canonicalize_elements

        merged = canonicalize_elements(
            merged, num_buckets=num_buckets, salted=salted
        )
    # the deduped graph is the final result set — pin it once so the nodes
    # and edges consumers don't re-run the extract+shuffle lineage twice
    merged = merged.materialize()
    return finalize_nodes(merged), finalize_edges(merged)


def build_triples(docs: "Dataset", **kwargs) -> "Dataset":
    """Docs → canonical (subj, pred, obj) triples — the P/R-gate output."""
    _, edges = build_graph(docs, **kwargs)
    return edges_to_triples(edges)
