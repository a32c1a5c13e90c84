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
from ..merge import merge_elements, merge_elements_sorted
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
    sort_strategy: str = "range_merge",
):
    """Full pipeline → (nodes Dataset, edges Dataset), both sorted.

    ``canonicalize=True`` additionally runs the surface-form union-find
    clustering (D5) and remaps node names and both edge endpoints; the
    default is off to match the reference's emitted graph exactly
    (canonicalization is the reference's *planned* alias stage —
    Documents/2.16优化汇总.md:98).

    ``sort_strategy``: ``"range_merge"`` (default) keys the merge shuffle
    on merge_key RANGES so the fold output is already globally ordered
    and T3 costs zero extra exchanges — with ``canonicalize=True`` the
    POST-REMAP re-merge is the range-keyed one, restoring order after
    the rename; ``"post_sort"`` is the original hash-bucket merge + two
    explicit Sorts (kept as the parity oracle and as the fallback under
    ``ShuffleStrategy.HASH_SHUFFLE``)."""
    _, nodes, edges = merge_and_finalize(
        extract(docs, batch_size),
        num_buckets=num_buckets,
        salted=salted,
        canonicalize=canonicalize,
        sort_strategy=sort_strategy,
    )
    return nodes, edges


def merge_and_finalize(
    elements: "Dataset",
    *,
    num_buckets: int = 64,
    salted: bool = False,
    canonicalize: bool = False,
    sort_strategy: str = "range_merge",
):
    """Element stream → (merged, nodes, edges); shared by the in-memory
    API above and the checkpointed at-scale path (``state.checkpoint``).

    ``merged`` is the deduped element set, pinned ONCE (it is the final
    result set, not the input stream) so the nodes and edges consumers —
    and the checkpoint runner's count pass — don't re-run the
    extract+shuffle lineage."""
    sort_strategy = _resolve_sort_strategy(sort_strategy)
    if sort_strategy == "post_sort":
        merged = merge_elements(elements, num_buckets=num_buckets, salted=salted)
        if canonicalize:
            from ..stages.link import canonicalize_elements

            merged = canonicalize_elements(
                merged, num_buckets=num_buckets, salted=salted
            )
        merged = merged.materialize()
        return merged, finalize_nodes(merged), finalize_edges(merged)
    if canonicalize:
        from ..stages.link import canonicalize_elements

        # the pre-clustering merge is range-keyed too, so BOTH exits of
        # canonicalize_elements (remapped re-merge, or the no-mapping
        # passthrough of its input) come back globally ordered — two
        # post-merge Sorts dropped, same as the plain headline
        merged = merge_elements_sorted(
            elements, num_buckets=num_buckets, salted=salted
        )
        merged = canonicalize_elements(
            merged, num_buckets=num_buckets, salted=salted, sorted_output=True
        ).materialize()
        return (
            merged,
            finalize_nodes(merged, assume_sorted=True),
            finalize_edges(merged, assume_sorted=True),
        )
    merged = merge_elements_sorted(
        elements, num_buckets=num_buckets, salted=salted
    ).materialize()
    return (
        merged,
        finalize_nodes(merged, assume_sorted=True),
        finalize_edges(merged, assume_sorted=True),
    )


def _resolve_sort_strategy(sort_strategy: str) -> str:
    """Validate the requested plan and pin it to what the configured Ray
    shuffle can actually guarantee: under ``ShuffleStrategy.HASH_SHUFFLE``
    ``groupby().map_groups()`` places groups by key hash (per-partition
    sort only), so the range plan's global-order guarantee would silently
    not hold — fall back to the explicit-Sort plan rather than emit
    unsorted output."""
    if sort_strategy not in ("range_merge", "post_sort"):
        raise ValueError(f"unknown sort_strategy {sort_strategy!r}")
    if sort_strategy == "range_merge" and _hash_shuffle_configured():
        return "post_sort"
    return sort_strategy


def _hash_shuffle_configured() -> bool:
    try:
        from ray.data.context import DataContext, ShuffleStrategy
    except ImportError:  # pragma: no cover - older Ray without the enum
        return False
    return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE


def build_triples(docs: "Dataset", **kwargs) -> "Dataset":
    """Docs → canonical (subj, pred, obj) triples — the P/R-gate output."""
    _, edges = build_graph(docs, **kwargs)
    return edges_to_triples(edges)
