"""Driver contract for the Ray-Data KG engine.

``entry()`` runs the flagship KG-construction pipeline over sf0.001-derived
inputs; ``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2) over the driver's parquet tables; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry (column names match
the Ray outputs exactly).

Per the driver contract, nothing here (nor in the library) calls
``ray.init()`` / ``ray.shutdown()`` — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline over sf0.001: the driver documents table is
    span-encoded into the doc-table contract and unioned with the
    deterministic fixture corpus (which carries the record kinds the
    TPC-H-ish tables don't), then the full KG build runs — extract →
    upsert/dedup shuffle → canonicalization → sorted materialization —
    returning the canonical (subj, pred, obj) triples Dataset."""
    from knowledge_graph_construction_ray.fixtures import generate_corpus
    from knowledge_graph_construction_ray.pipelines.kg import build_triples
    from knowledge_graph_construction_ray.query.relational import _documents_as_docs
    from knowledge_graph_construction_ray.sources.readers import from_arrow_docs

    fixture = from_arrow_docs(generate_corpus(), override_num_blocks=8)
    driver_docs = _documents_as_docs("/root/testdata/sf0.001", id_offset=500_000)
    return build_triples(fixture.union(driver_docs), canonicalize=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from knowledge_graph_construction_ray.golden import write_goldens
    from knowledge_graph_construction_ray.query.relational import QUERIES

    write_goldens()  # golden-parquet oracles must exist before either side runs
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from knowledge_graph_construction_ray.golden import write_goldens
    from knowledge_graph_construction_ray.query.relational import QUERIES

    write_goldens()
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
