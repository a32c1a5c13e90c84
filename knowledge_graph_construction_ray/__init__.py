"""knowledge_graph_construction_ray — a Ray-Data-native knowledge-graph
construction engine.

From-scratch re-expression of the data semantics of the reference repo
``Nelly-se/Knowledge-Graph-Construction`` (insurance_medical_kgqa) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (mention detection, entity linking),
salted groupby shuffles for node upsert / edge dedup / canonicalization, and a
final sorted, deduplicated, partitioned Parquet (Lance-ready) graph
materialization with per-partition checkpoints, lineage and metrics.

IMPORTANT: no module in this package calls ``ray.init()`` / ``ray.shutdown()``;
sessions are owned by the caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"
