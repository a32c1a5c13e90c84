"""Cross-partition state: union-find, checkpoints, lineage, metrics."""
