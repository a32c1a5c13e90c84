"""High-cardinality temporal-join bench: the as-of and band joins must
stay bucket-shuffle-shaped at ≥100k keys (no per-key dispatch, no per-key
cartesian) — measured against the plain hourly aggregate on the same
corpus, mirroring tools/bench_sessions.py's criterion.

Usage: python tools/bench_temporal.py [--rows 2000000] [--users 200000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_events(path: str, n_rows: int, n_users: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(13)
    base = np.int64(1_700_000_000_000_000)  # µs epoch
    kinds = np.array(["click", "error", "view", "purchase", "signup"])
    t = pa.Table.from_pydict(
        {
            "event_id": np.arange(n_rows, dtype=np.int64),
            "ts": pa.array(
                base
                + rng.randint(0, 30 * 86_400_000_000, size=n_rows).astype(np.int64),
                type=pa.timestamp("us"),
            ),
            "user_id": rng.randint(0, n_users, size=n_rows).astype(np.int64),
            "event_type": kinds[rng.randint(0, len(kinds), size=n_rows)],
            "value": (rng.rand(n_rows) * 100).round(2),
        }
    )
    pq.write_table(t, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import tempfile

    d = tempfile.mkdtemp(prefix="kg_temporal_bench_")
    build_events(os.path.join(d, "events.parquet"), args.rows, args.users)

    from knowledge_graph_construction_ray.query.relational import (
        events_asof_error,
        events_band_views,
        events_hourly,
    )

    from knowledge_graph_construction_ray.query.relational import (
        events_incident_overlap,
    )

    events_hourly(d)  # warm the worker pool / shuffle actors
    t0 = time.time(); hourly = events_hourly(d); t_hourly = time.time() - t0
    t0 = time.time(); asof = events_asof_error(d); t_asof = time.time() - t0
    t0 = time.time(); band = events_band_views(d); t_band = time.time() - t0
    t0 = time.time(); ov = events_incident_overlap(d, min_value=99.99); t_ov = time.time() - t0
    print(
        {
            "rows": args.rows,
            "users": int(args.users),
            "hourly_sec": round(t_hourly, 2),
            "asof_sec": round(t_asof, 2),
            "band_sec": round(t_band, 2),
            "overlap_sec": round(t_ov, 2),
            "asof_over_hourly": round(t_asof / t_hourly, 2),
            "band_over_hourly": round(t_band / t_hourly, 2),
            "overlap_over_hourly": round(t_ov / t_hourly, 2),
            "n_asof_rows": len(asof),
            "n_band_pairs": len(band),
            "n_overlap_pairs": len(ov),
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
