"""High-cardinality sessionization bench (round-2 verdict criterion: at
≥100k users, events_sessions must complete within 2× of the hourly-window
aggregate on the same data — i.e. the per-key map_groups dispatch is gone
and both are bucket-shuffle-shaped).

Usage: python tools/bench_sessions.py [--rows 2000000] [--users 200000] [--cpus 32]
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

    rng = np.random.RandomState(11)
    user = rng.randint(0, n_users, size=n_rows).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)  # µs epoch
    ts = base + rng.randint(0, 30 * 86_400_000_000, size=n_rows).astype(np.int64)
    kinds = np.array(["click", "error", "view", "purchase", "signup"])
    t = pa.Table.from_pydict(
        {
            "user_id": user,
            "event_id": np.arange(n_rows, dtype=np.int64),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "event_type": kinds[rng.randint(0, len(kinds), size=n_rows)],
            # 2-decimal values in [0, 100): integer-cents-exact for the
            # outlier op, realistic tail for its threshold
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

    d = tempfile.mkdtemp(prefix="kg_sessions_bench_")
    build_events(os.path.join(d, "events.parquet"), args.rows, args.users)

    from knowledge_graph_construction_ray.query.relational import (
        events_hourly,
        events_sessions,
        events_sliding,
    )

    from knowledge_graph_construction_ray.query.relational import (
        events_funnel_users,
        events_value_outliers,
        events_weekly_retention,
    )

    # warm the worker pool/shuffle actors on the small path first
    events_hourly(d)
    t0 = time.time(); hourly = events_hourly(d); t_hourly = time.time() - t0
    t0 = time.time(); sessions = events_sessions(d); t_sessions = time.time() - t0
    t0 = time.time(); sliding = events_sliding(d); t_sliding = time.time() - t0
    t0 = time.time(); funnel = events_funnel_users(d); t_funnel = time.time() - t0
    t0 = time.time(); ret = events_weekly_retention(d); t_ret = time.time() - t0
    t0 = time.time(); outl = events_value_outliers(d); t_outl = time.time() - t0
    print(
        {
            "rows": args.rows,
            "users": int(args.users),
            "hourly_sec": round(t_hourly, 2),
            "sessions_sec": round(t_sessions, 2),
            "sliding_sec": round(t_sliding, 2),
            "funnel_sec": round(t_funnel, 2),
            "retention_sec": round(t_ret, 2),
            "outliers_sec": round(t_outl, 2),
            "sessions_over_hourly": round(t_sessions / t_hourly, 2),
            "funnel_over_hourly": round(t_funnel / t_hourly, 2),
            "retention_over_hourly": round(t_ret / t_hourly, 2),
            "n_hourly": len(hourly),
            "n_sessions": len(sessions),
            "n_sliding": len(sliding),
            "n_funnel_users": len(funnel),
            "n_retention_cells": len(ret),
            "n_outliers": len(outl),
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
