"""Unit tests for the window-function kernels and the Bloom filter used by
the shuffle-avoiding semi join."""

import numpy as np
import pandas as pd
import pytest

from knowledge_graph_construction_ray.functions.bloom import Bloom64

# ---------------------------------------------------------------------------
# Bloom64
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    b = Bloom64(len(keys), fpp=0.01)
    b.add_many(keys)
    assert b.contains(keys).all()


def test_bloom_fpp_near_target():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    b = Bloom64(len(keys), fpp=0.01)
    b.add_many(keys)
    probe = rng.integers(-(2**62), -1, size=100_000, dtype=np.int64)  # disjoint
    fpp = b.contains(probe).mean()
    assert fpp < 0.03  # target 0.01; generous slack for hash variance


def test_bloom_empty_probe_and_tiny_build():
    b = Bloom64(1, fpp=0.01)
    b.add_many(np.array([42], dtype=np.int64))
    assert b.contains(np.empty(0, dtype=np.int64)).shape == (0,)
    assert b.contains(np.array([42], dtype=np.int64)).all()


def test_bloom_size_is_small():
    # ~1.2 bytes/key at 1% fpp — the reason to broadcast a Bloom instead of
    # the raw key set
    b = Bloom64(1_000_000, fpp=0.01)
    assert b.nbytes < 1.3 * 1_000_000


# ---------------------------------------------------------------------------
# Window kernels via the public query functions on crafted frames
# ---------------------------------------------------------------------------


def _events_dir(tmp_path, df):
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_rolling_max_resets_at_user_boundary(ray_session, tmp_path):
    from knowledge_graph_construction_ray.query.relational import (
        events_rolling_max,
    )

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
                 "2024-01-01 00:00", "2024-01-01 00:01"]
            ),
            "value": [9.0, 1.0, 2.0, 5.0, 3.0],
        }
    )
    out = events_rolling_max(_events_dir(tmp_path, df))
    # user 2's window must NOT see user 1's 9.0
    assert list(out["roll_max"]) == [9.0, 9.0, 9.0, 5.0, 5.0]


def test_prev_gap_drops_first_event_per_user(ray_session, tmp_path):
    from knowledge_graph_construction_ray.query.relational import (
        events_prev_gap,
    )

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:07",
                 "2024-01-01 00:00:01"]
            ),
        }
    )
    out = events_prev_gap(_events_dir(tmp_path, df))
    assert list(out["event_id"]) == [2]  # single-event user 2 contributes none
    assert list(out["prev_event_id"]) == [1]
    assert list(out["gap_us"]) == [7_000_000]
    assert out["gap_us"].dtype == np.int64


def test_price_rank_tie_semantics(ray_session, tmp_path):
    """Two equal prices share rank 1 and the next order gets rank 3 —
    RANK(), not ROW_NUMBER or DENSE_RANK."""
    from knowledge_graph_construction_ray.query.relational import (
        orders_price_rank,
    )

    df = pd.DataFrame(
        {
            "o_custkey": [1, 1, 1, 1],
            "o_orderkey": [10, 11, 12, 13],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4),
            "o_totalprice": [100.0, 100.0, 90.0, 80.0],
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    out = orders_price_rank(str(tmp_path))
    got = dict(zip(out["o_orderkey"], out["price_rank"]))
    assert got == {10: 1, 11: 1, 12: 3}  # rank 80.0 = 4 → filtered


def test_cum_spend_exact_cents(ray_session, tmp_path):
    from knowledge_graph_construction_ray.query.relational import (
        orders_cum_spend,
    )

    df = pd.DataFrame(
        {
            "o_custkey": [1, 1, 2],
            "o_orderkey": [10, 11, 12],
            "o_orderdate": pd.to_datetime(
                ["2024-01-02", "2024-01-01", "2024-01-01"]
            ),
            "o_totalprice": [0.1, 0.2, 5.0],  # floats that don't sum exactly
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    out = orders_cum_spend(str(tmp_path))
    got = dict(zip(out["o_orderkey"], out["cum_spend_cents"]))
    # date order: 11 (20c) then 10 (20+10=30c); user 2: 500c
    assert got == {11: 20, 10: 30, 12: 500}
    assert out["cum_spend_cents"].dtype == np.int64


def test_browse_no_buy_empty_result_keeps_schema(ray_session, tmp_path):
    from knowledge_graph_construction_ray.query.relational import (
        browse_no_buy_hours,
    )

    df = pd.DataFrame(
        {
            "user_id": [1],
            "ts": pd.to_datetime(["2024-01-01 00:00"]),
            "event_type": ["purchase"],  # no views at all → empty EXCEPT
        }
    )
    out = browse_no_buy_hours(_events_dir(tmp_path, df))
    assert list(out.columns) == ["user_id", "hour_bucket"]
    assert len(out) == 0
