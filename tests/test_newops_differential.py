"""Differential fuzzing for the late-round-3 relational operators:
seeded random tables (skewed keys, negative ids, duplicate values,
2-decimal measures) written to a tmp sf_dir, then the Ray query and its
oracle SQL run side-by-side in DuckDB — outputs must match exactly,
value-for-value.  Catches convention drift (rounding, sign of modulo,
quantile rank, overflow) the fixed testdata can't."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from knowledge_graph_construction_ray.query.relational import QUERIES


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(os.path.join(tmp_path, f"{name}.parquet"), index=False)


def _run(tmp_path, qname: str, tables: dict[str, pd.DataFrame]) -> None:
    for t, df in tables.items():
        _write(tmp_path, t, df)
    fn, sql = QUERIES[qname]
    got = fn(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    exp = con.execute(sql).df().reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    got = got[sorted(got.columns)].astype(str)
    exp = exp[sorted(got.columns)].astype(str)
    # order-insensitive exact comparison (same discipline as the driver)
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


def _events(rng, n: int) -> pd.DataFrame:
    # skew: one hot user holds ~30% of events
    users = np.where(
        rng.random(n) < 0.3, 7, rng.integers(0, max(2, n // 4), size=n)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, size=n), unit="s"),
            "user_id": users,
            "event_type": rng.choice(["view", "click", "buy"], size=n),
            "value": np.round(rng.random(n) * 100, 3),
            "props": rng.choice(["{}", '{"a":1}', "x"], size=n),
        }
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_profile_events_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    _run(tmp_path, "profile_events", {"events": _events(rng, n)})


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_events_key_skew_differential(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 500))
    _run(tmp_path, "events_key_skew", {"events": _events(rng, n)})


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_mixture_epochs_differential(ray_session, tmp_path, seed):
    """Includes NEGATIVE doc ids — the sign-normalized modulo must agree
    between numpy floor-mod and the SQL ((x%P)+P)%P spelling."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 300))
    docs = pd.DataFrame(
        {
            "doc_id": rng.integers(-(10**12), 10**12, size=n).astype(np.int64),
            "text": ["w " * int(k) for k in rng.integers(1, 9, size=n)],
            "lang": rng.choice(["en", "zh"], size=n),
            "source": [f"src{int(s)}" for s in rng.integers(0, 37, size=n)],
            "n_chars": rng.integers(1, 50, size=n).astype(np.int64),
        }
    )
    _run(tmp_path, "mixture_epochs", {"documents": docs})


@pytest.mark.parametrize("seed", [16, 17, 18])
def test_hour_regression_differential(ray_session, tmp_path, seed):
    """Random event streams (trend direction varies with seed, including
    constant-hour degenerate groups) — the truncating-division slope
    must match DuckDB's HUGEINT `//` exactly, negatives included."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 500))
    ev = _events(rng, n)
    # inject a trend so slopes are decisively non-zero in both signs
    hod = (ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000) % 24
    ev["value"] = np.round(
        ev["value"] + np.where(ev["event_type"] == "buy", 1.0, -1.0) * hod * 3.5, 3
    )
    # a degenerate group: every 'click' at the same hour (zero x-variance)
    base = pd.Timestamp("2024-06-01 07:00:00")
    ev.loc[ev["event_type"] == "click", "ts"] = base
    _run(tmp_path, "events_hour_regression", {"events": ev})


@pytest.mark.parametrize("seed", [13, 14, 15])
def test_skyline_differential(ray_session, tmp_path, seed):
    """Dense tie structure (few distinct prices/dates) so domination
    with equal coordinates is exercised; also brute-force-checked."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 50, size=n).astype(np.int64),
            "o_orderstatus": rng.choice(["O", "F", "P"], size=n),
            "o_totalprice": np.round(rng.integers(1, 30, size=n) * 10.07, 2),
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 25, size=n), unit="D"),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH"], size=n),
        }
    )
    _run(tmp_path, "orders_price_date_skyline", {"orders": orders})
    # brute-force non-domination check on the engine output
    fn, _ = QUERIES["orders_price_date_skyline"]
    got = fn(str(tmp_path))
    pts = set(
        zip(
            np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64),
            (
                orders["o_orderdate"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000
            ).to_numpy(),
        )
    )
    sky = {
        p
        for p in pts
        if not any(
            q != p and q[0] <= p[0] and q[1] <= p[1] for q in pts
        )
    }
    assert set(zip(got["price_c"], got["day"])) == sky


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_qty_variance_differential(ray_session, tmp_path, seed):
    """2-decimal quantities at adversarial magnitudes (up to 10^7) —
    the Python-int driver combine must agree with DuckDB HUGEINT."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 600))
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 10**9, size=n).astype(np.int64),
            "l_partkey": rng.integers(0, 10**6, size=n).astype(np.int64),
            "l_suppkey": rng.integers(0, 10**4, size=n).astype(np.int64),
            "l_linenumber": rng.integers(1, 7, size=n).astype(np.int32),
            "l_quantity": np.round(rng.random(n) * 10**7, 2),
            "l_extendedprice": np.round(rng.random(n) * 10**5, 2),
            "l_discount": np.round(rng.random(n) * 0.1, 2),
            "l_tax": np.round(rng.random(n) * 0.08, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], size=n),
            "l_linestatus": rng.choice(["O", "F"], size=n),
            "l_shipdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 365, size=n), unit="D"),
        }
    )
    _run(tmp_path, "lineitem_qty_variance", {"lineitem": li})
