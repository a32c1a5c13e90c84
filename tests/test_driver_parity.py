"""Mimic the driver's correctness gate: run every queries() entry at
sf0.001 and compare against its oracle_sql() via DuckDB — row count, schema
(sorted column names) and an order-insensitive value hash."""

import hashlib

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _to_pandas(result):
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    # golden-parquet filenames carry the scale tag (the real driver's SQL
    # reads the sf0.01 goldens; this test runs at sf0.001 → regenerate at
    # its scale and point the SQL at those files — the sf0.01 goldens are
    # untouched, so a concurrent driver run cannot be clobbered)
    from knowledge_graph_construction_ray.golden import sf_tag, write_goldens

    write_goldens(SF_DIR)
    sql = {
        name: s.replace("sf0.01", sf_tag(SF_DIR)) for name, s in sql.items()
    }
    return qs, sql


def _sql_checked():
    from knowledge_graph_construction_ray.query.relational import QUERIES

    return [n for n, (_f, sql) in QUERIES.items() if sql is not None]


def _rows_only():
    from knowledge_graph_construction_ray.query.relational import QUERIES

    return [n for n, (_f, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name", _sql_checked())
def test_query_matches_duckdb_oracle(name, con, contract):
    qs, sqls = contract
    got = _to_pandas(qs[name](SF_DIR)).reset_index(drop=True)
    exp = con.execute(sqls[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: cols {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert _value_hash(got) == _value_hash(exp), f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", _rows_only())
def test_rows_only_query_runs(name, contract):
    qs, _ = contract
    got = _to_pandas(qs[name](SF_DIR))
    assert len(got) >= 0 and len(got.columns) >= 1


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    result = e.entry()
    df = _to_pandas(result)
    assert len(df) > 0
    assert sorted(df.columns) == ["obj", "pred", "subj"]


def test_sliding_window_counts_timestamp_peers(ray_session):
    """SQL RANGE frames count peer rows with the same ts; the Ray kernel
    must too (two events, same user, same timestamp → both count 2)."""
    import pandas as pd

    from knowledge_graph_construction_ray.query.relational import events_sliding

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "event_id": [10, 11, 12],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 02:00:00"]
            ),
        }
    )
    import duckdb

    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        """
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS n_last_hour
        FROM events ORDER BY event_id
        """
    ).df()
    # run the Ray implementation over a parquet file of the crafted frame
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got2 = events_sliding(d).reset_index(drop=True)
    assert list(got2["n_last_hour"]) == list(exp["n_last_hour"]) == [2, 2, 1]
