"""Property test for functions/groupby.bucketed_agg: must equal a plain
pandas groupby on random frames for every supported aggregation."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=200))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-1000, 1000), min_size=n, max_size=n))
    key2 = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    return pd.DataFrame({"k": keys, "k2": key2, "v": vals})


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frames(), st.integers(min_value=1, max_value=8))
def test_bucketed_agg_equals_pandas(ray_session, df, num_buckets):
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import bucketed_agg

    ds = rd.from_pandas(df).repartition(3)
    got = (
        bucketed_agg(
            ds, ["k", "k2"],
            {"s": ("v", "sum"), "n": ("v", "size"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            num_buckets=num_buckets,
        )
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k", "k2"], as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"), mn=("v", "min"), mx=("v", "max"))
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "n": "int64", "mn": "int64", "mx": "int64"}),
        exp.astype({"s": "int64", "n": "int64", "mn": "int64", "mx": "int64"}),
    )


@st.composite
def temporal_inputs(draw):
    n_left = draw(st.integers(1, 40))
    left = pd.DataFrame(
        {
            "lid": range(n_left),
            "k": draw(st.lists(st.integers(0, 5), min_size=n_left, max_size=n_left)),
            "t": draw(st.lists(st.integers(0, 50), min_size=n_left, max_size=n_left)),
        }
    )
    # unique (k, rt) pairs on the right: the as-of tie-break is only
    # deterministic when the right time is unique per key (documented)
    pairs = sorted(
        draw(st.sets(st.tuples(st.integers(0, 7), st.integers(0, 50)), max_size=40))
    )
    import numpy as np

    right = pd.DataFrame(
        {
            "k": np.array([p[0] for p in pairs], dtype=np.int64),
            "rt": np.array([p[1] for p in pairs], dtype=np.int64),
            "rid": np.arange(len(pairs), dtype=np.int64),
        }
    )
    lower = draw(st.integers(-15, 5))
    upper = lower + draw(st.integers(0, 15))
    return left, right, lower, upper


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(temporal_inputs(), st.integers(min_value=1, max_value=4))
def test_temporal_joins_equal_bruteforce(ray_session, inputs, num_buckets):
    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.asof import asof_join, band_join

    left, right, lower, upper = inputs
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))

    asof = asof_join(
        lds, rds, by="k", left_on="t", right_on="rt",
        right_cols={"rid": "last_rid"}, num_buckets=num_buckets,
    ).to_pandas()
    assert len(asof) == len(left)
    by_lid = dict(zip(asof["lid"], asof["last_rid"]))
    for row in left.itertuples():
        cand = right[(right["k"] == row.k) & (right["rt"] <= row.t)]
        want = cand.loc[cand["rt"].idxmax(), "rid"] if len(cand) else None
        got = by_lid[row.lid]
        assert (pd.isna(got) and want is None) or got == want

    from knowledge_graph_construction_ray.query.ops import _to_pandas

    band = _to_pandas(
        band_join(
            lds, rds, by="k", left_on="t", right_on="rt",
            lower=lower, upper=upper, right_cols={"rid": "rid"},
            num_buckets=num_buckets,
        ),
        ["lid", "k", "t", "rid"],
    )
    want_pairs = {
        (l.lid, r.rid)
        for l in left.itertuples()
        for r in right.itertuples()
        if l.k == r.k and l.t + lower <= r.rt <= l.t + upper
    }
    assert set(zip(band["lid"], band["rid"])) == want_pairs
    assert len(band) == len(want_pairs)


def test_rollup_agg_three_keys_vs_pandas(ray_session):
    """rollup_agg at 3 keys == pandas groupby per prefix level, with
    'ALL' markers and string-cast keys; exercises the re-aggregation
    path (sum of sums, min of mins) across two coarsening steps."""
    import numpy as np
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import rollup_agg

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 3, 200),
            "b": rng.choice(["x", "y"], 200),
            "c": rng.integers(0, 4, 200),
            "v": rng.integers(-50, 50, 200).astype("int64"),
        }
    )
    got = (
        rollup_agg(
            rd.from_pandas(df),
            ["a", "b", "c"],
            {"n": ("v", "size"), "s": ("v", "sum"), "mn": ("v", "min")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )

    levels = []
    for i in (3, 2, 1):
        keys = ["a", "b", "c"][:i]
        lv = df.groupby(keys, as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), mn=("v", "min")
        )
        for k in ["a", "b", "c"]:
            lv[k] = lv[k].astype(str) if k in keys else "ALL"
        levels.append(lv[["a", "b", "c", "n", "s", "mn"]])
    total = pd.DataFrame(
        {
            "a": ["ALL"], "b": ["ALL"], "c": ["ALL"],
            "n": [len(df)], "s": [df["v"].sum()], "mn": [df["v"].min()],
        }
    )
    exp = (
        pd.concat(levels + [total], ignore_index=True)
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )
    got["n"] = got["n"].astype("int64")
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp.astype({"s": "int64", "mn": "int64"}))


def test_rollup_agg_rejects_non_mergeable(ray_session):
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import rollup_agg

    with pytest.raises(ValueError, match="non-mergeable"):
        rollup_agg(
            rd.from_pandas(pd.DataFrame({"a": [1], "v": [1.0]})),
            ["a"],
            {"m": ("v", "mean")},
        )


def test_scrub_empty_blocks_unpoisons_native_join(ray_session):
    """A schema-less empty block (what map_groups emits for an all-empty
    output partition) poisons Dataset.join; scrub_empty_blocks must make
    the join safe without changing the rows."""
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import scrub_empty_blocks
    from knowledge_graph_construction_ray.stages.dedupe import attach_pair_payloads

    pairs = rd.from_pandas(pd.DataFrame({"a": ["d1"], "b": ["d2"]}))
    # schema-less empty FIRST: the join infers its left schema from the
    # first block, so this ordering is the one that actually fails
    # ("No match ... for FieldRef") without the scrub
    poisoned = rd.from_pandas(pd.DataFrame()).union(pairs)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d1", "d2", "d3"], "text": ["x", "y", "z"]})
    )
    # 4 partitions: the test session has 4 CPUs and each join spawns
    # num_partitions aggregator actors
    out = attach_pair_payloads(
        poisoned, docs, id_col="doc_id", payload_col="text", num_partitions=4
    ).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "text_a"] == "x" and out.loc[0, "text_b"] == "y"

    clean = scrub_empty_blocks(poisoned)
    assert clean.count() == 1 and "a" in clean.schema().names


def test_cube_agg_vs_pandas(ray_session):
    """cube_agg == pandas groupby per key SUBSET — including the
    suffix-only subsets ROLLUP never produces."""
    import numpy as np
    import ray.data as rd

    from knowledge_graph_construction_ray.functions.groupby import cube_agg

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 3, 150),
            "b": rng.choice(["x", "y", "z"], 150),
            "v": rng.integers(-20, 20, 150).astype("int64"),
        }
    )
    got = (
        cube_agg(
            rd.from_pandas(df),
            ["a", "b"],
            {"n": ("v", "size"), "s": ("v", "sum"), "mx": ("v", "max")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    levels = []
    for keys in (["a", "b"], ["a"], ["b"], []):
        if keys:
            lv = df.groupby(keys, as_index=False).agg(
                n=("v", "size"), s=("v", "sum"), mx=("v", "max")
            )
        else:
            lv = pd.DataFrame({"n": [len(df)], "s": [df["v"].sum()], "mx": [df["v"].max()]})
        for k in ("a", "b"):
            lv[k] = lv[k].astype(str) if k in keys else "ALL"
        levels.append(lv[["a", "b", "n", "s", "mx"]])
    exp = (
        pd.concat(levels, ignore_index=True)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"n": "int64", "s": "int64", "mx": "int64"})
    )
    got["n"] = got["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
