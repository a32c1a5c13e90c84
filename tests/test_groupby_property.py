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
