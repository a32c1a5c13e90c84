"""Edit-distance-≤1 self-join (functions/editjoin.py): the vectorized
byte-matrix verify against hand cases, and the full blocked join against
a brute-force Levenshtein over random small-alphabet corpora (small
alphabet forces dense deletion-key collisions — the false-candidate
path — as well as insert/delete/substitute true pairs)."""

import numpy as np
import pandas as pd

import ray.data as rd

from knowledge_graph_construction_ray.functions.editjoin import (
    deletion_variant_keys,
    edit1_self_join,
    verify_edit1_pairs,
)


def _lev(s, t):
    m, n = len(s), len(t)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
            prev = cur
    return d[n]


def test_verify_kernel_cases():
    a = np.array(["abc", "abc", "ab", "ab", "abc", "x", "abcd"], dtype=object)
    b = np.array(["axc", "ba", "abc", "abcd", "cba", "xy", "bcd"], dtype=object)
    got = verify_edit1_pairs(a, b).tolist()
    exp = [_lev(x, y) <= 1 for x, y in zip(a, b)]
    assert got == exp, (got, exp)


def test_deletion_keys_cover_distance1():
    """Every distance-1 pair must share at least one blocking key."""
    import pyarrow as pa

    rng = np.random.default_rng(3)
    strs = sorted(
        {"".join(rng.choice(list("ab"), size=rng.integers(1, 5))) for _ in range(40)}
    )
    keys = deletion_variant_keys(pa.array(strs))
    by_name = keys.groupby("name")["key"].apply(set)
    for i, x in enumerate(strs):
        for y in strs[i + 1 :]:
            if _lev(x, y) == 1:
                assert by_name[x] & by_name[y], (x, y)


def test_edit1_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(2)
    for trial in range(3):
        strs = [
            "".join(rng.choice(list("abc"), size=rng.integers(1, 6)))
            for _ in range(120)
        ]
        ds = rd.from_pandas(pd.DataFrame({"s": strs}))
        got = edit1_self_join(ds, "s", num_buckets=4).to_pandas()
        gotset = set(
            map(tuple, got[["name_a", "name_b"]].astype(object).to_numpy())
        )
        uniq = sorted(set(strs))
        exp = {
            (x, y)
            for i, x in enumerate(uniq)
            for y in uniq[i + 1 :]
            if _lev(x, y) <= 1
        }
        assert gotset == exp, (trial, len(gotset), len(exp))


def test_edit1_join_no_pairs(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"s": ["aaaa", "bbbb", "cccc"]}))
    got = edit1_self_join(ds, "s", num_buckets=2).to_pandas()
    assert len(got) == 0
