"""High-cardinality grouped aggregation.

``Dataset.groupby().aggregate(...)`` dispatches per GROUP in Python during
the reduce, which collapses at high key cardinality (measured: ~65 s for a
95k-group count/sum over 100k rows on 8 CPUs).  ``bucketed_agg`` keeps the
same single all-to-all exchange but coarsens the shuffle key to
``hash(key) % num_buckets`` and runs a *vectorized pandas groupby* inside
each bucket — C-speed aggregation, one Python dispatch per bucket instead
of per key (measured: the same aggregate in ~2 s).

Two-stage: a per-batch partial aggregate (combiner) runs before the
shuffle, so the exchange carries at most (distinct keys per block) rows —
the standard pre-aggregation discipline for skewed/hot keys.
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd


def hash_bucket(df: pd.DataFrame, cols: list[str], num_buckets: int):
    """Coarse shuffle bucket over one or more key columns — the single
    definition of the bucketing used by the merge fold, the LSH band
    shuffle, the SimHash block shuffle and the canonicalization candidate
    shuffle (vectorized, process-independent)."""
    h = None
    for c in cols:
        s = df[c]
        # normalize numeric keys to float64 before hashing: a block where
        # the key column picked up a null arrives as float64 (Arrow→pandas
        # degrade) while null-free blocks stay int64, and the same logical
        # key hashes differently across those dtypes — splitting one key
        # across buckets.  float64 normalization makes every block agree
        # (bucketing only needs consistency, not injectivity).
        if pd.api.types.is_numeric_dtype(s) and not pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        hc = pd.util.hash_pandas_object(s, index=False).to_numpy()
        h = hc if h is None else (h * 31 + hc)
    return h % num_buckets


def _agg_frame(df: pd.DataFrame, keys: list[str], spec: Mapping[str, tuple[str, str]]) -> pd.DataFrame:
    return df.groupby(keys, as_index=False, sort=False).agg(
        **{out: (col, how) for out, (col, how) in spec.items()}
    )


def bucketed_agg(
    ds,
    keys: list[str],
    spec: Mapping[str, tuple[str, str]],
    *,
    num_buckets: int = 64,
):
    """Grouped aggregate with vectorized per-bucket reduce.

    ``spec``: {out_col: (in_col, how)} with pandas ``how`` ∈ {'sum',
    'size', 'min', 'max'} (mergeable aggregations only: the combiner turns
    'size' into a partial count that the reduce must 'sum' — handled here).
    """
    merge_spec = {
        out: (out, "sum" if how in ("sum", "size") else how)
        for out, (_c, how) in spec.items()
    }

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        part = _agg_frame(df, keys, spec)
        part["_bucket"] = hash_bucket(part, keys, num_buckets)
        return part

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _agg_frame(df.drop(columns=["_bucket"]), keys, merge_spec)

    return (
        ds.map_batches(combiner, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def scrub_empty_blocks(ds):
    """Drop 0-row blocks whose schema may be lost before a native Arrow
    join.

    ``groupby().map_groups`` output partitions that end up ALL-empty
    become schema-less empty pandas blocks; map_batches/filter UDFs are
    never invoked on empty blocks, so they cannot be repaired in-stream,
    and ``Dataset.join`` over a stream containing one fails with "No
    match or multiple matches for FieldRef" on any join partition that
    receives zero rows (functions/graph.py::triangle_counts docstring).
    This scrub materializes (callers sit after a shuffle barrier anyway)
    and rebuilds the dataset from the non-empty block refs — metadata
    only, no data moves; one block is fetched to pick the ref
    constructor.  An ALL-empty input is rebuilt as one TYPED empty Arrow
    block when a schema is recoverable (so a downstream join sees the
    key fields instead of failing), else returned as-is."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if (meta.num_rows or 0) > 0
    ]
    if not refs:
        sch = mat.schema()
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if isinstance(base, pa.Schema):
            return rd.from_arrow(base.empty_table())
        if sch is not None:  # pandas-block schema: numpy dtypes
            import numpy as np

            fields = []
            for n, t in zip(sch.names, sch.types):
                if isinstance(t, pa.DataType):
                    fields.append(pa.field(n, t))
                    continue
                try:
                    fields.append(pa.field(n, pa.from_numpy_dtype(np.dtype(t))))
                except (pa.ArrowNotImplementedError, TypeError):
                    fields.append(pa.field(n, pa.string()))
            if fields:
                return rd.from_arrow(pa.schema(fields).empty_table())
        return mat
    if isinstance(ray.get(refs[0]), pd.DataFrame):
        return rd.from_pandas_refs(refs)
    return rd.from_arrow_refs(refs)


def rollup_agg(
    ds,
    keys: list[str],
    spec: Mapping[str, tuple[str, str]],
    *,
    num_buckets: int = 64,
    all_token: str = "ALL",
):
    """SQL ``GROUP BY ROLLUP(keys...)``: one result row set per key
    PREFIX, from the full key list down to the grand total.

    The finest level is a :func:`bucketed_agg` over the raw stream; every
    coarser level RE-AGGREGATES the previous level's partials (sum of
    sums, sum of counts, min of mins, …) instead of re-scanning the
    input — the rollup costs one full-data exchange plus exponentially
    shrinking partial exchanges, not ``len(keys)+1`` full scans.

    Rolled-up key columns carry ``all_token`` and every key column is
    string-cast, so the result needs no NULL marker — sidestepping the
    NaN-vs-None-vs-<NA> representation mismatch between pandas and a SQL
    oracle (match with ``CASE WHEN GROUPING(k)=1 THEN 'ALL' ELSE
    CAST(k AS VARCHAR) END``).  Only mergeable aggregations ('sum',
    'size', 'min', 'max') are accepted, same contract as bucketed_agg.
    """
    for out, (_c, how) in spec.items():
        if how not in ("sum", "size", "min", "max"):
            raise ValueError(f"rollup_agg: non-mergeable aggregation {how!r} for {out!r}")

    def stringify(level_keys):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for k in keys:
                df[k] = (
                    df[k].astype(str) if k in level_keys else all_token
                )
            return df[keys + list(spec)]

        return fn

    merge_spec = {
        out: (out, "sum" if how in ("sum", "size") else how)
        for out, (_c, how) in spec.items()
    }

    finest = bucketed_agg(ds, keys, spec, num_buckets=num_buckets)
    levels = [finest.map_batches(stringify(keys), batch_format="pandas")]
    prev = finest
    for i in range(len(keys) - 1, -1, -1):
        level_keys = keys[:i]
        if level_keys:
            prev = bucketed_agg(prev, level_keys, merge_spec, num_buckets=num_buckets)
        else:
            # grand total: per-batch partials → ONE tiny reduce
            def partial(df: pd.DataFrame) -> pd.DataFrame:
                return _agg_frame(df.assign(_g=0), ["_g"], merge_spec)

            def total(df: pd.DataFrame) -> pd.DataFrame:
                return _agg_frame(df, ["_g"], merge_spec).drop(columns=["_g"])

            prev = (
                prev.map_batches(partial, batch_format="pandas")
                .repartition(1)
                .map_batches(total, batch_size=None, batch_format="pandas")
            )
        levels.append(prev.map_batches(stringify(level_keys), batch_format="pandas"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(
    ds,
    keys: list[str],
    spec: Mapping[str, tuple[str, str]],
    *,
    num_buckets: int = 64,
    all_token: str = "ALL",
):
    """SQL ``GROUP BY CUBE(keys...)``: one result row set per key
    SUBSET (2^len(keys) grouping sets).

    The full key set is ONE bucketed exchange over the raw stream; every
    proper subset re-aggregates the finest level's partials (any subset
    is derivable from the full grouping, unlike ROLLUP's prefix chain) —
    so the cube costs one full-data exchange plus 2^k−1 exchanges over
    the already-aggregated (far smaller) finest table.  Same mergeable-
    aggregation contract and 'ALL'-marker string keys as
    :func:`rollup_agg`."""
    from itertools import combinations

    for out, (_c, how) in spec.items():
        if how not in ("sum", "size", "min", "max"):
            raise ValueError(f"cube_agg: non-mergeable aggregation {how!r} for {out!r}")

    merge_spec = {
        out: (out, "sum" if how in ("sum", "size") else how)
        for out, (_c, how) in spec.items()
    }

    def stringify(level_keys):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for k in keys:
                df[k] = df[k].astype(str) if k in level_keys else all_token
            return df[keys + list(spec)]

        return fn

    finest = bucketed_agg(ds, keys, spec, num_buckets=num_buckets).materialize()
    levels = [finest.map_batches(stringify(keys), batch_format="pandas")]
    for r in range(len(keys) - 1, -1, -1):
        for subset in combinations(keys, r):
            level_keys = list(subset)
            if level_keys:
                lv = bucketed_agg(finest, level_keys, merge_spec, num_buckets=num_buckets)
            else:
                def partial(df: pd.DataFrame) -> pd.DataFrame:
                    return _agg_frame(df.assign(_g=0), ["_g"], merge_spec)

                def total(df: pd.DataFrame) -> pd.DataFrame:
                    return _agg_frame(df, ["_g"], merge_spec).drop(columns=["_g"])

                lv = (
                    finest.map_batches(partial, batch_format="pandas")
                    .repartition(1)
                    .map_batches(total, batch_size=None, batch_format="pandas")
                )
            levels.append(lv.map_batches(stringify(level_keys), batch_format="pandas"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def bucketed_groups(ds, keys: list[str], kernel, *, num_buckets: int = 64):
    """Per-key grouped transform with ONE Python dispatch per coarse hash
    bucket instead of one per key — the shared discipline behind the merge
    fold, LSH band shuffle, SimHash block shuffle, canonicalization
    candidate shuffle, sessionization and sliding windows.

    ``kernel(df)`` receives one bucket (all rows of every key hashing to
    that bucket, key columns intact, no ``_bucket`` column) and must do its
    own *vectorized* per-key work (pandas groupby / sort + shift) — the
    contract is that the kernel never dispatches per key in Python either.
    Co-location guarantee: all rows of a key land in exactly one bucket.

    Block format: the bucket tag is appended as a pure-Arrow column so the
    all-to-all exchange moves compact Arrow buffers, not pickled
    object-dtype pandas (~3× the bytes — measured on the merge exchange).
    Only the KEY columns are converted to pandas pre-shuffle (hash parity
    with ``hash_bucket``'s dtype normalization); the kernel still sees and
    returns pandas, so per-bucket output schemas stay as permissive as
    before.
    """
    import numpy as np
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = np.asarray(
            hash_bucket(batch.select(keys).to_pandas(), keys, num_buckets),
            dtype=np.int64,
        )
        return batch.append_column("_bucket", pa.array(b, type=pa.int64()))

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def bucketed_groups_arrow(ds, keys: list[str], kernel, *, num_buckets: int = 64):
    """``bucketed_groups`` with ARROW blocks end-to-end: only the key
    columns are converted to pandas (for hash parity with
    ``hash_bucket``); the payload never crosses the Arrow→pandas boundary
    here, so nullable int64 columns keep exact values above 2^53 (Ray's
    whole-block pandas conversion would degrade them to float64).

    ``kernel(table)`` receives one bucket as a ``pa.Table`` (key columns
    intact, no ``_bucket`` column) and returns a ``pa.Table``; it owns any
    pandas conversion it needs, column by column, at the exactness it
    needs."""
    import pyarrow as pa

    def add_bucket(t: "pa.Table") -> "pa.Table":
        kdf = pd.DataFrame({c: t.column(c).to_pandas() for c in keys})
        b = hash_bucket(kdf, keys, num_buckets)
        return t.append_column("_bucket", pa.array(b, type=pa.uint64()))

    def run_bucket(t: "pa.Table"):
        return kernel(t.drop_columns(["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pyarrow")
    )


def grouped_topk(
    ds,
    group_cols: list[str],
    by: list[str],
    k: int,
    *,
    ascending: "bool | list[bool]" = True,
) -> pd.DataFrame:
    """Per-GROUP top-k without an all-to-all: each block emits its own
    per-group head (the global per-group top-k is contained in the union
    of per-block per-group top-ks), then the small union — at most
    ``blocks × groups × k`` rows — reduces on the driver.

    ``by``/``ascending`` must define a total order within a group
    (include a tie-break key) for determinism.  Intended for LOW group
    cardinality (strata: language, source, split); at high cardinality
    the driver union grows with ``groups`` — use ``bucketed_grouped_topk``
    instead.
    """

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False, dropna=False)  # null = own group (SQL)
            .head(k)
        )

    small = ds.map_batches(combiner, batch_format="pandas").to_pandas()
    if small.empty:  # empty Ray results drop their schema → sort_values KeyError
        return small
    return (
        small.sort_values(by, ascending=ascending, kind="mergesort")
        .groupby(group_cols, sort=False, dropna=False)
        .head(k)
        .reset_index(drop=True)
    )


def bucketed_grouped_topk(
    ds,
    group_cols: list[str],
    by: list[str],
    k: int,
    *,
    ascending: "bool | list[bool]" = True,
    num_buckets: int = 64,
):
    """Per-group top-k at HIGH group cardinality (per-user history
    sampling, per-domain head): the same per-block head combiner as
    ``grouped_topk``, but the reduce is ONE coarse-bucket shuffle with a
    vectorized per-bucket head — nothing ever lands on the driver.
    Returns a Dataset (≤ groups × k rows)."""

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False, dropna=False)  # null = own group (SQL)
            .head(k)
        )

    return bucketed_groups(
        ds.map_batches(head, batch_format="pandas"),
        group_cols,
        head,
        num_buckets=num_buckets,
    )


def local_topk(ds, by: list[str], k: int, *, descending: list[bool]) -> pd.DataFrame:
    """Global top-k WITHOUT an all-to-all sort: each batch emits its local
    top-k (the global top-k under a total order is contained in the union
    of per-block top-ks), then the tiny union (k × blocks rows) is reduced
    on the driver.  ``by``/``descending`` must define a total order
    (include a tie-break key) for determinism."""
    ascending = [not d for d in descending]

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    small = ds.map_batches(combiner, batch_format="pandas").to_pandas()
    if small.empty:  # empty Ray results drop their schema → sort_values KeyError
        return small
    return (
        small.sort_values(by, ascending=ascending, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
