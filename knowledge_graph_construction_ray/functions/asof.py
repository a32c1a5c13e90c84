"""Distributed as-of join (backward, inclusive).

For each left row, attach the payload of the LATEST right row with the
same key and ``right_on <= left_on`` — the event-to-most-recent-state
join every training-data/feature pipeline needs (sessions → last error,
clicks → last model deploy, trades → last quote) and the canonical
operator Ray Data lacks natively.

Physical plan (Ray-Data-first; no driver materialization of either side):

1. Tag each side and project to ONE unified Arrow schema (the other
   side's columns ride along as typed nulls, so the union is zero-copy
   and schema-stable across blocks).
2. ``union`` → one coarse-bucket shuffle on ``hash(by) % num_buckets``
   (the repo-wide bucketing discipline, functions/groupby.py) — both
   sides of every key are co-located in exactly one bucket.
3. Per bucket: vectorized ``pandas.merge_asof`` (C sort-merge with
   ``by=`` key grouping) — one Python dispatch per bucket, never per key.

Partitioning assumption (document per the repo contract): all rows of a
single key fit in one bucket's memory.  Skewed keys are bounded by the
time-range of the right side, not the corpus; salt ``by`` upstream if a
single key's history exceeds a worker heap.

Determinism: ties on ``right_on`` within a key are resolved by
``merge_asof`` as "last row in sort order", which is data-order-dependent
— callers needing hash-stable output must ensure ``(by, right_on)`` is
unique on the right side (pre-aggregate duplicates away).
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd
import pyarrow as pa

from .groupby import bucketed_groups

_T = "_asof_t"
_SIDE = "_asof_side"


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as Arrow (pandas-block datasets report numpy dtypes)."""
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        else:
            try:
                fields.append((name, pa.from_numpy_dtype(typ)))
            except pa.ArrowNotImplementedError:
                fields.append((name, pa.string()))  # object columns
    return pa.schema(fields)


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str,
    left_on: str,
    right_on: str,
    right_cols: Mapping[str, str],
    num_buckets: int = 64,
):
    """Backward-inclusive as-of join of two Ray Datasets.

    ``right_cols``: {right column → output name} payload to attach (the
    output names must not collide with left columns).  Returns a Dataset
    with every left column plus the renamed payload columns (typed nulls
    where a left row has no match).  Payload columns become NULLABLE:
    integer right payloads surface as float64 on unmatched rows (the
    usual pandas/Arrow nullable semantics).
    """
    left_schema = _arrow_schema(left_ds)
    right_schema = _arrow_schema(right_ds)
    if by not in left_schema.names or by not in right_schema.names:
        raise ValueError(f"key column {by!r} must exist on both sides")
    t_type = left_schema.field(left_on).type
    if right_schema.field(right_on).type != t_type:
        raise ValueError(
            f"time columns must share a type: left {left_on}={t_type}, "
            f"right {right_on}={right_schema.field(right_on).type}"
        )
    collide = set(right_cols.values()) & set(left_schema.names)
    if collide:
        raise ValueError(f"payload output names collide with left columns: {collide}")

    left_names = list(left_schema.names)
    payload = dict(right_cols)
    # unified column order: left columns, payload, merge time, side tag
    out_fields = [(n, left_schema.field(n).type) for n in left_names]
    out_fields += [(dst, right_schema.field(src).type) for src, dst in payload.items()]
    out_fields += [(_T, t_type), (_SIDE, pa.int8())]
    unified = pa.schema(out_fields)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t.column(nm) for nm in left_names]
        cols += [pa.nulls(n, right_schema.field(src).type) for src in payload]
        cols += [t.column(left_on), pa.nulls(n, pa.int8()).fill_null(1)]
        return pa.Table.from_arrays(cols, schema=unified)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = []
        for nm in left_names:
            if nm == by:
                cols.append(t.column(by))
            else:
                cols.append(pa.nulls(n, left_schema.field(nm).type))
        cols += [t.column(src) for src in payload]
        cols += [t.column(right_on), pa.nulls(n, pa.int8()).fill_null(0)]
        return pa.Table.from_arrays(cols, schema=unified)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    payload_dst = list(payload.values())
    drop_out = [_SIDE, _T]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        is_left = df[_SIDE] == 1
        right = df.loc[~is_left, [by, _T] + payload_dst]
        if not len(right) or not is_left.any():
            # no matches possible: left rows already carry typed-null
            # payload columns from the union projection (schema-stable
            # even when the slice is empty)
            return df[is_left].drop(columns=drop_out)
        left = df[is_left].drop(columns=payload_dst).sort_values(_T, kind="mergesort")
        out = pd.merge_asof(
            left,
            right.sort_values(_T, kind="mergesort"),
            on=_T,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        return out.drop(columns=drop_out)

    joined = bucketed_groups(tagged, [by], kernel, num_buckets=num_buckets)

    # the pandas kernel degrades int columns that crossed the null-union
    # to float64 (NaN on the other side's rows) — cast every column back
    # to its source Arrow type, and fix the column order
    out_schema = pa.schema(
        [(n, left_schema.field(n).type) for n in left_names]
        + [(dst, right_schema.field(src).type) for src, dst in payload.items()]
    )

    def restore(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty buckets can surface column-less blocks
            return out_schema.empty_table()
        cols = [t.column(f.name).cast(f.type) for f in out_schema]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return joined.map_batches(restore, batch_format="pyarrow")
