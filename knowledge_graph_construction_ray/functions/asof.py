"""Distributed temporal joins: as-of (backward, inclusive) and band/range.

Two operators every training-data/feature pipeline needs and Ray Data
lacks natively:

* ``asof_join`` — for each left row, attach the payload of the LATEST
  right row with the same key and ``right_on <= left_on`` (sessions →
  last error, clicks → last model deploy, trades → last quote).
* ``band_join`` — emit one row per (left, right) pair with the same key
  and ``left_on + lower <= right_on <= left_on + upper`` (attribution
  windows, co-occurrence within a horizon).

Shared physical plan (Ray-Data-first; no driver materialization):

1. Tag each side and project to ONE unified Arrow schema (the other
   side's columns ride along as typed nulls, so the union is zero-copy
   and schema-stable across blocks).
2. ``union`` → one coarse-bucket shuffle on ``hash(by) % num_buckets``
   (the repo-wide bucketing discipline, functions/groupby.py) — both
   sides of every key are co-located in exactly one bucket.
3. Per bucket, a fully vectorized kernel — one Python dispatch per
   bucket, never per key: ``merge_asof`` for the as-of join; for the
   band join, TWO ``merge_asof`` probes bound each left row's matching
   right-ordinal range [lo+1, hi], which is expanded with
   ``np.repeat``/``cumsum`` and resolved by one exact hash merge —
   no per-key cartesian product is ever materialized.
4. A final Arrow cast restores int columns the null-union degraded to
   float64 and pins the output column order.

Partitioning assumption (document per the repo contract): all rows of a
single key fit in one bucket's memory.  Salt ``by`` upstream if a single
key's history exceeds a worker heap.  Band-join output additionally
scales with matches-per-left-row — the window (``lower``/``upper``)
bounds it, not the corpus.

Determinism: as-of ties on ``right_on`` within a key resolve as "last
row in sort order" (data-order-dependent) — callers needing hash-stable
output must keep ``(by, right_on)`` unique on the right side.  Band-join
output is the exact match SET, order-independent.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
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


class _Plan:
    """Validated inputs + the tagged union both temporal joins share."""

    def __init__(self, left_ds, right_ds, by, left_on, right_on, right_cols):
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
            raise ValueError(
                f"payload output names collide with left columns: {collide}"
            )

        self.by = by
        self.left_names = list(left_schema.names)
        self.payload = dict(right_cols)
        self.payload_dst = list(self.payload.values())
        # unified column order: left columns, payload, merge time, side tag
        out_fields = [(n, left_schema.field(n).type) for n in self.left_names]
        out_fields += [
            (dst, right_schema.field(src).type) for src, dst in self.payload.items()
        ]
        out_fields += [(_T, t_type), (_SIDE, pa.int8())]
        unified = pa.schema(out_fields)

        def tag_left(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = [t.column(nm) for nm in self.left_names]
            cols += [pa.nulls(n, right_schema.field(src).type) for src in self.payload]
            cols += [t.column(left_on), pa.nulls(n, pa.int8()).fill_null(1)]
            return pa.Table.from_arrays(cols, schema=unified)

        def tag_right(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for nm in self.left_names:
                if nm == by:
                    cols.append(t.column(by))
                else:
                    cols.append(pa.nulls(n, left_schema.field(nm).type))
            cols += [t.column(src) for src in self.payload]
            cols += [t.column(right_on), pa.nulls(n, pa.int8()).fill_null(0)]
            return pa.Table.from_arrays(cols, schema=unified)

        self.tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
            right_ds.map_batches(tag_right, batch_format="pyarrow")
        )
        self.out_schema = pa.schema(
            [(n, left_schema.field(n).type) for n in self.left_names]
            + [(dst, right_schema.field(src).type) for src, dst in self.payload.items()]
        )

    def run(self, kernel, num_buckets: int):
        joined = bucketed_groups(
            self.tagged, [self.by], kernel, num_buckets=num_buckets
        )
        out_schema = self.out_schema

        # the pandas kernel degrades int columns that crossed the
        # null-union to float64 (NaN on the other side's rows) — cast
        # every column back to its source type and pin the column order
        def restore(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # empty buckets can surface column-less blocks
                return out_schema.empty_table()
            cols = [t.column(f.name).cast(f.type) for f in out_schema]
            return pa.Table.from_arrays(cols, schema=out_schema)

        return joined.map_batches(restore, batch_format="pyarrow")


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
    where a left row has no match).
    """
    plan = _Plan(left_ds, right_ds, by, left_on, right_on, right_cols)
    by_, payload_dst = plan.by, plan.payload_dst
    drop_out = [_SIDE, _T]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        is_left = df[_SIDE] == 1
        right = df.loc[~is_left, [by_, _T] + payload_dst]
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
            by=by_,
            direction="backward",
            allow_exact_matches=True,
        )
        return out.drop(columns=drop_out)

    return plan.run(kernel, num_buckets)


def band_join(
    left_ds,
    right_ds,
    *,
    by: str,
    left_on: str,
    right_on: str,
    lower,
    upper,
    right_cols: Mapping[str, str],
    num_buckets: int = 64,
):
    """Inner band (range) join: one output row per (left, right) pair
    with equal ``by`` key and ``left_on + lower <= right_on <= left_on +
    upper`` (both bounds inclusive; ``lower <= upper``, e.g. ``lower=
    -pd.Timedelta(hours=12), upper=pd.Timedelta(0)`` for "right events in
    the 12 h before left").

    Vectorized per bucket with NO per-key cartesian product: right rows
    get a per-key ordinal in time order; two ``merge_asof`` probes per
    left row locate the ordinal range [lo+1, hi] inside the window; the
    ranges are expanded with repeat/cumsum arithmetic and resolved by one
    exact (key, ordinal) hash merge.
    """
    plan = _Plan(left_ds, right_ds, by, left_on, right_on, right_cols)
    by_, payload_dst = plan.by, plan.payload_dst
    drop_out = [_SIDE, _T]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        is_left = df[_SIDE] == 1
        left = df[is_left].drop(columns=payload_dst)
        right = df.loc[~is_left, [by_, _T] + payload_dst]
        empty = left.iloc[0:0].merge(
            right.iloc[0:0].drop(columns=[_T]), on=by_, how="left"
        ).drop(columns=drop_out)
        if not len(right) or not len(left):
            return empty
        v = right.sort_values(_T, kind="mergesort").reset_index(drop=True)
        v["_ord"] = v.groupby(by_, sort=False).cumcount()
        l = left.sort_values(_T, kind="mergesort").reset_index(drop=True)
        probe = v[[by_, _T, "_ord"]]
        # shifted probes cast back to the source dtype (datetime64[us] +
        # Timedelta silently promotes to ns, which merge_asof rejects)
        t_dtype = l[_T].dtype
        # last right ordinal with right_on <= left_on + upper (inclusive)
        hi = pd.merge_asof(
            pd.DataFrame({by_: l[by_], _T: (l[_T] + upper).astype(t_dtype)}),
            probe, on=_T, by=by_, direction="backward", allow_exact_matches=True,
        )["_ord"]
        # last right ordinal with right_on <  left_on + lower (excluded)
        lo = pd.merge_asof(
            pd.DataFrame({by_: l[by_], _T: (l[_T] + lower).astype(t_dtype)}),
            probe, on=_T, by=by_, direction="backward", allow_exact_matches=False,
        )["_ord"]
        hi_ = np.nan_to_num(hi.to_numpy(dtype="float64"), nan=-1.0).astype(np.int64)
        lo_ = np.nan_to_num(lo.to_numpy(dtype="float64"), nan=-1.0).astype(np.int64)
        cnt = np.maximum(hi_ - lo_, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(l)), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pairs = l.iloc[li].copy()
        pairs["_ord"] = np.repeat(lo_ + 1, cnt) + offs
        out = pairs.merge(v[[by_, "_ord"] + payload_dst], on=[by_, "_ord"])
        return out.drop(columns=["_ord"] + drop_out)

    return plan.run(kernel, num_buckets)
