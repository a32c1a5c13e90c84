"""Distributed interval-overlap join (range × range).

The temporal-join family's third member: ``asof.py`` covers point-as-of
and point-in-band; this joins two INTERVAL tables on closed-interval
overlap (l.s ≤ r.e AND r.s ≤ l.e) — activity windows × incident
windows, ad slots × sessions, maintenance × outages.

Physical plan: each interval is replicated to every coarse time bucket
it covers (``ceil(span / bucket_width)`` copies — pick the width near
the typical span so replication stays O(1) per row; a guard raises when
a single row would fan out more than ``max_replication`` copies).  Both
sides meet in ONE co-locating exchange on the bucket id.  Each
overlapping pair is emitted by exactly ONE bucket — the OWNER, the
bucket containing ``max(l.s, r.s)`` (the overlap's left edge) — so no
dedup pass is needed.  The per-bucket kernel is a vectorized cross mask
per time bucket (the accepted one-Python-dispatch-per-coarse-bucket
discipline); per-bucket population is bounded by interval density ×
bucket width, not by table size.

Contract: start/end/payload columns are int64 (timestamps as epoch
micros); intervals are closed on both ends, matching a SQL
``l.s <= r.e AND r.s <= l.e`` inequality join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["interval_overlap_join"]


def _replicate(df: pd.DataFrame, cols: list[str], width: int, side: int,
               other_cols: list[str], max_replication: int) -> pd.DataFrame:
    s = df["s"].to_numpy(np.int64)
    e = df["e"].to_numpy(np.int64)
    if np.any(e < s):
        raise ValueError("interval end < start")
    b0 = s // width
    cnt = (e // width) - b0 + 1
    if len(cnt) and int(cnt.max()) > max_replication:
        raise ValueError(
            f"an interval covers {int(cnt.max())} buckets "
            f"(> max_replication={max_replication}); raise bucket_width"
        )
    idx = np.repeat(np.arange(len(df), dtype=np.int64), cnt)
    offs = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt
    )
    out = pd.DataFrame({"_ib": b0[idx] + offs, "_side": np.full(len(idx), side, np.int8)})
    out["s"] = s[idx]
    out["e"] = e[idx]
    for c in cols:
        out[c] = df[c].to_numpy(np.int64)[idx]
    for c in other_cols:  # keep one union schema across sides
        out[c] = np.zeros(len(idx), np.int64)
    return out


def interval_overlap_join(
    left_ds,
    right_ds,
    *,
    bucket_width: int,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 32,
    max_replication: int = 1024,
):
    """Overlap-join two interval Datasets (columns ``s``, ``e`` plus the
    named int64 payload columns; payload names must be disjoint).
    Returns a Dataset of ``left_cols + right_cols`` rows, one per
    overlapping pair."""
    from .groupby import bucketed_groups

    if set(left_cols) & set(right_cols):
        raise ValueError("left/right payload column names must be disjoint")
    out_cols = list(left_cols) + list(right_cols)

    lrep = left_ds.map_batches(
        lambda df: _replicate(df, left_cols, bucket_width, 0, right_cols,
                              max_replication),
        batch_format="pandas",
    )
    rrep = right_ds.map_batches(
        lambda df: _replicate(df, right_cols, bucket_width, 1, left_cols,
                              max_replication),
        batch_format="pandas",
    )

    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for ib, g in df.groupby("_ib", sort=False):
            l = g[g["_side"] == 0]
            r = g[g["_side"] == 1]
            if not len(l) or not len(r):
                continue
            ls = l["s"].to_numpy(np.int64)[:, None]
            le = l["e"].to_numpy(np.int64)[:, None]
            rs = r["s"].to_numpy(np.int64)[None, :]
            re_ = r["e"].to_numpy(np.int64)[None, :]
            # overlap AND owner test: only the bucket holding the
            # overlap's left edge emits the pair (exactly-once, no dedup)
            mask = (ls <= re_) & (rs <= le) & (
                np.maximum(ls, rs) // bucket_width == ib
            )
            li, ri = np.nonzero(mask)
            if len(li):
                cols = {c: l[c].to_numpy(np.int64)[li] for c in left_cols}
                cols.update({c: r[c].to_numpy(np.int64)[ri] for c in right_cols})
                outs.append(pd.DataFrame(cols))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return bucketed_groups(lrep.union(rrep), ["_ib"], kernel,
                           num_buckets=num_buckets)
