"""Bounded-sample range partitioning shared by every range exchange.

One discipline, one implementation: ≤64 evenly-spaced keys per block
reach the driver (block-count-bounded, never row-bounded), the sorted
sample's quantiles become ``searchsorted`` cut points.  Works for any
comparable dtype (ints, floats, strings — including '{kind}:{idx}'
doc_ids and '\\x1f'-joined merge keys, where any fixed byte-prefix
scheme degenerates to one bin) and load-balances by construction.
Boundary placement only decides WHERE a key's bin sits, never the
downstream fold/rank/order, so sampling noise cannot change results.

Consumers: ``merge.merge_elements_sorted`` (sort-free graph
materialization) and ``pipelines.curation.assign_sequential_ids``
(distributed ROW_NUMBER).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

KEYS_PER_BLOCK = 64


def sample_sorted_keys(ds, key: str) -> np.ndarray:
    """The sorted, block-count-bounded key sample underlying
    :func:`sample_range_boundaries` — exposed so stratified consumers
    (``merge._sample_key_bounds`` splits it by element kind) can cut one
    sample several ways without a second pass over the dataset."""

    def sample_keys(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({key: pd.Series(dtype=object)})
        take = np.unique(
            np.linspace(0, len(df) - 1, num=min(len(df), KEYS_PER_BLOCK)).astype(int)
        )
        return pd.DataFrame({key: df[key].to_numpy()[take]})

    pdf = ds.map_batches(sample_keys, batch_format="pandas").to_pandas()
    if key not in pdf.columns:  # fully-empty Dataset: schema lost in to_pandas
        return np.array([], dtype=object)
    return np.sort(pdf[key].to_numpy(), kind="stable")


def cuts_from_sample(sample: np.ndarray, num_bins: int) -> np.ndarray:
    """Quantile cut points from an already-sorted key sample: ≤
    ``num_bins - 1`` deduplicated values; empty for an empty sample
    (callers map everything to bin 0)."""
    if not len(sample):
        return sample
    cuts = np.linspace(0, len(sample) - 1, num=num_bins + 1).astype(int)[1:-1]
    return np.unique(sample[cuts])


def sample_range_boundaries(ds, key: str, num_bins: int) -> np.ndarray:
    """Range-partition cut points for ``key`` from a distributed sample
    of ``ds`` (a materialized Dataset — sampling re-reads its blocks).
    Returns a sorted, deduplicated ndarray of ≤ ``num_bins - 1`` cut
    values; empty when the dataset is empty (callers map everything to
    bin 0)."""
    return cuts_from_sample(sample_sorted_keys(ds, key), num_bins)
