"""Dedup / upsert shuffles (operators D1-D4 of SURVEY.md §2.7).

Reproduces Neo4j's keyed-store semantics as explicit Ray Data shuffles:

* **D1 node upsert** — ``MERGE (n:L {name}) SET n += props`` keyed
  ``(label, name)``: per-key last-writer-wins property merge where a
  present-but-null value deletes the key (neo4j_loader.py:122-123 +
  SURVEY.md §1.4).  Because every property carries its own
  ``[src_rank, seq, value]`` lineage tag, the fold is a commutative,
  associative per-key max-by-lineage merge — correct under local
  combining, salting, and arbitrary shuffle splits (a plain
  "later-row-wins" fold would NOT be: splitting {r1, r3} / {r2} across
  partials loses r3's null-deletion).
* **D2 edge dedup** — ``MERGE`` keyed on the full 5-tuple → first.
* **D4 union** — all sources share one elements stream, so the union is
  implicit.

Physical plan (scale notes):

1. **Local combiner** (``map_batches``): folds duplicate keys within each
   batch before any data moves — the classic partial-aggregation step that
   defuses head-entity skew (a key hot across the corpus lands at most once
   per upstream block in the shuffle, e.g. the FIXTURES hot symptom shared
   by 30 docs, or 恶性肿瘤 hit by 26/78 insurance rows in the reference).
2. **Bucketed fold** (``groupby('bucket').map_groups``): keys are
   hash-partitioned into ``num_buckets`` coarse buckets so each
   ``map_groups`` call receives a whole bucket as ONE pandas DataFrame and
   folds it vectorized (duplicated-key detection via ``Series.duplicated``;
   only actual duplicate keys pay the per-group Python fold).  This avoids
   Ray's per-tiny-group dispatch overhead for the (vast) majority of
   singleton keys while staying a single all-to-all shuffle.
3. **Optional salt stage** (``salted=True``): for pathological skew beyond
   what the combiner absorbs, a two-stage fold first groups on
   ``(bucket, salt)`` then on ``bucket`` — correct because the fold is
   commutative (property tags), per north_star's salted-key requirement.
"""

from __future__ import annotations

import json

import pandas as pd

try:  # imported lazily so pure-Python consumers don't need Ray
    from ray.data import Dataset
except ImportError:  # pragma: no cover
    Dataset = object  # type: ignore

DEFAULT_NUM_BUCKETS = 64


def _merge_tagged(acc: dict, nxt: dict) -> dict:
    """Per-key max-by-(rank, seq) merge of tagged property maps."""
    for key, tag in nxt.items():
        cur = acc.get(key)
        if cur is None or (tag[0], tag[1]) >= (cur[0], cur[1]):
            acc[key] = tag
    return acc


def fold_duplicate_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Fold a frame of element rows that ALL share one merge_key."""
    first = df.iloc[0]
    if first["kind"] == "edge":
        return df.iloc[[0]]
    acc: dict = {}
    for props in df["props"]:
        acc = _merge_tagged(acc, json.loads(props))
    row = df.iloc[[0]].copy()
    row["props"] = json.dumps(acc, ensure_ascii=False)
    return row


def fold_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized fold of an arbitrary elements frame: singleton keys pass
    through untouched; only duplicated keys pay the Python fold."""
    if df.empty:
        return df
    # deterministic ordering so "first edge row" and min-lineage node rows
    # are stable regardless of shuffle arrival order
    df = df.sort_values(["merge_key", "src_rank", "seq"], kind="stable")
    dup_mask = df["merge_key"].duplicated(keep=False).to_numpy()
    uniques = df[~dup_mask]
    dups = df[dup_mask]
    if dups.empty:
        return uniques
    folded = [
        fold_duplicate_rows(group)
        for _, group in dups.groupby("merge_key", sort=False)
    ]
    return pd.concat([uniques] + folded, ignore_index=True)


def _bucket_of(keys: pd.Series, num_buckets: int) -> pd.Series:
    # vectorized, process-independent deterministic hash (no PYTHONHASHSEED)
    return pd.util.hash_pandas_object(keys, index=False) % num_buckets


def _combine_batch(num_buckets: int, salted: bool, salt_factor: int = 16):
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = fold_frame(df)  # local combiner: pre-shuffle partial fold
        df["bucket"] = _bucket_of(df["merge_key"], num_buckets)
        if salted:
            # spread each bucket's rows across salt_factor sub-keys; the
            # commutative fold makes the two-stage reduction exact
            df["salt"] = df["seq"].to_numpy() % salt_factor
        return df

    return combine


def _fold_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return fold_frame(df)


def merge_elements(
    elements: "Dataset",
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salted: bool = False,
) -> "Dataset":
    """D1+D2+D4: the unified elements stream → deduped elements.

    One logical shuffle keyed on ``merge_key`` hash buckets.  Output rows
    keep the ELEMENTS_SCHEMA (props still lineage-tagged); the materialize
    phase strips tags and splits nodes/edges.
    """
    combined = elements.map_batches(
        _combine_batch(num_buckets, salted), batch_format="pandas"
    )
    if salted:
        stage1 = combined.groupby(["bucket", "salt"]).map_groups(
            _fold_bucket, batch_format="pandas"
        )
        folded = stage1.groupby("bucket").map_groups(
            _fold_bucket, batch_format="pandas"
        )
        folded = folded.drop_columns(["bucket", "salt"])
    else:
        folded = combined.groupby("bucket").map_groups(
            _fold_bucket, batch_format="pandas"
        )
        folded = folded.drop_columns(["bucket"])
    return folded.map_batches(_normalize_schema, batch_format="pandas")


def _normalize_schema(df: pd.DataFrame):
    """Pin the output to ELEMENTS_SCHEMA — buckets containing only nodes
    (or only edges) would otherwise infer null-typed Arrow columns for the
    all-null fields, causing schema-mismatch noise downstream."""
    import pyarrow as pa

    from .schema import ELEMENTS_SCHEMA

    return pa.Table.from_pandas(
        df[list(ELEMENTS_SCHEMA.names)], schema=ELEMENTS_SCHEMA, preserve_index=False
    )
