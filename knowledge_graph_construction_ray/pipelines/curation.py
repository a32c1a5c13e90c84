"""Corpus-curation pipeline (reference pre-pipeline 3.4:
DataCleaned/Diseases/filter_disease.py — operators S4/M7/M8):

    tolerant read → keyword filter on a field → drop fields → sequential
    1-based id reassignment in filtered order → sink.

The keyword filter and column drop are streaming vectorized stages.  The
sequential global id (M8) is inherently a serial operation (ids depend on
every preceding row); it is applied in ONE streaming driver pass over the
sorted result (``iter_batches`` with a running counter) — rows stream
through the driver, the dataset is never pinned wholesale.  The reference
does the same thing single-process (filter_disease.py:97-101).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

FILTER_KEYWORDS = ("中", "老")  # filter_disease.py:12
FIELDS_TO_REMOVE = (  # filter_disease.py:14-17
    "treat", "treat_prob", "treat_period", "treat_cost",
    "can_eat", "not_eat", "insurance", "check",
)


def keyword_filter_kernel(col: str, keywords: Iterable[str]):
    """M7: keep rows whose ``col`` contains ANY keyword (substring)."""
    kws = list(keywords)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str)
        mask = None
        for kw in kws:
            m = s.str.contains(kw, regex=False)
            mask = m if mask is None else (mask | m)
        if mask is None:  # empty keyword list → keep nothing (zero ROWS,
            return df.iloc[0:0]  # not the zero-COLUMN frame df[[]] gives)
        return df[mask]

    return kernel


def curate(
    ds,
    *,
    filter_col: str,
    keywords: Iterable[str] = FILTER_KEYWORDS,
    drop_cols: Iterable[str] = (),
    sort_cols: Iterable[str] = (),
    id_col: str = "id",
) -> pd.DataFrame:
    """Full curation pipeline → DataFrame with 1-based sequential ids."""
    out = ds.map_batches(
        keyword_filter_kernel(filter_col, keywords), batch_format="pandas"
    )
    drop = [c for c in drop_cols if c in ds.schema().names]
    if drop:
        out = out.drop_columns(drop)
    if sort_cols:
        out = out.sort(list(sort_cols))
    frames = []
    next_id = 1
    for batch in out.iter_batches(batch_size=65536, batch_format="pandas"):
        batch = batch.copy()
        batch[id_col] = range(next_id, next_id + len(batch))
        next_id += len(batch)
        frames.append(batch)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def curate_disease_records(docs_ds) -> pd.DataFrame:
    """The reference pipeline shape over span-docs: decode disease docs to
    record views, filter easy_get on 中/老, reassign ids (the 8
    FIELDS_TO_REMOVE belong to the *raw* corpus and are already absent
    from the cleaned span encoding — the drop is a no-op here, matching
    running filter_disease.py on already-cleaned data)."""
    import pyarrow as pa

    from ..spanenc import decode_doc

    def to_records(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for doc in batch.to_pylist():
            if not doc["doc_id"].startswith("disease:"):
                continue
            rec = decode_doc(doc["doc_id"], doc["spans"])
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "name": rec.get("name"),
                    "easy_get": rec.get("easy_get", ""),
                }
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "name", "easy_get"]
        )

    records = docs_ds.map_batches(to_records, batch_format="pyarrow")
    return curate(
        records,
        filter_col="easy_get",
        keywords=FILTER_KEYWORDS,
        sort_cols=("doc_id",),
    )
