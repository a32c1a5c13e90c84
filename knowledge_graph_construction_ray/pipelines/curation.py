"""Corpus-curation pipeline (reference pre-pipeline 3.4:
DataCleaned/Diseases/filter_disease.py — operators S4/M7/M8):

    tolerant read → keyword filter on a field → drop fields → sequential
    1-based id reassignment in filtered order → sink.

The keyword filter and column drop are streaming vectorized stages.  The
sequential global id (M8) looks serial (ids depend on every preceding
row) but distributes exactly like a global ROW_NUMBER: sample-based
range bins over the leading sort key, per-bin COUNTS through one
combiner exchange, a driver prefix-sum over the tiny count table only,
then ONE co-locating exchange where each bin sorts its own rows and
emits ``base[bin] + intra_offset``.  Nothing corpus-sized ever touches
the driver; the reference does the whole thing single-process
(filter_disease.py:97-101).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
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


def _sample_boundaries(rows, key: str, num_bins: int) -> np.ndarray:
    """Range-partition boundaries for the leading sort key — the shared
    bounded-sample discipline (``functions.sampling``)."""
    from ..functions.sampling import sample_range_boundaries

    return sample_range_boundaries(rows, key, num_bins)


def assign_sequential_ids(
    ds, sort_cols, id_col: str = "id", *, num_buckets: int = 64,
    num_bins: int = 256, sum_col: str | None = None,
    cum_col: str | None = None,
):
    """Distributed 1-based ROW_NUMBER() OVER (ORDER BY sort_cols) →
    Dataset with ``id_col`` added.  With ``sum_col``/``cum_col`` set it
    ALSO emits the global INCLUSIVE running sum of ``sum_col`` in the
    same order — SUM(x) OVER (ORDER BY sort_cols ROWS UNBOUNDED
    PRECEDING) — on the identical plan: the per-bin histogram exchange
    carries (count, sum) pairs, the driver prefix-sums both tiny
    tables, and each bin adds its base to a vectorized within-bin
    cumsum (int64 throughout; the caller owns the overflow envelope).
    The driver only ever sees a bounded key sample and the per-bin
    count table:

    1. materialize the input once (object-store resident, spillable —
       three passes read it without re-running the upstream pipeline);
    2. sample-based range boundaries on the leading sort key
       (:func:`_sample_boundaries` — order-preserving and balanced for
       ANY comparable dtype); per-bin counts pre-aggregated per batch
       through one combiner exchange; driver prefix-sums the tiny
       histogram into base offsets;
    3. one co-locating exchange on the bin; each bin sorts ITS rows by
       the full sort tuple and emits ``base[bin] + intra_offset + 1``.

    The ids are invariant to the sampled boundaries (binning only
    decides WHERE a row is ranked, not its rank), so sampling noise
    cannot change the output.  Null sort keys raise — a null has no
    defined rank, and the Arrow→pandas int64 degrade it causes would
    silently corrupt bins otherwise.  Ties beyond ``sort_cols`` get
    arbitrary-but-stable ids, same as any distributed ROW_NUMBER."""
    import ray.data as rd

    from ..functions.groupby import bucketed_agg, bucketed_groups

    sort_cols = list(sort_cols)
    if not sort_cols:
        raise ValueError("sequential ids need a total order: pass sort_cols")
    if (sum_col is None) != (cum_col is None):
        raise ValueError("sum_col and cum_col must be passed together")
    key = sort_cols[0]

    mat = ds.materialize()
    if mat.count() == 0:
        # typed empty via Arrow — an empty pandas block would DROP its
        # schema in to_pandas() (the repo-wide empty-result trap)
        import pyarrow as pa

        sch = mat.schema()
        fields: list = []
        if sch is not None:
            base = getattr(sch, "base_schema", None)
            if isinstance(base, pa.Schema):
                fields = list(base)
            else:  # pandas-block schema: numpy dtypes, object == string
                for n, t in zip(sch.names, sch.types):
                    try:
                        at = pa.from_numpy_dtype(np.dtype(t))
                    except (pa.ArrowNotImplementedError, TypeError):
                        at = pa.string()
                    fields.append(pa.field(n, at))
        fields = [f for f in fields if f.name not in (id_col, cum_col)]
        fields.append(pa.field(id_col, pa.int64()))
        if cum_col is not None:
            fields.append(pa.field(cum_col, pa.int64()))
        empty = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in fields], schema=pa.schema(fields)
        )
        return rd.from_arrow(empty)

    boundaries = _sample_boundaries(mat, key, num_bins)

    def with_bin(df: pd.DataFrame) -> pd.DataFrame:
        s = df[key]
        if s.isna().any():
            raise ValueError(
                f"assign_sequential_ids: null values in sort key {key!r} "
                "have no defined rank"
            )
        out = df.copy()
        out["_bin"] = np.searchsorted(
            boundaries, s.to_numpy(), side="right"
        ).astype(np.int64)
        return out

    rows = mat.map_batches(with_bin, batch_format="pandas")

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        if sum_col is None:
            vc = df["_bin"].value_counts()
            return pd.DataFrame(
                {"_bin": vc.index.to_numpy(np.int64), "n": vc.to_numpy(np.int64)}
            )
        g = df.groupby("_bin", observed=True)[sum_col].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "_bin": g.index.to_numpy(np.int64),
                "n": g["size"].to_numpy(np.int64),
                "s": g["sum"].to_numpy(np.int64),
            }
        )

    spec = {"n": ("n", "sum")}
    if sum_col is not None:
        spec["s"] = ("s", "sum")
    hist = bucketed_agg(
        rows.map_batches(bin_counts, batch_format="pandas"),
        ["_bin"],
        spec,
    ).to_pandas()
    hist = hist.sort_values("_bin").reset_index(drop=True)
    base = dict(
        zip(
            hist["_bin"].to_numpy(np.int64),
            np.cumsum(hist["n"].to_numpy(np.int64))
            - hist["n"].to_numpy(np.int64),
        )
    )
    sum_base = (
        dict(
            zip(
                hist["_bin"].to_numpy(np.int64),
                np.cumsum(hist["s"].to_numpy(np.int64))
                - hist["s"].to_numpy(np.int64),
            )
        )
        if sum_col is not None
        else None
    )

    def id_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket holds MANY bins — segment per bin
        df = df.sort_values(["_bin", *sort_cols], kind="mergesort")
        codes = pd.factorize(df["_bin"], sort=False)[0]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(df)])
        pos = np.arange(len(df), dtype=np.int64) - np.repeat(starts, lens)
        out = df.drop(columns=["_bin"])
        out[id_col] = df["_bin"].map(base).to_numpy(np.int64) + pos + 1
        if sum_col is not None:
            vals = df[sum_col].to_numpy(np.int64)
            cs = np.cumsum(vals)
            seg0 = cs[starts] - vals[starts]  # exclusive base of each segment
            incl = cs - np.repeat(seg0, lens)  # inclusive within-bin cumsum
            out[cum_col] = df["_bin"].map(sum_base).to_numpy(np.int64) + incl
        return out

    return bucketed_groups(rows, ["_bin"], id_bucket, num_buckets=num_buckets)


def curate(
    ds,
    *,
    filter_col: str,
    keywords: Iterable[str] = FILTER_KEYWORDS,
    drop_cols: Iterable[str] = (),
    sort_cols: Iterable[str] = (),
    id_col: str = "id",
):
    """Full curation pipeline → Dataset with 1-based sequential ids in
    ``sort_cols`` order (unordered between blocks — sort on ``id_col``
    downstream if presentation order matters)."""
    out = ds.map_batches(
        keyword_filter_kernel(filter_col, keywords), batch_format="pandas"
    )
    drop = [c for c in drop_cols if c in ds.schema().names]
    if drop:
        out = out.drop_columns(drop)
    return assign_sequential_ids(out, list(sort_cols), id_col)


def curate_disease_records(docs_ds) -> pd.DataFrame:
    """The reference pipeline shape over span-docs: decode disease docs to
    record views, filter easy_get on 中/老, reassign ids (the 8
    FIELDS_TO_REMOVE belong to the *raw* corpus and are already absent
    from the cleaned span encoding — the drop is a no-op here, matching
    running filter_disease.py on already-cleaned data).  The record view
    is built with the same Arrow list-scatter the extractors use
    (stages/records.py::_scatter) — no per-row decode loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.records import _scatter

    def to_records(batch: pa.Table) -> pd.DataFrame:
        batch = batch.combine_chunks()
        doc_ids = batch.column("doc_id")
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        keep = pc.starts_with(doc_ids, "disease:")
        batch = batch.filter(keep)
        if len(batch) == 0:
            return pd.DataFrame(columns=["doc_id", "name", "easy_get"])
        doc_ids = batch.column("doc_id").combine_chunks()
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        flat_kind = flat.field("kind").to_numpy(zero_copy_only=False)
        flat_text = flat.field("text").to_numpy(zero_copy_only=False)
        n = len(batch)
        span_in = np.ones(len(parent), dtype=bool)
        name = _scatter(n, span_in, flat_kind, flat_text, parent, "name")
        easy = _scatter(n, span_in, flat_kind, flat_text, parent, "easy_get")
        easy = np.where(easy == None, "", easy)  # noqa: E711 — object array
        return pd.DataFrame(
            {
                "doc_id": doc_ids.to_numpy(zero_copy_only=False),
                "name": name,
                "easy_get": easy,
            }
        )

    records = docs_ds.map_batches(to_records, batch_format="pyarrow")
    out = curate(
        records,
        filter_col="easy_get",
        keywords=FILTER_KEYWORDS,
        sort_cols=("doc_id",),
    )
    # fixture-sized final view, presented in id order
    df = out.to_pandas()
    if df.empty:
        return df
    return df.sort_values("id").reset_index(drop=True)
