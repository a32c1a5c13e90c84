"""Typo-tolerant similarity self-join: all DISTINCT string pairs at
Levenshtein distance ≤ 1, without the quadratic scan.

Blocking is FastSS deletion-neighborhood (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007): every string emits itself plus its
|s| single-deletion variants as blocking keys.  Any pair at distance 1
shares a key — a substitution at position i shares the delete-at-i
variant, an insertion/deletion pair shares the shorter string itself —
so recall is complete BY CONSTRUCTION; sharing a key is not sufficient
(e.g. "ab"/"ba" share keys at distance 2), so survivors are verified
exactly.

Plan shape (all bounded exchanges):
1. distinct strings — one bucketed dedup;
2. variant generation — |s| VECTORIZED Arrow slice+concat passes per
   batch (loop over deletion POSITIONS, never over rows);
3. one co-locating exchange on the variant key; within each group the
   pair set is generated id-ordered and deduped (group size ~ a few);
4. exact distance-≤1 verification as a numpy fixed-width byte-matrix
   kernel — equal length: ≤1 mismatching column; length ±1: first
   mismatch at k, then shifted suffix equality from k — no per-pair
   Python;
5. pair dedup (a pair can share several keys) via one more bucketed
   exchange.

The verify is one-sided (drops false candidates, never true pairs), so
the result equals the quadratic ``levenshtein(a,b) <= 1`` oracle
exactly.  No reference counterpart; part of the entity-linking family
(the reference's alias matching is exact-string only).

ASCII contract: the verify kernel compares BYTES, which equals
codepoint-level Levenshtein only for single-byte text — a multibyte
substitution is ≥2 byte edits and would be (correctly for bytes,
differently for codepoints) rejected.  Callers with non-ASCII keys
should transliterate/normalize first (stages/normalize.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def deletion_variant_keys(names: pa.Array | pa.ChunkedArray) -> pd.DataFrame:
    """(key, name) rows: the name itself + every single-deletion variant.
    One Arrow slice+concat per deletion POSITION (positions ≤ max
    length), vectorized over the whole batch."""
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    n = len(names)
    if not n:
        return pd.DataFrame(
            {"key": pd.Series(dtype="string"), "name": pd.Series(dtype="string")}
        )
    lens = pc.utf8_length(names).to_numpy(zero_copy_only=False).astype(np.int64)
    max_len = int(lens.max())
    keys = [names]  # the string itself is a key (covers insert/delete)
    name_cols = [names]
    for i in range(max_len):
        # delete position i: s[:i] + s[i+1:], only for rows with len > i
        mask = lens > i
        if not mask.any():
            break
        sub = names.filter(pa.array(mask))
        variant = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, i),
            pc.utf8_slice_codeunits(sub, i + 1),
            "",
        )
        keys.append(variant)
        name_cols.append(sub)
    def _cat(arrs):
        flat = [
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            for a in arrs
        ]
        return pa.concat_arrays(flat).to_pandas().astype("string")

    return pd.DataFrame({"key": _cat(keys), "name": _cat(name_cols)})


def _byte_matrix(arr: pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, width) uint8 matrix of NUL-padded utf-8 bytes plus byte
    lengths — built by one ragged scatter over the Arrow data buffer
    (no per-row Python).  Offsets are rebased for sliced arrays."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    out = np.zeros((len(arr), width), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
        col = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        # rows are contiguous in the data buffer, so this one slice is
        # exactly the row-ordered payload
        out[row, col] = data[offs[0] : offs[-1]]
    return out, lens


def verify_edit1_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask: levenshtein(a_i, b_i) <= 1, vectorized.

    Candidates come from deletion blocking, so |len(a)−len(b)| ≤ 2;
    pairs with length gap 2 are always distance ≥ 2 and fail here.
    Equal length: at most one mismatching byte column.  Gap 1: with the
    shorter string s and longer l, distance 1 iff l minus one char
    equals s — first mismatch at k, then s[k:] == l[k+1:], checked as a
    right-to-left cumulative AND of the shifted equality matrix."""
    if not len(a):
        return np.zeros(0, dtype=bool)
    pa_a = pa.array(a, type=pa.string())
    pa_b = pa.array(b, type=pa.string())
    w = int(
        max(
            pc.max(pc.binary_length(pa_a)).as_py() or 0,
            pc.max(pc.binary_length(pa_b)).as_py() or 0,
        )
    ) + 1
    A, la = _byte_matrix(pa_a, w)
    B, lb = _byte_matrix(pa_b, w)
    out = np.zeros(len(a), dtype=bool)

    same = la == lb
    if same.any():
        out[same] = (A[same] != B[same]).sum(axis=1) <= 1

    gap1 = np.abs(la - lb) == 1
    if gap1.any():
        # orient: S = shorter, L = longer (subset FIRST — most candidates
        # are equal-length, don't build full-size swapped temporaries)
        sw = (lb < la)[gap1][:, None]
        Ag, Bg = A[gap1], B[gap1]
        S = np.where(sw, Bg, Ag)
        L = np.where(sw, Ag, Bg)
        eq = S == L
        # first mismatching column per row (w if none — L == S + pad char)
        mism = ~eq
        k = np.where(mism.any(axis=1), mism.argmax(axis=1), w)
        shifted_eq = S[:, :-1] == L[:, 1:]
        # suffix-all-equal from column k: right-to-left cumulative AND
        rc = np.flip(
            np.cumprod(np.flip(shifted_eq.astype(np.uint8), axis=1), axis=1),
            axis=1,
        )
        ok = np.where(
            k >= w - 1, True, rc[np.arange(len(k)), np.minimum(k, w - 2)] > 0
        )
        out[gap1] = ok
    return out


def edit1_self_join(names_ds, col: str, *, num_buckets: int = 16):
    """Dataset of (name_a, name_b) DISTINCT pairs, name_a < name_b, at
    Levenshtein distance exactly ≤ 1 (identical strings are collapsed by
    the distinct step, so survivors are distance 1)."""
    from .groupby import bucketed_agg, bucketed_groups

    distinct = bucketed_agg(
        names_ds.select_columns([col]),
        [col],
        {"_n": (col, "size")},
        num_buckets=num_buckets,
    ).select_columns([col])

    def keys_batch(t: pa.Table) -> pd.DataFrame:
        return deletion_variant_keys(t[col])

    keyed = distinct.map_batches(keys_batch, batch_format="pyarrow")

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"name_a": pd.Series(dtype="string"),
             "name_b": pd.Series(dtype="string")}
        )
        # vectorized within-key pair generation — sort by (key, name),
        # factorize the key, emit ordered index pairs per run via pure
        # index arithmetic (graph.py::_pairs_within_segments): millions
        # of tiny variant groups never hit a per-group Python loop
        from .graph import _pairs_within_segments

        d = df.drop_duplicates().sort_values(["key", "name"], kind="mergesort")
        codes, _ = pd.factorize(d["key"], sort=False)
        li, ri = _pairs_within_segments(codes.astype(np.int64))
        if not len(li):
            return empty
        names = d["name"].to_numpy(object)
        cand = pd.DataFrame(
            {"name_a": names[li], "name_b": names[ri]}
        ).drop_duplicates()
        keep = verify_edit1_pairs(
            cand["name_a"].to_numpy(object), cand["name_b"].to_numpy(object)
        )
        res = cand[keep]
        return res.astype("string") if len(res) else empty

    cand = bucketed_groups(keyed, ["key"], pairs_in_group, num_buckets=num_buckets)
    # a pair can arise from several shared keys — global pair dedup
    return bucketed_agg(
        cand, ["name_a", "name_b"], {"_n": ("name_a", "size")},
        num_buckets=num_buckets,
    ).select_columns(["name_a", "name_b"])
