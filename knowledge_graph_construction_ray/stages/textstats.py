"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting.  All are stateless vectorized ``map_batches``
kernels over the ``documents``-shaped table (doc_id, text, ...).

Column-naming note: every computed column is named identically in the
DuckDB oracle SQL (driver compares by sorted column name + value hash).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# (a deterministic offline stand-in for fasttext-style lang-id)
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "fr": {"le", "la", "et", "de", "un", "une", "est"},
    "es": {"el", "la", "y", "de", "un", "una", "es"},
    "de": {"der", "die", "und", "das", "ein", "ist"},
    "zh": set(),  # CJK: detected by script ratio, not stopwords
}


def tokens_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Token counting: whitespace tokens + a BPE-ish word/number regex."""
    stripped = df["text"].str.strip()
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["n_tokens"] = stripped.str.split(_WS).str.len().astype("int64")
    out["n_words"] = (
        df["text"].str.findall(r"[A-Za-z]+|[0-9]+").str.len().astype("int64")
    )
    return out


def quality_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Quality metrics as exact integers (stable to hash across engines):
    chars without whitespace, token count, longest token length."""
    toks = df["text"].str.strip().str.split(_WS)
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["n_chars_nospace"] = (
        df["text"].str.replace(_WS, "", regex=True).str.len().astype("int64")
    )
    out["n_tokens"] = toks.str.len().astype("int64")
    out["max_token_len"] = (
        toks.map(lambda ws: max((len(w) for w in ws), default=0)).astype("int64")
    )
    return out


def fingerprint_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprint: md5 of the whitespace-collapsed, lowercased
    text (matches DuckDB ``md5(regexp_replace(lower(text),'\\s+',' ','g'))``)."""
    norm = df["text"].str.lower().str.replace(_WS, " ", regex=True).str.strip()
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["fingerprint"] = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm
    ]
    return out


def _guess_lang(text: str) -> str:
    # script check first: CJK ratio
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    words = set(w.lower() for w in _WS.split(text[:2000]))
    best, best_hits = "unknown", 0
    for lang, stops in LANG_PROFILES.items():
        hits = len(words & stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def langid_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Language-ID heuristic (stopword-profile voting + CJK script ratio).
    Not SQL-expressible but deterministic → golden-parquet oracle
    (golden.py::langid_golden); accuracy additionally asserted against the
    table's own ``lang`` column in pytest."""
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["lang_guess"] = [_guess_lang(t) for t in df["text"]]
    return out


def rolling_hash_kernel(df: pd.DataFrame, window: int = 16) -> pd.DataFrame:
    """Karp-Rabin rolling-hash shingle sketch: min rolling hash over
    character windows — a cheap content fingerprint robust to small edits."""
    B, M = 257, (1 << 61) - 1
    pow_w = pow(B, window - 1, M)

    def min_hash(t: str) -> int:
        if len(t) < window:
            h = 0
            for ch in t:
                h = (h * B + ord(ch)) % M
            return h
        h, best = 0, None
        for i, ch in enumerate(t):
            if i >= window:
                h = (h - ord(t[i - window]) * pow_w) % M
            h = (h * B + ord(ch)) % M
            if i >= window - 1:
                best = h if best is None else min(best, h)
        return best

    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["min_rolling_hash"] = [min_hash(t) for t in df["text"]]
    return out


def repetition_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition metrics as exact integers (stable to hash
    across engines): total tokens, distinct tokens, and the count of the
    most frequent token per doc.  Downstream filters derive the standard
    ratios (duplicate-token fraction = 1 - n_distinct/n_tokens, top-token
    fraction = top_count/n_tokens) without any float crossing the oracle.

    Fully vectorized: one explode + one ``pd.factorize`` over the batch's
    flat token stream, then ``np.unique``/``bincount``/``maximum.at`` over
    (doc, token-code) pairs — no per-doc Python.  Docs that are empty after
    trim are excluded (SQL ``WHERE length(trim(text)) > 0`` parity)."""
    stripped = df["text"].str.strip()
    keep = (stripped.str.len() > 0).to_numpy()
    ids = df["doc_id"].to_numpy()[keep]
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int64"),
            "top_count": pd.Series([], dtype="int64"),
        }
    )
    if len(ids) == 0:
        return empty
    toks = stripped[keep].str.split(_WS)
    lens = toks.str.len().to_numpy(np.int64)
    flat = toks.explode().to_numpy()
    didx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    codes, uniques = pd.factorize(flat)
    width = np.int64(len(uniques))
    # (doc, token) composite key; didx < 2^31 per batch and width < tokens
    # per batch, so the product stays far below 2^63
    uk, cnt = np.unique(didx * width + codes, return_counts=True)
    ud = (uk // width).astype(np.int64)
    top = np.zeros(len(ids), dtype=np.int64)
    np.maximum.at(top, ud, cnt)
    return pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": np.bincount(didx, minlength=len(ids)).astype(np.int64),
            "n_distinct": np.bincount(ud, minlength=len(ids)).astype(np.int64),
            "top_count": top,
        }
    )


def word_ngrams_batch(texts: pd.Series, doc_ids, n: int = 3):
    """Vectorized word n-grams for a whole batch: one token explode, then
    one Arrow ``binary_join_element_wise`` over n shifted slices of the
    flat token array — no per-doc Python, no per-gram string building in
    the interpreter.  Grams that would straddle a document boundary are
    masked out via the repeated doc index.

    Returns ``(grams, gram_doc_ids)`` — a ``pa.Array`` of gram strings and
    the aligned numpy array of ``doc_ids`` values.  Docs empty after trim
    (SQL ``WHERE length(trim(text)) > 0``) and docs shorter than ``n``
    tokens yield nothing, matching the oracle's ``len(w) >= n`` guard."""
    import pyarrow.compute as pc

    stripped = texts.str.strip()
    keep = (stripped.str.len() > 0).to_numpy()
    ids = np.asarray(doc_ids)[keep]
    if len(ids) == 0:
        return pa.array([], type=pa.string()), ids
    toks = stripped[keep].str.split(_WS)
    lens = toks.str.len().to_numpy(np.int64)
    flat = pa.array(toks.explode().to_numpy(), type=pa.string())
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], type=pa.string()), ids[:0]
    didx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    parts = [flat.slice(i, m) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = didx[:m] == didx[n - 1 :]
    return grams.filter(pa.array(valid)), ids[didx[:m][valid]]


def apply(ds, kernel, **kwargs):
    """Attach a textstats kernel to a Dataset (pandas batches)."""
    if kwargs:
        return ds.map_batches(lambda df: kernel(df, **kwargs), batch_format="pandas")
    return ds.map_batches(kernel, batch_format="pandas")
