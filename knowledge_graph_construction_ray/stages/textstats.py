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


def apply(ds, kernel, **kwargs):
    """Attach a textstats kernel to a Dataset (pandas batches)."""
    if kwargs:
        return ds.map_batches(lambda df: kernel(df, **kwargs), batch_format="pandas")
    return ds.map_batches(kernel, batch_format="pandas")
