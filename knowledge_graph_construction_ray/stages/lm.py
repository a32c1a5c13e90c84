"""Bigram language-model surprisal scoring — the CCNet-style
perplexity quality filter for training-data curation.

Two passes over the corpus (the same shape CCNet uses: fit a small LM,
then score everything):

1. **Train** — exact token and bigram counts via combiner partials
   (per-batch ``value_counts``, only DISTINCT keys cross the exchange)
   → bucketed sums → deterministic top-M vocabulary and top-B bigram
   table (ties broken by key order, so selection is a pure function of
   the corpus).  Exchange cost is bounded by the corpus VOCABULARY and
   the observed-bigram set, never the corpus row count; the model
   itself is a fixed-size broadcast artifact (M+1 context counts +
   ≤ B sorted bigram keys).
2. **Score** — the model arrays ride the map_batches closure (Ray puts
   them in the object store once; workers read zero-copy).  Per batch:
   one vectorized ``Index.get_indexer`` token→id pass, int64 combined
   bigram keys, ``np.searchsorted`` count lookup, and per-doc
   ``np.add.reduceat`` sums in token order — so each doc's float sum is
   computed in the SAME order at any partitioning, making the score
   partition-invariant and the golden oracle hash-EXACT.

Smoothing: add-α with the pruned-bigram mass folded into the unseen
case (a pruned bigram scores like an unseen one — standard count
pruning à la KenLM; the CONTEXT counts stay exact and unpruned so the
denominator never loses mass).

No reference counterpart (the reference pipeline has no quality
scoring); this is part of the training-data operator suite from the
build brief.  Public method: CCNet (Wenzek et al. 2020) popularized
LM-perplexity filtering; add-α bigram smoothing is textbook
(Jurafsky & Martin ch. 3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")

VOCAB_SIZE_DEFAULT = 4096
MAX_BIGRAMS_DEFAULT = 1 << 17
ALPHA_DEFAULT = 0.5


def _tokenize(texts: pd.Series):
    """Lowercased whitespace tokens per doc; empty-after-trim docs get
    zero tokens (same trim discipline as corpus_top_terms)."""
    stripped = texts.fillna("").str.strip().str.lower()
    toks = stripped.str.split(_WS)
    lens = toks.str.len().to_numpy(np.int64).copy()
    lens[(stripped.str.len() == 0).to_numpy()] = 0
    flat_parts = toks[stripped.str.len() > 0]
    flat = (
        flat_parts.explode().to_numpy()
        if len(flat_parts)
        else np.array([], dtype=object)
    )
    return flat, lens


@dataclass
class BigramLM:
    """Broadcastable model state: all flat numpy, zero-copy from plasma."""

    vocab: pd.Index          # M token strings, id = position; OOV id = M
    ctx: np.ndarray          # (M+1,) int64 exact context counts
    bi_keys: np.ndarray      # (≤B,) SORTED int64 combined keys id1*(M+1)+id2
    bi_counts: np.ndarray    # aligned int64 counts
    alpha: float

    @property
    def n_ids(self) -> int:
        return len(self.vocab) + 1


def _token_ids(lm_vocab: pd.Index, flat_tokens: np.ndarray) -> np.ndarray:
    ids = lm_vocab.get_indexer(flat_tokens)
    ids[ids < 0] = len(lm_vocab)
    return ids.astype(np.int64)


def _bigram_keys(ids: np.ndarray, lens: np.ndarray, n_ids: int):
    """Combined int64 keys for all within-doc bigrams, plus per-doc
    bigram counts and the reduceat offsets (in bigram space)."""
    nbi = np.maximum(lens - 1, 0)
    if len(ids) == 0 or nbi.sum() == 0:
        return np.array([], dtype=np.int64), nbi
    didx = np.repeat(np.arange(len(lens)), lens)
    first, second = ids[:-1], ids[1:]
    same_doc = didx[:-1] == didx[1:]
    keys = first[same_doc] * np.int64(n_ids) + second[same_doc]
    return keys, nbi


def train_bigram_lm(
    ds,
    text_col: str = "text",
    vocab_size: int = VOCAB_SIZE_DEFAULT,
    max_bigrams: int = MAX_BIGRAMS_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
) -> BigramLM:
    """Fit the model over a Dataset (see module docstring for the plan)."""
    from ..functions.groupby import bucketed_agg, local_topk

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _lens = _tokenize(df[text_col])
        if len(flat) == 0:
            # empty OBJECT index would become an Arrow null-typed column
            # and poison the exchange schema (see hll_grouped_cardinality)
            return pd.DataFrame(
                {"term": pd.Series(dtype="string"),
                 "n": pd.Series(dtype="int64")}
            )
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"term": vc.index, "n": vc.to_numpy(np.int64)})

    uni = bucketed_agg(
        ds.map_batches(uni_partial, batch_format="pandas"),
        ["term"],
        {"n": ("n", "sum")},
    )
    head = local_topk(uni, ["n", "term"], vocab_size, descending=[True, False])
    vocab = pd.Index(head["term"].to_numpy() if not head.empty else [])
    n_ids = len(vocab) + 1

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _tokenize(df[text_col])
        ids = _token_ids(vocab, flat)
        keys, _nbi = _bigram_keys(ids, lens, n_ids)
        if len(keys) == 0:
            return pd.DataFrame(
                {
                    "key": np.array([], dtype=np.int64),
                    "n": np.array([], dtype=np.int64),
                }
            )
        vc = pd.Series(keys).value_counts()
        return pd.DataFrame(
            {"key": vc.index.to_numpy(np.int64), "n": vc.to_numpy(np.int64)}
        )

    bi = bucketed_agg(
        ds.map_batches(bi_partial, batch_format="pandas"),
        ["key"],
        {"n": ("n", "sum")},
    ).materialize()  # consumed twice (ctx + top-B); already combiner-reduced
    # to distinct observed bigrams, so this pins the AGGREGATE, not the corpus
    # context counts derive EXACTLY from the unpruned bigram counts
    # (sum over second id) — computed distributed, before the top-B cut
    def ctx_partial(df: pd.DataFrame) -> pd.DataFrame:
        c1 = df["key"].to_numpy(np.int64) // n_ids
        g = pd.DataFrame({"id1": c1, "n": df["n"].to_numpy(np.int64)})
        s = g.groupby("id1", sort=False)["n"].sum()
        return pd.DataFrame(
            {"id1": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)}
        )

    ctx_rows = bucketed_agg(
        bi.map_batches(ctx_partial, batch_format="pandas"),
        ["id1"],
        {"n": ("n", "sum")},
    ).to_pandas()
    ctx = np.zeros(n_ids, dtype=np.int64)
    if not ctx_rows.empty:
        ctx[ctx_rows["id1"].to_numpy(np.int64)] = ctx_rows["n"].to_numpy(
            np.int64
        )

    kept = local_topk(bi, ["n", "key"], max_bigrams, descending=[True, False])
    if kept.empty:
        bi_keys = np.array([], dtype=np.int64)
        bi_counts = np.array([], dtype=np.int64)
    else:
        kept = kept.sort_values("key", kind="mergesort")
        bi_keys = kept["key"].to_numpy(np.int64)
        bi_counts = kept["n"].to_numpy(np.int64)
    return BigramLM(vocab, ctx, bi_keys, bi_counts, alpha)


def _score_frame(lm: BigramLM, texts: pd.Series, doc_ids) -> pd.DataFrame:
    """The shared scoring kernel — BOTH the distributed map_batches arm
    and the sequential golden arm call exactly this, so per-doc float
    summation order is identical by construction."""
    flat, lens = _tokenize(texts)
    ids = _token_ids(lm.vocab, flat)
    n_ids = lm.n_ids
    keys, nbi = _bigram_keys(ids, lens, n_ids)
    surp = np.zeros(len(lens), dtype=np.float64)
    if len(keys):
        pos = np.searchsorted(lm.bi_keys, keys)
        pos = np.clip(pos, 0, max(len(lm.bi_keys) - 1, 0))
        hit = (
            lm.bi_keys[pos] == keys
            if len(lm.bi_keys)
            else np.zeros(len(keys), dtype=bool)
        )
        c2 = np.where(hit, lm.bi_counts[pos] if len(lm.bi_keys) else 0, 0)
        c1 = lm.ctx[keys // n_ids]
        nll = -np.log(
            (c2 + lm.alpha) / (c1 + lm.alpha * np.float64(n_ids))
        )
        offsets = np.concatenate(([0], np.cumsum(nbi)[:-1]))
        has = nbi > 0
        sums = np.zeros(len(lens), dtype=np.float64)
        if has.any():
            sums[has] = np.add.reduceat(nll, offsets[has])
        surp = np.where(has, sums / np.maximum(nbi, 1), 0.0)
    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids),
            "n_bigrams": nbi,
            "surprisal": surp,
        }
    )


def score_surprisal(
    ds,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple = (),
):
    """Attach mean bigram surprisal to every doc (streaming Dataset out).
    The model arrays are closure-captured: Ray serializes them to the
    object store once and every task reads them zero-copy.  ``extra_cols``
    are copied through unchanged (e.g. ``lang`` for stratified filters)."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        out = _score_frame(lm, df[text_col], df[id_col].to_numpy())
        for c in extra_cols:
            out[c] = df[c].to_numpy()
        return out

    return ds.map_batches(kernel, batch_format="pandas")


def bigram_surprisal_sequential(
    texts,
    doc_ids,
    vocab_size: int = VOCAB_SIZE_DEFAULT,
    max_bigrams: int = MAX_BIGRAMS_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
) -> pd.DataFrame:
    """Single-process train+score — the golden-oracle path.  Replicates
    the distributed selection rules exactly: global counts, top-M vocab
    by (count desc, token asc), top-B bigrams by (count desc, key asc)."""
    texts = pd.Series(texts).reset_index(drop=True)
    flat, lens = _tokenize(texts)
    uni = pd.Series(flat).value_counts()
    uni = (
        pd.DataFrame({"term": uni.index, "n": uni.to_numpy(np.int64)})
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .head(vocab_size)
    )
    vocab = pd.Index(uni["term"].to_numpy())
    n_ids = len(vocab) + 1
    ids = _token_ids(vocab, flat)
    keys, _nbi = _bigram_keys(ids, lens, n_ids)
    ctx = np.zeros(n_ids, dtype=np.int64)
    bi_keys = np.array([], dtype=np.int64)
    bi_counts = np.array([], dtype=np.int64)
    if len(keys):
        vc = pd.Series(keys).value_counts()
        all_bi = pd.DataFrame(
            {"key": vc.index.to_numpy(np.int64), "n": vc.to_numpy(np.int64)}
        )
        np.add.at(
            ctx,
            all_bi["key"].to_numpy(np.int64) // n_ids,
            all_bi["n"].to_numpy(np.int64),
        )
        kept = (
            all_bi.sort_values(
                ["n", "key"], ascending=[False, True], kind="mergesort"
            )
            .head(max_bigrams)
            .sort_values("key", kind="mergesort")
        )
        bi_keys = kept["key"].to_numpy(np.int64)
        bi_counts = kept["n"].to_numpy(np.int64)
    lm = BigramLM(vocab, ctx, bi_keys, bi_counts, alpha)
    out = _score_frame(lm, texts, np.asarray(doc_ids))
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
