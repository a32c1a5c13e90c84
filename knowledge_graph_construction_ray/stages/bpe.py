"""Byte-pair-encoding merge training over a Ray corpus.

The industrial shape (HuggingFace tokenizers, SentencePiece BPE): the
CORPUS pass is the distributed part — whitespace word counts, one
bucketed exchange carrying distinct words — and the merge loop runs over
the (small, capped) word-count VOCABULARY.  A 100 TB corpus has a
bounded working vocabulary once capped to the top ``max_vocab`` words,
so the loop side is driver-bounded by construction; what must scale is
the count pass, and that reuses the combiner + bucketed_agg + local_topk
discipline of ``corpus_top_terms``.

Two independent implementations back the oracle discipline:

* :func:`bpe_train_vectorized` — the production kernel: the whole
  vocabulary's symbol sequences live in ONE flat numpy object array with
  word offsets; each round is vectorized pair extraction (shifted
  views), weighted pair counting (one ``groupby``), and a masked merge
  apply (the run-parity trick reproduces greedy-leftmost exactly — two
  matches can only overlap when left==right, i.e. at consecutive
  positions, where keeping even offsets within each consecutive run IS
  the greedy choice).
* :func:`bpe_train_reference` — a pure-Python dict/tuple loop (golden
  oracle; different code shape entirely).

Semantics (classic BPE, e.g. Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): pair counts include
OVERLAPPING adjacent pairs; ties break to the lexicographically
smallest (left, right); apply is greedy leftmost non-overlapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "BPETokenCounter",
    "bpe_train_reference",
    "bpe_train_vectorized",
    "corpus_word_counts",
    "count_bpe_tokens",
    "encode_token_count",
]


def corpus_word_counts(ds, max_vocab: int):
    """Distributed whitespace word counts capped to the top ``max_vocab``
    by (count desc, word asc) — per-batch ``value_counts`` partials, one
    bucketed exchange of distinct words, then the no-shuffle
    ``local_topk`` head.  Returns a driver DataFrame (word, n) bounded by
    ``max_vocab`` rows."""
    from ..functions.groupby import bucketed_agg, local_topk

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy(np.int64)})

    counts = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["word"],
        {"n": ("n", "sum")},
    )
    out = local_topk(counts, ["n", "word"], max_vocab, descending=[True, False])
    if out.empty:
        return pd.DataFrame({"word": pd.Series(dtype=object), "n": pd.Series(dtype="int64")})
    return out[["word", "n"]].reset_index(drop=True)


def bpe_train_reference(word_counts: dict[str, int], k: int) -> list[tuple[str, str, int]]:
    """Pure-Python BPE (the golden oracle): words as symbol tuples,
    Counter-style overlapping pair counts, greedy-leftmost apply."""
    vocab: dict[tuple, int] = {}
    for w, c in word_counts.items():
        t = tuple(w)
        vocab[t] = vocab.get(t, 0) + int(c)
    merges: list[tuple[str, str, int]] = []
    for _ in range(k):
        pc: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (left, right), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((left, right, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _greedy_keep(match_pos: np.ndarray) -> np.ndarray:
    """Greedy-leftmost non-overlapping selection among match positions.
    Two matches of one pair can only overlap at CONSECUTIVE positions
    (requires left == right), so keeping even offsets within each run of
    consecutive positions is exactly the greedy choice."""
    if not len(match_pos):
        return match_pos
    run_start = np.empty(len(match_pos), dtype=bool)
    run_start[0] = True
    np.not_equal(match_pos[1:], match_pos[:-1] + 1, out=run_start[1:])
    run_id = np.cumsum(run_start) - 1
    run_first = match_pos[run_start][run_id]
    return match_pos[(match_pos - run_first) % 2 == 0]


def bpe_train_vectorized(
    words: np.ndarray, counts: np.ndarray, k: int
) -> pd.DataFrame:
    """Vectorized BPE merge loop over a capped vocabulary.

    State: one flat object array of symbol strings + per-word lengths.
    Per round: shifted-view pair extraction, ONE weighted groupby for
    pair counts, masked merge apply (run-parity greedy).  No per-word
    Python anywhere past the one-time character split.

    Returns DataFrame (rank, left, right, n)."""
    counts = np.asarray(counts, dtype=np.int64)
    if len(words) == 0 or k <= 0:
        return pd.DataFrame(
            {
                "rank": pd.Series(dtype="int64"),
                "left": pd.Series(dtype=object),
                "right": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
            }
        )
    # one-time split: ≤ max_vocab words on the driver, init cost bounded
    flat = np.array([ch for w in words for ch in w], dtype=object)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    rows = []
    for rank in range(k):
        if not len(flat):
            break
        word_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        ends = np.cumsum(lens)
        tail = np.zeros(len(flat), dtype=bool)
        tail[ends - 1] = True
        valid = ~tail[:-1] if len(flat) > 1 else np.zeros(0, dtype=bool)
        if not valid.any():
            break
        pos = np.flatnonzero(valid)
        pairs = pd.DataFrame(
            {
                "left": flat[:-1][valid],
                "right": flat[1:][valid],
                "n": counts[word_id[:-1][valid]],
            }
        )
        agg = pairs.groupby(["left", "right"], as_index=False, sort=False)["n"].sum()
        agg = agg.sort_values(
            ["n", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        left, right, n = (
            agg.iloc[0]["left"],
            agg.iloc[0]["right"],
            int(agg.iloc[0]["n"]),
        )
        rows.append((rank, left, right, n))
        match = pos[(flat[:-1][valid] == left) & (flat[1:][valid] == right)]
        kept = _greedy_keep(match)
        rep = np.zeros(len(flat), dtype=bool)
        rep[kept] = True
        drop = np.zeros(len(flat), dtype=bool)
        drop[kept + 1] = True
        flat[rep] = left + right
        flat = flat[~drop]
        lens = np.bincount(word_id[~drop], minlength=len(lens)).astype(np.int64)
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int64),
            "left": np.array([r[1] for r in rows], dtype=object),
            "right": np.array([r[2] for r in rows], dtype=object),
            "n": np.array([r[3] for r in rows], dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# Encode / apply: token counting with a trained merge table
# ---------------------------------------------------------------------------


def encode_token_count(word: str, ranks: dict) -> int:
    """Tokens left after applying merges in RANK order (the standard
    BPE encode): repeatedly merge the lowest-rank adjacent pair, greedy
    leftmost over overlaps — the same parity rule as training, so a word
    seen in training collapses exactly as the trainer left it."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        out = []
        i = 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and (syms[i], syms[i + 1]) == best_pair
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


class BPETokenCounter:
    """Actor-pool batch kernel: count trained-BPE tokens per doc.

    The merge table is built ONCE per actor in ``__init__`` and encode
    results are memoized per DISTINCT word (process-lifetime, like the
    dedupe token-hash cache) — the per-word Python loop runs once per
    new vocabulary entry, not per occurrence; everything per-occurrence
    is a vectorized map + groupby-sum.  Pure function of (word, merges)
    → partition-invariant, golden-oracle exact."""

    def __init__(self, merges):
        if not isinstance(merges, pd.DataFrame):  # broadcast ObjectRef
            import ray

            merges = ray.get(merges)
        self._ranks = {
            (l, r): int(k)
            for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
        }
        self._cache: dict[str, int] = {}

    def _count(self, word: str) -> int:
        c = self._cache.get(word)
        if c is None:
            c = encode_token_count(word, self._ranks)
            self._cache[word] = c
        return c

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        flat = toks.explode().dropna()
        if len(flat):
            mapping = {w: self._count(w) for w in pd.unique(flat.to_numpy(object))}
            per_doc = flat.map(mapping).groupby(level=0).sum()
        else:
            per_doc = pd.Series(dtype="int64")
        n_words = toks.str.len().astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_words": n_words.to_numpy(np.int64),
                "n_bpe_tokens": per_doc.reindex(df.index, fill_value=0)
                .astype("int64")
                .to_numpy(np.int64),
            }
        )
        return out


def count_bpe_tokens(ds, merges: pd.DataFrame, *, concurrency: int = 2,
                     batch_size: int = 1024):
    """Apply a trained merge table to every doc (actor pool; the table
    is ``ray.put`` ONCE and each actor resolves it in ``__init__``)."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BPETokenCounter,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
