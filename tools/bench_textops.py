"""Scale check for the text/search operator batch (BM25, window
chunking, heavy terms, bigrams, BPE merges, snapshot diff) over a
replicated documents corpus — exactness gates included, not just walls.

Corpus: the sf documents table tiled ``--replicate`` times with shifted
doc_ids (deterministic).  Token statistics scale linearly with
replication, so every exactness gate below is checked against an
independent pandas/pure-Python computation on the same corpus.

Run:  python tools/bench_textops.py --replicate 40 [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(replicate: int) -> tuple[str, int]:
    base = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    # cache key must include the BASE corpus identity: the exactness
    # gates recompute their references from the current base, so a stale
    # corpus from another GRAFT_SF_DIR would fail every gate falsely
    tag = SF_DIR.strip("/").replace("/", "_")
    out_dir = f"/tmp/kg_bench_textops_{tag}_x{replicate}"
    path = os.path.join(out_dir, "documents.parquet")
    n = len(base) * replicate
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        reps = []
        for r in range(replicate):
            df = base.copy()
            df["doc_id"] = df["doc_id"] + r * 1_000_000_000
            reps.append(df)
        pd.concat(reps, ignore_index=True).to_parquet(path, index=False)
    return out_dir, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from knowledge_graph_construction_ray.query.relational import (
        bm25_search,
        bpe_merges,
        corpus_heavy_terms,
        corpus_snapshot_diff,
        corpus_top_bigrams,
        docs_chunk_windows,
    )
    from knowledge_graph_construction_ray.stages.bpe import bpe_train_reference

    corpus_dir, n_docs = build_corpus(args.replicate)
    docs = pd.read_parquet(os.path.join(corpus_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    report: dict = {"docs": n_docs, "cpus": args.cpus, "replicate": args.replicate}

    # --- chunking ----------------------------------------------------------
    t0 = time.time()
    chunks = docs_chunk_windows(corpus_dir)
    t = time.time() - t0
    lens = docs["text"].str.len().to_numpy(np.int64)
    want_chunks = int(np.maximum((np.maximum(lens, 1) + 149) // 150, 1).sum())
    report["docs_chunk_windows"] = {
        "sec": round(t, 2),
        "docs_per_sec": round(n_docs / t),
        "chunks": len(chunks),
        "count_exact": bool(len(chunks) == want_chunks),
    }

    # --- heavy terms -------------------------------------------------------
    t0 = time.time()
    heavy = corpus_heavy_terms(corpus_dir)
    t = time.time() - t0
    toks = docs["text"].str.split().explode().dropna()
    vc = toks.value_counts()
    thresh = max(1, len(toks) // 200)
    want = vc[vc >= thresh]
    ok = len(heavy) == len(want) and dict(zip(heavy["term"], heavy["n"])) == want.to_dict()
    report["corpus_heavy_terms"] = {
        "sec": round(t, 2),
        "tokens": int(len(toks)),
        "terms": len(heavy),
        "exact": bool(ok),
    }

    # --- bigrams -----------------------------------------------------------
    t0 = time.time()
    big = corpus_top_bigrams(corpus_dir)
    t = time.time() - t0
    report["corpus_top_bigrams"] = {
        "sec": round(t, 2),
        "top1": [str(big.iloc[0]["w1"]), str(big.iloc[0]["w2"]), int(big.iloc[0]["n"])],
        # replication multiplies every pair count exactly
        "top1_n_divisible_by_replicate": bool(int(big.iloc[0]["n"]) % args.replicate == 0),
    }

    # --- BM25 ----------------------------------------------------------------
    t0 = time.time()
    bm = bm25_search(corpus_dir)
    t = time.time() - t0
    report["bm25_search"] = {
        "sec": round(t, 2),
        "docs_per_sec": round(n_docs / t),
        "rows": len(bm),
    }

    # --- BPE -----------------------------------------------------------------
    t0 = time.time()
    merges = bpe_merges(corpus_dir)
    t = time.time() - t0
    wc = vc.to_dict()  # full vocab (< max_vocab at this corpus)
    ref = bpe_train_reference(wc, 8)
    got = list(zip(merges["left"], merges["right"], merges["n"].astype(int)))
    report["bpe_merges"] = {
        "sec": round(t, 2),
        "vocab": int(len(vc)),
        "merges": got[:3],
        "exact_vs_reference": bool(got == ref),
    }

    # --- snapshot diff -------------------------------------------------------
    t0 = time.time()
    diff = corpus_snapshot_diff(corpus_dir)
    t = time.time() - t0
    ids = docs["doc_id"].to_numpy()
    want_counts = {
        "deleted": int((ids % 7 == 0).sum()),
        "changed": int(((ids % 7 != 0) & (ids % 10 == 0)).sum()),
        "added": int((ids % 13 == 0).sum()),
    }
    got_counts = diff["status"].value_counts().to_dict()
    report["corpus_snapshot_diff"] = {
        "sec": round(t, 2),
        "docs_per_sec": round(n_docs / t),
        "rows": len(diff),
        "counts_exact": bool(got_counts == want_counts),
    }

    # --- dup-ngram span strip --------------------------------------------
    # a replicated corpus makes EVERY >=5-token doc fully covered (each
    # gram repeats `replicate` times), so the exactness gate is total:
    # long docs strip to '', docs under 5 tokens come back untouched
    from knowledge_graph_construction_ray.query.relational import (
        docs_strip_dup_ngrams,
    )

    t0 = time.time()
    stripped = docs_strip_dup_ngrams(corpus_dir)
    t = time.time() - t0
    ntok = docs["text"].str.strip().str.split().str.len().to_numpy(np.int64)
    long_doc = ntok >= 5
    got_empty = (
        stripped.set_index("doc_id")["text"].reindex(docs["doc_id"]).to_numpy(object)
        == ""
    )
    report["docs_strip_dup_ngrams"] = {
        "sec": round(t, 2),
        "docs_per_sec": round(n_docs / t),
        "fully_stripped_exact": bool((got_empty == long_doc).all()),
    }

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
