#!/usr/bin/env python
"""Scale measurement for the round-3 curation operators over the 500k-doc
replicated documents corpus (same corpus as the minhash bench row):

- dup_ngrams_over: corpus-wide duplicated-3-gram mining — the heavy one
  (every token crosses the gram exchange once, post-combiner);
- contamination_over: broadcast-set membership scan (should be read-bound);
- repetition kernel + PII scrub: stateless map-only stages (docs/s).

Usage: python tools/bench_curation.py [num_cpus]
Records go to BASELINE.md (standalone — the per-round bench.py stays
inside the driver's time budget).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402
import ray.data as rd  # noqa: E402


def main():
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bench import _ensure_minhash_corpus, _stage_walls
    from knowledge_graph_construction_ray.query.relational import (
        contamination_over,
        dup_ngrams_over,
    )
    from knowledge_graph_construction_ray.stages.pii import scrub_columns_kernel
    from knowledge_graph_construction_ray.stages.textstats import repetition_kernel

    path, n_docs = _ensure_minhash_corpus()
    blocks = max(16, num_cpus)
    docs = rd.read_parquet(path, override_num_blocks=blocks)

    # --- dup ngrams (min_docs=5: per-replica token suffixes cap every
    # gram at its base-corpus doc count, so the base threshold applies) ---
    for rep in range(2):
        t0 = time.perf_counter()
        out = dup_ngrams_over(docs, n=3, min_docs=5, k=20)
        wall = time.perf_counter() - t0
        print(f"dup_ngrams rep{rep}: {wall:.2f}s  rows={len(out)}  "
              f"({n_docs / wall:,.0f} docs/s)")
        if rep:
            print(out.head(3).to_string())

    # --- hashed-exchange scale path (8-byte keys instead of gram strings) ---
    from knowledge_graph_construction_ray.query.relational import dup_ngrams_hashed

    for rep in range(2):
        t0 = time.perf_counter()
        out = dup_ngrams_hashed(docs, n=3, min_docs=5, k=20)
        wall = time.perf_counter() - t0
        print(f"dup_ngrams_hashed rep{rep}: {wall:.2f}s  rows={len(out)}  "
              f"({n_docs / wall:,.0f} docs/s)")

    # stage attribution for the count exchange (the heavy part)
    from knowledge_graph_construction_ray.functions.groupby import bucketed_agg
    from knowledge_graph_construction_ray.stages.textstats import word_ngrams_batch
    import numpy as np
    import pandas as pd

    def partial(df):
        grams, gdoc = word_ngrams_batch(df["text"], df["doc_id"].to_numpy(), 3)
        sub = pd.DataFrame({"gram": grams.to_pandas(), "doc_id": gdoc}).drop_duplicates()
        vc = sub["gram"].value_counts()
        return pd.DataFrame({"gram": vc.index.to_numpy(), "n_docs": vc.to_numpy(np.int64)})

    t0 = time.perf_counter()
    counts = bucketed_agg(docs.map_batches(partial, batch_format="pandas"),
                          ["gram"], {"n_docs": ("n_docs", "sum")}).materialize()
    wall = time.perf_counter() - t0
    print(f"dup_ngrams count-exchange: {wall:.2f}s  grams={counts.count()}")
    for kk, v in sorted(_stage_walls(counts.stats()).items(), key=lambda kv: -kv[1])[:5]:
        print(f"  stage {kk}: {v}s")

    # --- contamination (eval = base doc_ids 0..9) ---
    import pyarrow.parquet as pq

    base = pq.read_table(path, columns=["doc_id", "text"],
                         filters=[("doc_id", "<", 10)]).to_pandas()
    for rep in range(2):
        t0 = time.perf_counter()
        out = contamination_over(docs, base, eval_max_id=10,
                                 concurrency=max(2, num_cpus // 2))
        wall = time.perf_counter() - t0
        print(f"contamination rep{rep}: {wall:.2f}s  hit_docs={len(out)}  "
              f"({n_docs / wall:,.0f} docs/s)")

    # --- stateless map stages ---
    t0 = time.perf_counter()
    n = docs.map_batches(repetition_kernel, batch_format="pandas").count()
    wall = time.perf_counter() - t0
    print(f"repetition_kernel: {wall:.2f}s  rows={n}  ({n / wall:,.0f} docs/s)")

    scrub = scrub_columns_kernel(["text"])
    t0 = time.perf_counter()
    ds = docs.map_batches(scrub, batch_format="pyarrow")
    n = ds.count()
    wall = time.perf_counter() - t0
    print(f"pii_scrub(text): {wall:.2f}s  rows={n}  ({n / wall:,.0f} docs/s)")
    for k, v in sorted(_stage_walls(ds.stats()).items(), key=lambda kv: -kv[1])[:4]:
        print(f"  stage {k}: {v}s")

    ray.shutdown()


if __name__ == "__main__":
    main()
