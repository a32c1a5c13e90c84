"""Containment-join soak: planted quote-inclusions at scale, flat driver RSS.

The asymmetric containment join (``ngram_containment_dedup``) indexes FULL
shingle sets — its cost driver is inverted-list length, not corpus size.
This soak builds the shape the operator exists for — ``--pairs`` (quote,
host) pairs where a short doc is verbatim-embedded in a 4×-longer one
(containment 1.0, Jaccard ≈ 0.2: invisible to the Jaccard join) on top of
a unique-doc majority — runs the fully distributed plan, and asserts
EXACT recovery of every planted pair plus wall time and driver max-RSS.

Usage: python tools/soak_containment.py [--docs 500000] [--pairs 20000]
       [--cpus 32]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(path: str, n_docs: int, n_pairs: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_planted = 2 * n_pairs
    assert n_planted <= n_docs
    writer = None
    chunk = 100_000
    for lo in range(0, n_docs, chunk):
        hi = min(lo + chunk, n_docs)
        ids = np.arange(lo, hi, dtype=np.int64)
        texts = []
        for i in ids:
            if i < n_planted:
                p, side = divmod(int(i), 2)
                quote = [f"q{p}_{j}" for j in range(12)]
                if side == 0:  # the quote doc (doc_id = 2p)
                    texts.append(" ".join(quote))
                else:  # the host doc (doc_id = 2p + 1): filler + quote + filler
                    head = [f"h{p}_{j}" for j in range(20)]
                    tail = [f"t{p}_{j}" for j in range(20)]
                    texts.append(" ".join(head + quote + tail))
            else:
                texts.append(" ".join(f"uniq{i}_{j}" for j in range(12)))
        t = pa.Table.from_pydict({"doc_id": ids, "text": texts})
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    writer.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--pairs", type=int, default=20_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from knowledge_graph_construction_ray.stages.dedupe import (
        ngram_containment_dedup,
    )

    corpus = "/tmp/kg_soak_containment.parquet"
    build_corpus(corpus, args.docs, args.pairs)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024  # MiB
    t0 = time.time()
    ds = rd.read_parquet(corpus, override_num_blocks=max(16, args.cpus))
    out = ngram_containment_dedup(ds, threshold=(4, 5)).to_pandas()
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    expected = {(2 * p, 2 * p + 1) for p in range(args.pairs)}
    print(
        {
            "docs": args.docs,
            "planted_pairs": args.pairs,
            "found_pairs": len(got),
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(args.docs / wall, 1),
            "driver_rss_before_mib": round(rss0, 1),
            "driver_rss_after_mib": round(rss1, 1),
        }
    )
    assert got == expected, (
        f"pair recovery failed: missing {len(expected - got)}, "
        f"spurious {len(got - expected)}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()