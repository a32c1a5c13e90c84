"""CLI entry point — the `ray job submit` surface of the engine.

Mirrors the reference's script entry points (``python -m
src.kg_construction.neo4j_loader`` and ``python
src/kg_construction/text_graph_builder.py``) as one resumable command:

    python -m knowledge_graph_construction_ray build \
        --input /data/docs_parts --work /data/kg_work [--canonicalize] [--salted]
    python -m knowledge_graph_construction_ray metrics --work /data/kg_work
    python -m knowledge_graph_construction_ray triples --work /data/kg_work --out /data/triples

``build`` is the checkpointed runner: per-partition commits, lineage,
metrics; re-running after a kill resumes without reprocessing completed
partitions.  This module owns a Ray session ONLY when none exists (driver
contract: under `ray job submit` or the test harness the session already
exists and is left untouched).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> bool:
    import ray

    if ray.is_initialized():
        return False
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    return True


def cmd_build(args: argparse.Namespace) -> dict:
    from .state.checkpoint import run_checkpointed

    return run_checkpointed(
        args.input,
        args.work,
        canonicalize=args.canonicalize,
        salted=args.salted,
        num_buckets=args.num_buckets,
    )


def cmd_write(args: argparse.Namespace) -> dict:
    """Fused fold+write build (materialize.write_graph_sorted): fastest
    full-build path — per-bucket sorted part files + saved partitioning
    (``_kg_meta.json``) that ``ingest`` reuses.  Not checkpointed; use
    ``build`` when per-partition resume matters more than wall time."""
    import ray.data as rd

    from .materialize import write_graph_sorted

    try:
        out = write_graph_sorted(
            rd.read_parquet(args.input),
            f"{args.out}/nodes",
            f"{args.out}/edges",
            num_buckets=args.num_buckets,
            salted=args.salted,
        )
    except ValueError as e:  # library raises catchable; CLI exits
        raise SystemExit(str(e)) from e
    out.pop("ray_stats", None)
    if getattr(args, "dedup_store", None):
        from .stages.dedupe import init_ingest_dedup

        out["dedup"] = init_ingest_dedup(
            rd.read_parquet(args.input), args.dedup_store
        )
    return out


def cmd_ingest(args: argparse.Namespace) -> dict:
    """Incremental ingest into a ``write`` output: only buckets receiving
    new rows are re-folded and rewritten (materialize.update_graph_sorted).
    With ``--dedup-store`` the batch is near-dup-screened against the
    standing corpus first (stages.dedupe.filter_ingest_batch): dups of
    stored docs are dropped before they enter the graph, survivors extend
    the screening state for the next batch."""
    import ray.data as rd

    from .materialize import update_graph_sorted

    docs = rd.read_parquet(args.input)
    dedup_report = None
    if getattr(args, "dedup_store", None):
        from .stages.dedupe import filter_ingest_batch

        docs, dedup_report = filter_ingest_batch(
            docs, args.dedup_store,
            threshold=getattr(args, "dedup_threshold", 0.5),
        )
    out = update_graph_sorted(
        docs,
        f"{args.out}/nodes",
        f"{args.out}/edges",
    )
    out.pop("ray_stats", None)
    if dedup_report is not None:
        out["dedup"] = dedup_report
    return out


def cmd_metrics(args: argparse.Namespace) -> list:
    from .state.checkpoint import read_metrics

    return read_metrics(args.work)


def cmd_triples(args: argparse.Namespace) -> dict:
    import os
    import shutil

    import ray.data as rd

    from .materialize import edges_to_triples

    # validate --work BEFORE clearing --out: a typo'd work dir must not
    # destroy a previous export and then fail on the read
    edges_dir = f"{args.work}/graph/edges"
    if not os.path.isdir(edges_dir) or not any(
        e.endswith(".parquet") for e in os.listdir(edges_dir)
    ):
        raise SystemExit(
            f"--work {args.work} has no graph/edges parquet (run build first)"
        )
    # write_parquet APPENDS uniquely-named files — a rerun into a dirty
    # --out would duplicate triples and inflate the fragment count; mirror
    # merge_from_checkpoint's clean-overwrite discipline.  Only a directory
    # that holds nothing but parquet fragments (a prior triples export) is
    # cleared — anything else refuses (before touching Ray) rather than
    # rm -rf'ing a shared tree.
    if os.path.isdir(args.out):
        stray = [e for e in os.listdir(args.out) if not e.endswith(".parquet")]
        if stray:
            raise SystemExit(
                f"--out {args.out} exists and contains non-parquet entries "
                f"(e.g. {stray[:3]}); refusing to clear it — pass an empty or "
                f"triples-only directory"
            )
        shutil.rmtree(args.out)
    elif os.path.exists(args.out):
        raise SystemExit(f"--out {args.out} exists and is not a directory")
    edges = rd.read_parquet(edges_dir)
    edges_to_triples(edges).write_parquet(args.out)
    import pyarrow.dataset as pads

    n = sum(f.metadata.num_rows for f in pads.dataset(args.out).get_fragments())
    return {"out": args.out, "triples": n}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="knowledge_graph_construction_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    b = sub.add_parser("build", help="checkpointed KG build (resumable)")
    b.add_argument("--input", required=True, help="directory of docs parquet partitions")
    b.add_argument("--work", required=True, help="work dir (ckpt/ + graph/)")
    b.add_argument("--canonicalize", action="store_true")
    b.add_argument("--salted", action="store_true")
    b.add_argument("--num-buckets", type=int, default=64)
    b.set_defaults(fn=cmd_build)

    w = sub.add_parser(
        "write", help="fused fold+write build (fastest; saves partitioning)"
    )
    w.add_argument("--input", required=True, help="directory of docs parquet")
    w.add_argument("--out", required=True, help="output dir (nodes/ + edges/)")
    w.add_argument("--salted", action="store_true")
    w.add_argument("--num-buckets", type=int, default=64)
    w.add_argument(
        "--dedup-store",
        help="also build the near-dup screening state (LSH band index + "
             "corpus texts) at this dir for future `ingest --dedup-store`",
    )
    w.set_defaults(fn=cmd_write)

    i = sub.add_parser(
        "ingest", help="incremental ingest into a `write` output"
    )
    i.add_argument("--input", required=True, help="directory of NEW docs parquet")
    i.add_argument("--out", required=True, help="existing write output dir")
    i.add_argument(
        "--dedup-store",
        help="near-dup-screen the batch against this standing state first "
             "(built by `write --dedup-store`); dropped ids are reported",
    )
    i.add_argument("--dedup-threshold", type=float, default=0.5)
    i.set_defaults(fn=cmd_ingest)

    m = sub.add_parser("metrics", help="print per-partition metrics")
    m.add_argument("--work", required=True)
    m.set_defaults(fn=cmd_metrics)

    t = sub.add_parser("triples", help="export (subj, pred, obj) triples")
    t.add_argument("--work", required=True)
    t.add_argument("--out", required=True)
    t.set_defaults(fn=cmd_triples)

    args = parser.parse_args(argv)
    owned = args.command != "metrics" and _ensure_ray()
    try:
        print(json.dumps(args.fn(args), ensure_ascii=False))
    finally:
        if owned:
            import ray

            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
