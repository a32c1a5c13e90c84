"""Final sorted, deduplicated graph materialization (operator T3) and the
canonical triple view for the P/R gate.

The reference approximates "sorted deduplicated graph" via Neo4j's keyed
store; here it is an explicit ``sort`` + partitioned Parquet write (Lance
when pylance is available — see sources.readers).  Output layout is
resumable: ``nodes/`` and ``edges/`` are directories of part files, never
one giant file.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from .schema import EDGES_SCHEMA, NODES_SCHEMA, TRIPLES_SCHEMA

try:
    from ray.data import Dataset
except ImportError:  # pragma: no cover
    Dataset = object  # type: ignore


def _strip_tags(props: str) -> str:
    """Tagged {k: [rank, seq, v]} → plain {k: v}, nulls (deletions) removed,
    keys sorted for deterministic output."""
    merged = json.loads(props)
    return json.dumps(
        {k: tag[2] for k, tag in merged.items() if tag[2] is not None},
        ensure_ascii=False,
        sort_keys=True,
    )


def _strip_props_column(props) -> list:
    """Strip once per DISTINCT props string: the JSON round-trip is the
    dominant node-side cost, and props values repeat heavily (stub '{}'
    rows, replicated/re-ingested corpora) — factorize makes the cost
    O(distinct) instead of O(rows) with identical output."""
    import numpy as np

    codes, uniq = pd.factorize(np.asarray(props, dtype=object))
    if len(codes) and codes.min() < 0:
        # factorize codes nulls as -1, which would silently index the
        # LAST distinct value — fail loudly like the per-row loop did
        raise ValueError("_strip_props_column: null props in node rows")
    stripped_uniq = np.asarray([_strip_tags(p) for p in uniq], dtype=object)
    stripped = stripped_uniq[codes] if len(codes) else stripped_uniq
    return stripped.tolist()


def _nodes_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df[df["kind"] == "node"]
    return pa.Table.from_pydict(
        {
            "label": df["label"].tolist(),
            "name": df["name"].tolist(),
            "props": _strip_props_column(df["props"].to_numpy()),
        },
        schema=NODES_SCHEMA,
    )


def _edges_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df[df["kind"] == "edge"]
    return pa.Table.from_pydict(
        {name: df[name].tolist() for name in EDGES_SCHEMA.names},
        schema=EDGES_SCHEMA,
    )


def finalize_nodes(merged_elements: "Dataset", *, assume_sorted: bool = False) -> "Dataset":
    """Deduped elements → sorted nodes table (label, name, props-json).

    ``assume_sorted=True`` skips the Sort exchange: the upstream
    ``merge_elements_sorted`` plan already emits blocks globally ordered
    by ``merge_key`` (sort-faithful to ``(label, name)`` within nodes),
    and the split projection below preserves block order."""
    nodes = merged_elements.map_batches(_nodes_batch, batch_format="pyarrow")
    return nodes if assume_sorted else nodes.sort(["label", "name"])


def finalize_edges(merged_elements: "Dataset", *, assume_sorted: bool = False) -> "Dataset":
    """Deduped elements → sorted edges table (5-tuple)."""
    edges = merged_elements.map_batches(_edges_batch, batch_format="pyarrow")
    return edges if assume_sorted else edges.sort(list(EDGES_SCHEMA.names))


def _prepare_store_dir(d: str) -> None:
    """Create-or-clear one graph output dir.  A prior build with a
    different bucket count would leave stale ``part-*.parquet`` files
    that a fresh build doesn't overwrite, silently mixing two graphs in
    reads — so an existing dir is cleared, but ONLY when it holds nothing
    but a previous store (part files + ``_kg_meta.json``); anything else
    refuses rather than rm-rf'ing a shared tree (the ``cmd_triples``
    dirty-out discipline).  Raises ValueError — library code must stay
    catchable from an embedding process; the CLI layer (``__main__``)
    translates to SystemExit."""
    import os
    import re
    import shutil

    if not os.path.isdir(d):
        if os.path.exists(d):
            raise ValueError(f"{d} exists and is not a directory")
        os.makedirs(d, exist_ok=True)
        return
    pat = re.compile(r"^(part-\d+\.parquet(\.[\w-]+\.tmp|\.tmp)?|_kg_meta\.json)$")
    stray = [e for e in os.listdir(d) if not pat.match(e)]
    if stray:
        raise ValueError(
            f"{d} exists and contains non-store entries (e.g. {stray[:3]}); "
            "refusing to clear it — pass an empty or store-only directory"
        )
    shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)


def write_graph_sorted(
    docs: "Dataset",
    nodes_dir: str,
    edges_dir: str,
    *,
    num_buckets: int = 64,
    salted: bool = False,
    batch_size: int | None = None,
) -> dict:
    """The fused at-scale T3 path: extract → combine → range exchange →
    per-bucket fold + sorted split + DIRECT partitioned write, all inside
    the bucket task.

    Versus ``build_graph(...)`` + two ``write_parquet`` consumers this
    removes the merged-elements materialization (one object-store write +
    TWO full scans) and both finalize projections — the folded bucket
    never leaves the worker that folds it.  Output layout is
    ``{nodes,edges}_dir/part-{bucket:05d}.parquet``: deterministic names
    make task retries idempotent (a re-executed bucket overwrites its own
    file), the per-bucket fragments are the resumable unit, and because
    bucket ids ascend with merge_key ranges (``merge.range_bucketed_elements``)
    the lexicographic file order gives readers the same globally sorted
    tables the Dataset API path materializes.  Buckets are pure-kind by
    the stratified boundary construction; the split below handles the
    bounds-empty degenerate case (single mixed bucket) all the same.

    Returns ``{"nodes": N, "edges": M, "buckets": B}`` (counts summed
    from the per-bucket stats rows — the only thing that reaches the
    driver)."""
    from .merge import _fold_bucket_sorted, range_bucketed_elements
    from .pipelines.kg import extract

    for d in (nodes_dir, edges_dir):
        _prepare_store_dir(d)
    kwargs = {"batch_size": batch_size} if batch_size else {}
    # narrow exchange: merge_key already encodes kind + every identity
    # field; the fold needs only (merge_key, props, src_rank, seq) and the
    # writer below reconstructs the fields by splitting the key
    bucketed, bounds = range_bucketed_elements(
        extract(docs, **kwargs), num_buckets=num_buckets, salted=salted, narrow=True
    )
    if salted:
        from .merge import _fold_bucket, _to_narrow_table

        bucketed = bucketed.groupby(["bucket", "salt"]).map_groups(
            lambda df: _to_narrow_table(_fold_bucket(df), ("bucket",)),
            batch_format="pandas",
        )

    def fold_write(df: pd.DataFrame) -> pd.DataFrame:
        df = _fold_bucket_sorted(df)
        return _write_bucket(df, nodes_dir, edges_dir)

    stats_ds = bucketed.groupby("bucket").map_groups(
        fold_write, batch_format="pandas"
    ).materialize()
    stats = stats_ds.to_pandas()
    # persist the partitioning LAST so update_graph_sorted can route new
    # docs into the SAME buckets (underscore prefix → ignored by parquet
    # dataset discovery); both dirs carry a copy for cross-validation.
    # Written only after every bucket committed: a killed build leaves no
    # meta, and `ingest` refuses a store that isn't complete.
    meta = {"version": 1, "bounds": bounds, "salted": bool(salted)}
    for d in (nodes_dir, edges_dir):
        with open(f"{d}/_kg_meta.json", "w") as f:
            json.dump(meta, f, ensure_ascii=False)
    if stats.empty:  # empty input: no buckets, schema-less stats frame
        return {"nodes": 0, "edges": 0, "buckets": 0, "ray_stats": stats_ds.stats()}
    return {
        "nodes": int(stats["nodes"].sum()),
        "edges": int(stats["edges"].sum()),
        "buckets": int(len(stats)),
        "ray_stats": stats_ds.stats(),
    }


def _write_bucket(df: pd.DataFrame, nodes_dir: str, edges_dir: str) -> pd.DataFrame:
    """Write one FOLDED, merge_key-sorted narrow bucket frame as its
    nodes/edges part files; returns the 1-row stats frame.  Output dirs
    must be shared storage on a multi-node cluster (object store / NFS
    URI), same contract as ``write_parquet``."""
    import os

    import pyarrow.parquet as pq

    from .merge import _is_edge_mask

    os.makedirs(nodes_dir, exist_ok=True)
    os.makedirs(edges_dir, exist_ok=True)
    bucket = int(df["bucket"].iloc[0]) if len(df) else 0
    is_edge = _is_edge_mask(df)
    nodes = df[~is_edge]
    edges = df[is_edge]

    def atomic_write(table: pa.Table, path: str) -> None:
        # tmp + rename: a task killed mid-write never leaves a truncated
        # parquet file behind, and a RETRIED task replaces its own output
        # idempotently.  The tmp name is per-attempt unique (pid + uuid):
        # on shared storage a zombie duplicate of the same bucket task
        # must never interleave with a live writer on one tmp file, or
        # os.replace could publish a truncated parquet.
        import uuid

        tmp = f"{path}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    if len(nodes):
        # N \x1f label \x1f name — n=2 keeps any later separator
        # inside `name` (key injectivity needs \x1f-free fields
        # anyway; see range_bucketed_elements)
        parts = nodes["merge_key"].str.split("\x1f", n=2, expand=True)
        atomic_write(
            pa.Table.from_pydict(
                {
                    "label": parts[1].tolist(),
                    "name": parts[2].tolist(),
                    "props": _strip_props_column(nodes["props"].to_numpy()),
                },
                schema=NODES_SCHEMA,
            ),
            f"{nodes_dir}/part-{bucket:05d}.parquet",
        )
    if len(edges):
        parts = edges["merge_key"].str.split("\x1f", n=5, expand=True)
        atomic_write(
            pa.Table.from_pydict(
                {
                    name: parts[i + 1].tolist()
                    for i, name in enumerate(EDGES_SCHEMA.names)
                },
                schema=EDGES_SCHEMA,
            ),
            f"{edges_dir}/part-{bucket:05d}.parquet",
        )
    return pd.DataFrame(
        {"bucket": [bucket], "nodes": [len(nodes)], "edges": [len(edges)]}
    )


def _retag_props(props) -> list:
    """Stripped plain props → store-lineage tagged maps {k: [-1, -1, v]}
    (strictly older than any real ``(src_rank ≥ 0, seq ≥ 0)`` tag, so a
    new ingest's property write wins — MERGE ``SET n += props``
    semantics); once per DISTINCT string, like :func:`_strip_props_column`."""
    import numpy as np

    codes, uniq = pd.factorize(np.asarray(props, dtype=object))
    if len(codes) and codes.min() < 0:
        raise ValueError("_retag_props: null props in stored node rows")
    retagged_uniq = np.asarray(
        [
            json.dumps(
                {k: [-1, -1, v] for k, v in json.loads(p).items()},
                ensure_ascii=False,
            )
            for p in uniq
        ],
        dtype=object,
    )
    out = retagged_uniq[codes] if len(codes) else retagged_uniq
    return out.tolist()


def _existing_bucket_narrow(
    bucket: int, nodes_dir: str, edges_dir: str
) -> pd.DataFrame:
    """Read one bucket's previously-written part files back into the
    NARROW elements form (merge_key reconstructed, props re-tagged with
    store lineage (-1, -1)); empty frame when the bucket had no files.

    Emitted EDGES-THEN-NODES: each stored part file is merge_key-sorted
    and every edge key ('E\\x1f…') precedes every node key ('N\\x1f…'),
    so the concatenation is globally sorted — the invariant the
    sorted-run delta merge (merge._fold_bucket_delta) relies on."""
    import os

    import pyarrow.parquet as pq

    frames = []
    epath = f"{edges_dir}/part-{bucket:05d}.parquet"
    if os.path.exists(epath):
        ed = pq.read_table(epath).to_pandas()
        frames.append(
            pd.DataFrame(
                {
                    "merge_key": (
                        "E\x1f" + ed["src_label"] + "\x1f" + ed["src_name"]
                        + "\x1f" + ed["rel"]
                        + "\x1f" + ed["dst_label"] + "\x1f" + ed["dst_name"]
                    ),
                    "props": None,
                }
            )
        )
    npath = f"{nodes_dir}/part-{bucket:05d}.parquet"
    if os.path.exists(npath):
        nd = pq.read_table(npath).to_pandas()
        frames.append(
            pd.DataFrame(
                {
                    "merge_key": ("N\x1f" + nd["label"] + "\x1f" + nd["name"]),
                    "props": _retag_props(nd["props"].to_numpy()),
                }
            )
        )
    if not frames:
        # full NARROW schema even when empty: fold_update projects onto
        # these columns, and fold_frame sorts on src_rank/seq
        return pd.DataFrame(
            {
                "merge_key": pd.Series(dtype=object),
                "props": pd.Series(dtype=object),
                "src_rank": pd.Series(dtype="int64"),
                "seq": pd.Series(dtype="int64"),
            }
        )
    out = pd.concat(frames, ignore_index=True)
    out["src_rank"] = -1
    out["seq"] = -1
    return out


def update_graph_sorted(
    new_docs: "Dataset",
    nodes_dir: str,
    edges_dir: str,
    *,
    batch_size: int | None = None,
) -> dict:
    """Incremental ingest into an existing :func:`write_graph_sorted`
    output: new docs route through the SAME saved range partitioning
    (``_kg_meta.json``), and only the buckets that receive new rows are
    re-folded and rewritten — untouched part files stay as they are,
    which is the whole point at 10^12-doc scale (a daily增量 batch
    touches the key ranges it mentions, not the corpus).

    The existing store participates in the fold as lineage ``(-1, -1)``
    rows (strictly older than any real ingest tag), giving MERGE
    ``SET n += props`` semantics: a new property write wins over the
    stored value, stubs never overwrite stored props, stored edges
    dedup against re-emitted ones.  ``update(A-built store, B)`` is
    byte-identical to ``build(A ∪ B)`` whenever B's lineage wins every
    A∩B property conflict — exactly the append-only ingest case (and
    vacuously when A and B write disjoint property keys); the parity
    test pins this on the fixture corpus.

    Because the partition bounds are FIXED by the original build, the
    pipeline streams end-to-end (no sampling materialize); repeated
    updates can skew bucket sizes if the new data's key distribution
    drifts — rebuild to re-balance (the meta records bounds so drift is
    inspectable)."""
    import os

    from .merge import range_bucketed_elements
    from .pipelines.kg import extract

    metas = []
    for d in (nodes_dir, edges_dir):
        path = f"{d}/_kg_meta.json"
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — not a write_graph_sorted output"
            )
        with open(path) as f:
            metas.append(json.load(f))
    if metas[0] != metas[1]:
        raise ValueError("nodes/edges _kg_meta.json disagree — mixed outputs?")
    meta = metas[0]
    # invalidate the meta for the duration of the rewrite (mirrors the
    # build's meta-written-last discipline): a killed ingest leaves a
    # store WITHOUT meta, which the next ingest refuses, instead of a
    # half-updated store indistinguishable from a complete one
    for d in (nodes_dir, edges_dir):
        os.remove(f"{d}/_kg_meta.json")

    kwargs = {"batch_size": batch_size} if batch_size else {}
    bucketed, _ = range_bucketed_elements(
        extract(new_docs, **kwargs),
        salted=meta["salted"],
        narrow=True,
        bounds=meta["bounds"],
    )
    if meta["salted"]:
        from .merge import _fold_bucket, _to_narrow_table

        bucketed = bucketed.groupby(["bucket", "salt"]).map_groups(
            lambda df: _to_narrow_table(_fold_bucket(df), ("bucket",)),
            batch_format="pandas",
        )

    def fold_update(df: pd.DataFrame) -> pd.DataFrame:
        from .merge import _fold_bucket_delta

        bucket = int(df["bucket"].iloc[0]) if len(df) else 0
        existing = _existing_bucket_narrow(bucket, nodes_dir, edges_dir)
        existing["bucket"] = bucket
        # sorted-run delta merge: the stored bucket is already folded and
        # merge_key-sorted, so only the keys the delta actually touches
        # re-fold — a touched bucket's cost is O(store + delta·fold),
        # not O(store·fold) (round-4 verdict item 4)
        return _write_bucket(
            _fold_bucket_delta(existing, df[existing.columns]),
            nodes_dir, edges_dir,
        )

    stats_ds = bucketed.groupby("bucket").map_groups(
        fold_update, batch_format="pandas"
    ).materialize()
    stats = stats_ds.to_pandas()
    # every touched bucket committed → the store is whole again: restore
    # the meta (same content; bounds are fixed for the store's lifetime)
    for d in (nodes_dir, edges_dir):
        with open(f"{d}/_kg_meta.json", "w") as f:
            json.dump(meta, f, ensure_ascii=False)
    if stats.empty:  # empty delta: no bucket touched, store untouched
        return {
            "nodes_written": 0,
            "edges_written": 0,
            "buckets_touched": 0,
            "ray_stats": stats_ds.stats(),
        }
    return {
        "nodes_written": int(stats["nodes"].sum()),
        "edges_written": int(stats["edges"].sum()),
        "buckets_touched": int(len(stats)),
        "ray_stats": stats_ds.stats(),
    }


def _triples_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    return pa.Table.from_pydict(
        {
            "subj": (df["src_label"] + ":" + df["src_name"]).tolist(),
            "pred": df["rel"].tolist(),
            "obj": (df["dst_label"] + ":" + df["dst_name"]).tolist(),
        },
        schema=TRIPLES_SCHEMA,
    )


def edges_to_triples(edges: "Dataset") -> "Dataset":
    """Canonical (subj, pred, obj) strings — the P/R-gate view
    (subj = "{src_label}:{src_name}", obj = "{dst_label}:{dst_name}")."""
    return edges.map_batches(_triples_batch, batch_format="pyarrow")


def triples_set(triples: "Dataset") -> set[tuple[str, str, str]]:
    """Small-result helper for tests/gating: collect to a Python set."""
    out: set[tuple[str, str, str]] = set()
    for b in triples.iter_batches(batch_size=65536, batch_format="pandas"):
        out.update(zip(b["subj"], b["pred"], b["obj"]))
    return out


def nodes_to_pandas(nodes: "Dataset") -> pd.DataFrame:
    return nodes.to_pandas()
