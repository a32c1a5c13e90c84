"""Distributed cardinality sketch: HyperLogLog.

At 100 TB, ``COUNT(DISTINCT key)`` over a high-cardinality key is an
all-to-all of every distinct value.  The HLL sketch replaces it with a
fixed 2^p-register state whose per-batch partials (register → max rho)
merge associatively — so the Dataset plan is: vectorized ``map_batches``
partial → one TINY ``bucketed_agg`` max over ≤ 2^p register rows → a
driver-side estimate.  Nothing about the exchange grows with cardinality.

Exactness contract: the register content is a deterministic pure function
of the value multiset (max is commutative/associative), so the distributed
merge must equal the sequential single-process sketch bit-for-bit — that
is what the golden-parquet oracle checks (golden.py::hll_users_golden);
the ESTIMATE's accuracy (±1.04/sqrt(m)) is asserted separately in pytest.

No reference counterpart (the reference has no aggregates at this scale);
"a novel sketch" is the custom-operator family from the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

P_DEFAULT = 12  # 4096 registers → ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer (public-domain constants) — a
    full-avalanche 64-bit hash for integer keys.  Elementwise scalar
    shifts only (numpy's BROADCAST uint64 shifts hit a ~700× slower
    generic loop; these don't)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_values(values) -> np.ndarray:
    """64-bit hashes for an int or string array (strings via the cached
    token hasher shared with the MinHash kernel)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _splitmix64(arr.astype(np.int64).view(np.uint64))
    from .dedupe import _hash_token_array

    # the cached token hash is crc32-composed — fine for MinHash perms and
    # bucketing, but NOT avalanche-quality in the bit positions HLL reads
    # (measured: 3× undercount at 30k distinct strings); finalize it
    return _splitmix64(_hash_token_array(arr))


def hll_partial_registers(values, p: int = P_DEFAULT) -> np.ndarray:
    """One batch → its 2^p uint8 register maxima (0 = untouched).

    rho is computed with float64 log2 on the low ``64-p`` bits — exact
    because at p ≥ 11 those values stay below 2^53 (float64's integer
    range)."""
    assert p >= 11, "p < 11 would overflow float64-exact log2"
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash_values(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    rho = np.empty(len(h), dtype=np.uint8)
    nz = w > 0
    rho[nz] = (64 - p) - np.floor(np.log2(w[nz])).astype(np.int64)
    rho[~nz] = 64 - p + 1
    np.maximum.at(regs, idx, rho)
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Classic HLL estimate with the small-range linear-counting
    correction (64-bit hash → no large-range correction needed)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


def hll_sequential(values, p: int = P_DEFAULT) -> int:
    """Single-process sketch over one array — the golden-oracle path
    (same pure register function, no Ray)."""
    return hll_estimate(hll_partial_registers(values, p))


def hll_cardinality(ds, col: str, p: int = P_DEFAULT) -> int:
    """Approximate COUNT(DISTINCT col) over a Dataset.

    Exchange cost is bounded by 2^p rows regardless of input size: each
    batch emits only its touched (register, rho) pairs, the bucketed max
    reduces them, and ≤ 2^p rows reach the driver."""
    from ..functions.groupby import bucketed_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = hll_partial_registers(df[col].to_numpy(), p)
        nz = np.flatnonzero(regs)
        return pd.DataFrame(
            {"register": nz.astype(np.int64), "rho": regs[nz].astype(np.int64)}
        )

    small = (
        bucketed_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["register"],
            {"rho": ("rho", "max")},
            num_buckets=8,
        )
        .to_pandas()
    )
    regs = np.zeros(1 << p, dtype=np.uint8)
    if not small.empty:
        regs[small["register"].to_numpy(np.int64)] = small["rho"].to_numpy(np.int64)
    return hll_estimate(regs)


def hll_grouped_cardinality(
    ds, group_col: str, col: str, p: int = P_DEFAULT
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT col) GROUP BY group_col — one sketch
    per group.  Exchange cost is bounded by groups × 2^p (register,
    rho-max) rows, independent of value cardinality; the per-batch
    pandas groupby dispatch is per GROUP, so this is the LOW-group-
    cardinality arm (event types, languages, sources — not user ids).
    The exact high-cardinality companion is
    query/relational.py::events_distinct_users (pair-dedup exchange).

    Register maxima are a pure function of each group's value multiset,
    so the distributed merge equals the sequential per-group sketch
    bit-for-bit (golden.py::hll_types_golden checks the estimates)."""
    from ..functions.groupby import bucketed_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, dropna=False, sort=False):
            regs = hll_partial_registers(sub[col].to_numpy(), p)
            nz = np.flatnonzero(regs)
            out.append(
                pd.DataFrame(
                    {
                        group_col: g,
                        "register": nz.astype(np.int64),
                        "rho": regs[nz].astype(np.int64),
                    }
                )
            )
        if not out:
            # preserve the group column's dtype — an all-object empty
            # frame becomes a null-typed Arrow block that poisons the
            # downstream schema
            g0 = df[group_col].iloc[:0]
            if g0.dtype == object:  # empty object → Arrow null type
                g0 = g0.astype("string")
            return pd.DataFrame(
                {
                    group_col: g0,
                    "register": pd.Series(dtype="int64"),
                    "rho": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    small = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "register"],
        {"rho": ("rho", "max")},
        num_buckets=8,
    ).to_pandas()
    rows = []
    for g, sub in small.groupby(group_col, sort=True):
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[sub["register"].to_numpy(np.int64)] = sub["rho"].to_numpy(np.int64)
        rows.append((g, hll_estimate(regs)))
    return pd.DataFrame(
        {
            group_col: [r[0] for r in rows],
            "n_est": pd.Series([r[1] for r in rows], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: point frequency queries without a term-keyed exchange
# ---------------------------------------------------------------------------

CMS_D = 4  # rows (error probability (1/2)^d per probe)
CMS_W = 4096  # columns (over-estimate bound ~ 2·N/w per probe)
_CMS_SEEDS = np.array(
    [0xA076_1D64_78BD_642F, 0xE703_7ED1_A0B4_28DB,
     0x8EBC_6AF0_9C88_C6E3, 0x5896_55D8_9487_AEAC],
    dtype=np.uint64,
)  # public xxh/wyhash-family odd constants, one per row


def cms_positions(tokens, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, len(tokens)) column positions — one base hash per token, one
    cheap xor-finalize per row (d is 4; the loop is over ROWS, every
    elementwise op is vectorized over tokens)."""
    h = hash_values(tokens)
    return np.stack(
        [
            (_splitmix64(h ^ _CMS_SEEDS[r]) % np.uint64(w)).astype(np.int64)
            for r in range(d)
        ]
    )


def cms_cells(tokens, counts, d: int = CMS_D, w: int = CMS_W) -> pd.DataFrame:
    """One batch's (cell, cnt) partial rows: cell = row·w + column.
    Integer addition is commutative/associative, so summing these partials
    across any batch partitioning reproduces the sequential sketch
    EXACTLY — the same golden-oracle contract as the HLL register max."""
    if len(tokens) == 0:
        return pd.DataFrame(
            {"cell": pd.Series(dtype="int64"), "cnt": pd.Series(dtype="int64")}
        )
    pos = cms_positions(tokens, d, w)
    cnt = np.asarray(counts, dtype=np.int64)
    cells = (np.arange(d, dtype=np.int64)[:, None] * w + pos).ravel()
    weights = np.broadcast_to(cnt, (d, len(cnt))).ravel()
    acc = np.bincount(cells, weights=weights, minlength=d * w).astype(np.int64)
    nz = np.flatnonzero(acc)
    return pd.DataFrame({"cell": nz, "cnt": acc[nz]})


def cms_table_from_cells(df: pd.DataFrame, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    table = np.zeros(d * w, dtype=np.int64)
    if len(df):
        table[df["cell"].to_numpy(np.int64)] = df["cnt"].to_numpy(np.int64)
    return table.reshape(d, w)


def cms_query(table: np.ndarray, probes, w: int = CMS_W) -> np.ndarray:
    """Estimated counts (min over rows) — never under-estimates."""
    pos = cms_positions(probes, table.shape[0], w)
    return table[np.arange(table.shape[0])[:, None], pos].min(axis=0)


def cms_sequential(tokens, counts, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """Single-process sketch — the golden-oracle path."""
    return cms_table_from_cells(cms_cells(tokens, counts, d, w), d, w)


# Fixed probe vocabulary for the CMS demo query + its golden oracle (one
# deliberately-absent term exercises the no-false-negative floor of 0).
CMS_PROBE_TERMS = (
    "join", "hash", "scan", "batch", "spark", "window", "zzz_absent_term",
)


# ---------------------------------------------------------------------------
# KMV bottom-k quantile sketch
# ---------------------------------------------------------------------------

KMV_K_DEFAULT = 2048
KMV_PROBS_DEFAULT = (0.5, 0.95, 0.99)


def kmv_bottomk_partial(
    keys: np.ndarray, values: np.ndarray, k: int
) -> pd.DataFrame:
    """One batch → its ≤ k smallest (hash(key), value) rows.

    The global k-smallest-hash set over UNIQUE keys is a uniform
    without-replacement sample of size k (the KMV / bottom-k sketch,
    Bar-Yossef et al. 2002) that is a pure function of the key SET —
    merge-order- and partition-INVARIANT, unlike KLL/t-digest whose
    compactions depend on merge order.  SplitMix64 is a bijection on
    uint64, so unique keys give unique hashes and the k-set is exact."""
    h = hash_values(np.asarray(keys))
    v = np.asarray(values)
    if len(h) > k:
        idx = np.argpartition(h, k)[:k]
        h, v = h[idx], v[idx]
    return pd.DataFrame({"h": h, "value": v})


def _rank_quantiles(sample: np.ndarray, n_total: int, probs) -> dict:
    """Empirical quantiles of the (sorted) sample under the same exact
    rank rule as events_value_percentiles: rank = max(1, ceil(p·m))."""
    import math

    s = np.sort(sample)
    m = len(s)
    if m == 0:
        raise ValueError("kmv quantiles over an empty input")
    out = {}
    for p in probs:
        out[f"value_p{int(p * 100)}"] = float(s[max(1, math.ceil(p * m)) - 1])
    out["n_sample"] = m
    out["n_total"] = n_total
    return out


def kmv_quantiles(
    ds,
    key_col: str,
    value_col: str,
    probs=KMV_PROBS_DEFAULT,
    k: int = KMV_K_DEFAULT,
) -> pd.DataFrame:
    """Approximate quantiles over a Dataset column with ONE bounded
    exchange: per-batch bottom-k partials (≤ k rows per block) → global
    sort+limit over blocks×k rows → a k-row driver sample.  Rank error is
    O(n/sqrt(k)) (pytest-bounded); nothing in the plan grows with n.  An
    exact quantile at 100 TB is a full sort of the corpus — this sketch
    is the scale path, `events_value_percentiles` the exact one.

    The total row count rides the partials (first row of each block
    carries its batch size in ``n_rows``) and the bounded partials are
    materialized once, so the corpus is read exactly ONCE — no separate
    ``ds.count()`` pass."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = kmv_bottomk_partial(
            df[key_col].to_numpy(), df[value_col].to_numpy(), k
        )
        n_rows = np.zeros(len(out), dtype=np.int64)
        if len(n_rows):
            n_rows[0] = len(df)
        out["n_rows"] = n_rows
        return out

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    n_total = int(partials.sum("n_rows") or 0)
    sample = partials.sort("h").limit(k).to_pandas()
    row = _rank_quantiles(sample["value"].to_numpy(), n_total, probs)
    return pd.DataFrame({c: [row[c]] for c in row}).astype(
        {"n_sample": "int64", "n_total": "int64"}
    )


def kmv_sequential(
    keys, values, probs=KMV_PROBS_DEFAULT, k: int = KMV_K_DEFAULT
) -> pd.DataFrame:
    """Single-process sketch — the golden-oracle path (same pure k-set)."""
    part = kmv_bottomk_partial(np.asarray(keys), np.asarray(values), k)
    part = part.sort_values("h").head(k)
    row = _rank_quantiles(part["value"].to_numpy(), len(keys), probs)
    return pd.DataFrame({c: [row[c]] for c in row}).astype(
        {"n_sample": "int64", "n_total": "int64"}
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------


def _es_exp_keys(ids: np.ndarray, weights: np.ndarray, seed: int) -> np.ndarray:
    """Exponential race keys e_i = -ln(u_i)/w_i ~ Exp(w_i), u_i a
    deterministic 53-bit uniform from hash(id, seed).  The k SMALLEST
    e_i are exactly the Efraimidis–Spirakis weighted sample without
    replacement (their u^(1/w) top-k, taken through -ln).  Like the KMV
    k-set, the winner set is a pure function of the (id, weight, seed)
    SET — partition- and merge-order-invariant, so the distributed plan
    is golden-oracle hash-EXACT, not just statistically equivalent."""
    h = _splitmix64(
        hash_values(ids) ^ _splitmix64(np.full(1, seed, dtype=np.uint64))
    )
    # (h >> 11) + 1 → u in (0, 2^53]·2^-53 = (0, 1]: no log(0), and u=1
    # gives the best possible key 0 rather than an unreachable bound.
    u = ((h >> np.uint64(11)) + np.uint64(1)) * np.float64(2.0**-53)
    return -np.log(u) / np.asarray(weights, dtype=np.float64)


def es_sample_partial(
    ids: np.ndarray, weights: np.ndarray, k: int, seed: int
) -> pd.DataFrame:
    """One batch → its ≤ k smallest-key (id, weight, es_key) rows.
    Rows with weight ≤ 0 or null are excluded (zero mass ⇒ never drawn)."""
    ids = np.asarray(ids)
    w = np.asarray(weights, dtype=np.float64)
    ok = np.isfinite(w) & (w > 0)
    ids, w = ids[ok], w[ok]
    e = _es_exp_keys(ids, w, seed)
    if len(e) > k:
        idx = np.argpartition(e, k)[:k]
        ids, w, e = ids[idx], w[idx], e[idx]
    return pd.DataFrame({"id": ids, "weight": w, "es_key": e})


def weighted_sample(
    ds, id_col: str, weight_col: str, k: int, seed: int = 0
) -> pd.DataFrame:
    """Distributed weight-proportional sample WITHOUT replacement with
    ONE bounded exchange: per-batch ≤k-row partials → global sort+limit
    over blocks×k rows → a k-row driver result.  Inclusion probability
    follows the Efraimidis–Spirakis sequential procedure exactly (for
    k=1 it IS the weighted categorical draw — pytest-checked); nothing
    in the plan grows with the corpus.  Output: the winning ids with
    their weights, sorted by id for a deterministic contract."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return es_sample_partial(
            df[id_col].to_numpy(), df[weight_col].to_numpy(), k, seed
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    win = partials.sort("es_key").limit(k).to_pandas()
    out = win.sort_values("id", kind="mergesort").reset_index(drop=True)
    return out.rename(columns={"id": id_col, "weight": weight_col})


def weighted_sample_sequential(
    ids,
    weights,
    k: int,
    seed: int = 0,
    id_col: str = "id",
    weight_col: str = "weight",
) -> pd.DataFrame:
    """Single-process sample — the golden-oracle path (same winner set)."""
    part = es_sample_partial(np.asarray(ids), np.asarray(weights), k, seed)
    win = part.sort_values("es_key").head(k)
    out = win.sort_values("id", kind="mergesort").reset_index(drop=True)
    return out.rename(columns={"id": id_col, "weight": weight_col})


# ---------------------------------------------------------------------------
# KMV set operations: Jaccard / union / intersection estimates
# ---------------------------------------------------------------------------


def _overlap_from_sketches(sa: np.ndarray, sb: np.ndarray, k: int) -> dict:
    """Estimates from two bottom-k hash sketches (sorted unique uint64).

    If BOTH sketches are complete (held every hash, < k), the answer is
    exact.  Otherwise (Beyer et al. 2007): K = k smallest of the sketch
    union is exactly the k smallest of the TRUE union; membership of
    x ∈ K in either side's sketch is sound because fewer than k union
    elements precede x.  jaccard = |K ∩ A ∩ B| / k;
    |A∪B| ≈ (k-1)/U_(k) with hashes normalized to (0,1];
    |A∩B| ≈ jaccard · |A∪B|.  Every step is a pure function of the two
    hash sets → partition-invariant, golden-oracle exact."""
    union = np.union1d(sa, sb)
    if len(union) == 0:
        raise ValueError(
            "kmv_set_overlap: both groups are empty — check the group "
            "names (a typo would otherwise yield jaccard = 0/0 = NaN)"
        )
    if len(sa) < k and len(sb) < k:
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        return {
            "jaccard": np.float64(inter) / np.float64(len(union)),
            "union_est": np.float64(len(union)),
            "inter_est": np.float64(inter),
            "exact": True,
        }
    top = union[:k]
    in_a = np.isin(top, sa, assume_unique=True)
    in_b = np.isin(top, sb, assume_unique=True)
    j = np.float64((in_a & in_b).sum()) / np.float64(k)
    u_k = (np.float64(top[-1]) + 1.0) * np.float64(2.0**-64)
    union_est = np.float64(k - 1) / u_k
    return {
        "jaccard": j,
        "union_est": union_est,
        "inter_est": j * union_est,
        "exact": False,
    }


def _overlap_row(a, b, est: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "group_a": [a],
            "group_b": [b],
            "jaccard": [est["jaccard"]],
            "union_est": [est["union_est"]],
            "inter_est": [est["inter_est"]],
            "exact": [est["exact"]],
        }
    )


def kmv_set_overlap(
    ds, group_col: str, key_col: str, group_a, group_b, k: int = KMV_K_DEFAULT
) -> pd.DataFrame:
    """Distributed Jaccard / union / intersection estimate between the
    key sets of two groups with ONE bounded exchange: per-batch
    per-group ≤k-row unique-hash partials → per-group k-smallest reduce
    (2 groups × k rows total) → driver estimator.  The all-pairs exact
    alternative is a full co-grouped distinct exchange; this touches
    each row once and moves ≤ 2k·blocks rows at ANY cardinality."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[group_col].isin([group_a, group_b])]
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            h = np.unique(hash_values(sub[key_col].to_numpy()))[:k]
            out.append(pd.DataFrame({"g": g, "h": h}))
        if not out:
            # typed empty frame — an object-dtype "g" makes a null-typed
            # Arrow block, the exchange poison guarded against elsewhere
            g0 = df[group_col].iloc[:0]
            if g0.dtype == object:
                g0 = g0.astype("string")
            return pd.DataFrame(
                {"g": g0.reset_index(drop=True),
                 "h": np.array([], dtype=np.uint64)}
            )
        return pd.concat(out, ignore_index=True)

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(df["h"].to_numpy())[:k]
        return pd.DataFrame({"g": df["g"].iloc[:1].repeat(len(h)), "h": h})

    sk = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("g")
        .map_groups(reduce_group, batch_format="pandas")
        .to_pandas()
    )
    if sk.empty or "g" not in sk.columns:
        # zero matching rows anywhere → the grouped result has no schema
        raise ValueError(
            f"kmv_set_overlap: no rows matched either group "
            f"({group_a!r}, {group_b!r}) — check the group names"
        )
    sa = np.sort(sk.loc[sk["g"] == group_a, "h"].to_numpy(dtype=np.uint64))
    sb = np.sort(sk.loc[sk["g"] == group_b, "h"].to_numpy(dtype=np.uint64))
    return _overlap_row(group_a, group_b, _overlap_from_sketches(sa, sb, k))


def kmv_set_overlap_sequential(
    keys_a, keys_b, group_a, group_b, k: int = KMV_K_DEFAULT
) -> pd.DataFrame:
    """Single-process estimate — the golden-oracle path (same sketches)."""
    sa = np.unique(hash_values(np.asarray(keys_a)))[:k]
    sb = np.unique(hash_values(np.asarray(keys_b)))[:k]
    return _overlap_row(group_a, group_b, _overlap_from_sketches(sa, sb, k))


def grouped_weighted_sample(
    ds,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> pd.DataFrame:
    """Stratified weight-proportional sampling: k Efraimidis–Spirakis
    winners PER GROUP, one bounded exchange (per-batch per-group ≤k-row
    partials → per-group k-smallest reduce, groups × k rows total).
    Same partition-invariant winner-set argument as weighted_sample, so
    the per-group sequential sample matches bit-for-bit.  Low/moderate
    group cardinality (languages, sources) — groups × k must fit one
    driver frame."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            p = es_sample_partial(
                sub[id_col].to_numpy(), sub[weight_col].to_numpy(), k, seed
            )
            p.insert(0, group_col, g)
            out.append(p)
        if not out:
            g0 = df[group_col].iloc[:0]
            if g0.dtype == object:  # empty object → Arrow null type
                g0 = g0.astype("string")
            return pd.DataFrame(
                {
                    group_col: g0,
                    "id": df[id_col].iloc[:0],
                    "weight": np.array([], dtype=np.float64),
                    "es_key": np.array([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "es_key")

    win = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(reduce_group, batch_format="pandas")
        .to_pandas()
    )
    out = win.sort_values([group_col, "id"], kind="mergesort").reset_index(
        drop=True
    )
    return out.rename(columns={"id": id_col, "weight": weight_col})


def grouped_weighted_sample_sequential(
    df: pd.DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> pd.DataFrame:
    """Single-process per-group sample — the golden-oracle path."""
    out = []
    for g, sub in df.groupby(group_col, sort=True):
        p = es_sample_partial(
            sub[id_col].to_numpy(), sub[weight_col].to_numpy(), k, seed
        )
        p = p.nsmallest(k, "es_key")
        p.insert(0, group_col, g)
        out.append(p)
    res = pd.concat(out, ignore_index=True)
    res = res.sort_values([group_col, "id"], kind="mergesort").reset_index(
        drop=True
    )
    return res.rename(columns={"id": id_col, "weight": weight_col})
