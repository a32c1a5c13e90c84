"""Golden-parquet oracles for the queries SQL alone cannot express.

The driver's correctness gate runs each ``queries()`` entry side-by-side
with DuckDB SQL.  For algorithmic pipelines (MinHash/SimHash near-dup, the
fixture KG build, the fake-decoder media features) the SQL side instead
reads a GOLDEN parquet produced here by an INDEPENDENT single-process
pure-Python implementation of the same deterministic algorithm — the same
discipline as ``oracle.py`` (the KG reference oracle used by the P/R=1.0
gate): the distributed Ray orchestration is what gets cross-checked, the
shared arithmetic helpers (hashes, signatures) are pure functions.

Goldens are (re)written by ``write_goldens()`` — called from
``__ray_entry__.queries()`` / ``oracle_sql()`` so the files exist before
the driver runs either side — and land under ``GOLDEN_DIR`` keyed to the
sf0.01 tables the driver compares at (CORRECTNESS contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_DIR = "/tmp/kg_oracle_golden"
GOLDEN_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


# ---------------------------------------------------------------------------
# Single-process reimplementations (no Ray anywhere below)
# ---------------------------------------------------------------------------


def minhash_golden(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Sequential MinHash+LSH near-dup: signature → band buckets →
    candidate pairs → exact n-gram Jaccard → min-rep clusters.  Mirrors
    stages/dedupe.py's distributed plan step for step, in one process."""
    from .stages.dedupe import (
        NUM_BANDS,
        band_hashes,
        cluster_pairs,
        jaccard,
        minhash_signature,
        word_ngrams,
    )

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    buckets: dict[tuple, list] = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        bh = band_hashes(minhash_signature(text)[None, :])[0]
        for b in range(NUM_BANDS):
            buckets.setdefault((b, int(bh[b])), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    texts = dict(zip(df["doc_id"], df["text"]))
    grams: dict = {}

    def g(d):
        if d not in grams:
            grams[d] = word_ngrams(texts[d])
        return grams[d]

    verified = [(a, b) for a, b in sorted(cand) if jaccard(g(a), g(b)) >= threshold]
    mapping = cluster_pairs(verified)
    return pd.DataFrame(sorted(mapping.items()), columns=["doc_id", "cluster_rep"])


def simhash_golden(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Sequential SimHash block-permutation near-dup CLUSTERS
    (doc_id, cluster_rep = min of connected component) — pair walk plus a
    self-contained union-find, independent of the engine's distributed
    plan and of its forest-collapse representation."""
    from .stages.dedupe import simhash64

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    sh = {d: simhash64(t) for d, t in zip(df["doc_id"], df["text"])}
    buckets: dict[tuple, list] = {}
    for d, h in sh.items():
        for blk in range(4):
            buckets.setdefault((blk, (h >> (16 * blk)) & 0xFFFF), []).append(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                if bin(sh[ids[i]] ^ sh[ids[j]]).count("1") <= max_hamming:
                    pairs.add((ids[i], ids[j]))
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict = {}
    for d in parent:
        members.setdefault(find(d), set()).add(d)
    rows = sorted(
        (m, min(c | {root})) for root, c in members.items() for m in (c | {root})
    )
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep"])


def langid_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential language-ID over the documents table — the same
    deterministic per-doc voting heuristic applied row by row in one
    process (same discipline as the media-features golden: the
    distributed map_batches orchestration is what gets cross-checked)."""
    from .stages.textstats import _guess_lang

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_values("doc_id")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "lang_guess": [_guess_lang(t) for t in df["text"]],
        }
    )


def hll_users_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential HyperLogLog over events.user_id — the register content
    is a pure function of the value multiset, so the distributed
    register-max merge must reproduce this estimate EXACTLY."""
    from .stages.sketch import hll_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    return pd.DataFrame(
        {"n_users_est": pd.Series([hll_sequential(df["user_id"].to_numpy())],
                                  dtype="int64")}
    )


def hll_types_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential per-group HLL over events (distinct user_id per
    event_type) — each group's registers are a pure function of its value
    multiset, so the distributed grouped merge must match EXACTLY."""
    from .stages.sketch import hll_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    rows = [
        (g, hll_sequential(sub["user_id"].to_numpy()))
        for g, sub in df.groupby("event_type", sort=True)
    ]
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "n_est": pd.Series([r[1] for r in rows], dtype="int64"),
        }
    )


def kmv_quantiles_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential KMV bottom-k quantile sketch over events.value keyed by
    event_id — the k-smallest-hash set is a pure function of the key SET
    (SplitMix64 is bijective, event_id unique), so the distributed
    sort+limit merge must reproduce these quantiles EXACTLY at any
    partitioning; rank-error accuracy is pytest-bounded separately."""
    from .stages.sketch import kmv_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    return kmv_sequential(df["event_id"].to_numpy(), df["value"].to_numpy())


def weighted_sample_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential Efraimidis–Spirakis weighted sample of documents by
    n_chars — the winner set (k smallest exponential-race keys) is a
    pure function of the (doc_id, n_chars, seed) set, so the distributed
    partial→sort+limit plan must reproduce it EXACTLY at any
    partitioning; weight-proportional draw probability is pytest-checked
    separately (k=1 ≡ the weighted categorical distribution)."""
    from .stages.sketch import weighted_sample_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    return weighted_sample_sequential(
        df["doc_id"].to_numpy(),
        df["n_chars"].to_numpy(),
        k=200,
        seed=7,
        id_col="doc_id",
        weight_col="n_chars",
    )


def user_overlap_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential KMV set-operation estimate (Jaccard / union /
    intersection of the click-vs-view user sets) — both arms compute a
    pure function of the two hash sets, so the distributed sketch must
    match EXACTLY; estimator accuracy is pytest-bounded on synthetic
    sets large enough to exercise the estimation branch."""
    from .stages.sketch import kmv_set_overlap_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return kmv_set_overlap_sequential(
        df.loc[df["event_type"] == "click", "user_id"].to_numpy(),
        df.loc[df["event_type"] == "view", "user_id"].to_numpy(),
        "click",
        "view",
    )


def bigram_surprisal_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential bigram-LM train+score over documents — selection rules
    (top-M vocab, top-B bigrams, deterministic tie-breaks) and the
    per-doc token-order float summation are shared with the distributed
    arm via stages/lm.py::_score_frame, so the match is hash-EXACT."""
    from .stages.lm import bigram_surprisal_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bigram_surprisal_sequential(df["text"], df["doc_id"].to_numpy())


def bpe_token_counts_golden(sf_dir: str, k: int = 64, max_vocab: int = 10_000) -> pd.DataFrame:
    """Sequential BPE encode over documents: merges from the pure-Python
    REFERENCE trainer (independent of the production vectorized trainer;
    their equality is separately pytest/oracle-pinned via bpe_merges),
    then the shared encode kernel applied in one process.  Token counts
    are a pure function of (word, merges) → the distributed actor-pool
    apply must match exactly."""
    from collections import Counter

    from .stages.bpe import BPETokenCounter, bpe_train_reference

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    wc = Counter()
    for t in docs["text"].tolist():
        wc.update(t.split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    merges = bpe_train_reference(dict(top), k)
    mdf = pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": np.array([m[0] for m in merges], dtype=object),
            "right": np.array([m[1] for m in merges], dtype=object),
        }
    )
    out = BPETokenCounter(mdf)(docs.reset_index(drop=True))
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def grouped_weighted_sample_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential per-language Efraimidis–Spirakis sample of documents by
    n_chars (same partition-invariant winner-set argument as the global
    sample; per-group winners are a pure function of each group's
    (doc_id, n_chars, seed) set)."""
    from .stages.sketch import grouped_weighted_sample_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "doc_id", "n_chars"],
    )
    return grouped_weighted_sample_sequential(
        df, "lang", "doc_id", "n_chars", k=40, seed=11
    )


def perplexity_filter_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential composition of the LM-surprisal score, the KMV p90
    threshold, and the per-language survivor counts — each stage is the
    proven-equal sequential twin of its distributed arm, so the composed
    result must match hash-exactly."""
    from .stages.lm import bigram_surprisal_sequential
    from .stages.sketch import kmv_sequential

    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    scores = bigram_surprisal_sequential(df["text"], df["doc_id"].to_numpy())
    q = kmv_sequential(
        scores["doc_id"].to_numpy(), scores["surprisal"].to_numpy(), probs=(0.9,)
    )
    thr = float(q["value_p90"].iloc[0])
    merged = scores.merge(df[["doc_id", "lang"]], on="doc_id")
    merged["n_kept"] = (merged["surprisal"].to_numpy() <= thr).astype(np.int64)
    out = (
        merged.groupby("lang", as_index=False)
        .agg(n_docs=("doc_id", "size"), n_kept=("n_kept", "sum"))
        .sort_values("lang", kind="mergesort")
        .reset_index(drop=True)
    )
    out["p90_surprisal"] = thr
    return out[["lang", "n_docs", "n_kept", "p90_surprisal"]]


def pq_codes_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential product-quantization train+encode over the embeddings
    table — sample semantics, k-center/Lloyd float ops and argmin order
    identical to the distributed path (stages/pq.py), so the distributed
    codes must match byte-for-byte at any partitioning."""
    from .stages.embed import _matrix
    from .stages.pq import (
        codes_to_hex,
        pq_codebooks_from_matrix,
        pq_encode_kernel,
    )

    df = (
        pd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sample_df = df
    if len(df) > 65536:  # mirror sample_vectors' hash cutoff above target
        h = pd.util.hash_pandas_object(df["vec_id"], index=False).to_numpy()
        cutoff = np.uint64(int((65536 / len(df)) * (1 << 64)))
        sample_df = df[h.astype(np.uint64) < cutoff]
    cb = pq_codebooks_from_matrix(_matrix(sample_df["embedding"]))
    codes = pq_encode_kernel(_matrix(df["embedding"]), cb)
    return pd.DataFrame(
        {"vec_id": df["vec_id"].to_numpy(), "code_hex": codes_to_hex(codes)}
    )


def cms_terms_golden(sf_dir: str) -> pd.DataFrame:
    """Sequential Count-Min sketch over the whole corpus vocabulary,
    probed at the fixed term list — integer cell addition is
    commutative/associative, so the distributed partial-sum merge must
    reproduce these estimates EXACTLY (same contract as the HLL register
    max)."""
    from .stages.sketch import CMS_PROBE_TERMS, cms_query, cms_sequential

    df = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    vc = df["text"].str.split().explode().dropna().value_counts()
    table = cms_sequential(vc.index.to_numpy(), vc.to_numpy(np.int64))
    probes = np.asarray(CMS_PROBE_TERMS, dtype=object)
    return pd.DataFrame(
        {
            "term": probes,
            "est_count": pd.Series(cms_query(table, probes), dtype="int64"),
        }
    )


def fixture_triples_golden() -> pa.Table:
    """The KG reference oracle's triples over the deterministic fixture
    corpus (oracle.py — the same independent implementation behind the
    P/R = 1.0 gate)."""
    from .fixtures import generate_corpus
    from .oracle import GraphOracle

    return GraphOracle().build_from_docs(generate_corpus().to_pylist()).triples_table()


def label_counts_golden() -> pd.DataFrame:
    from .fixtures import generate_corpus
    from .oracle import GraphOracle

    nodes = GraphOracle().build_from_docs(generate_corpus().to_pylist()).nodes_table().to_pandas()
    out = (
        nodes.groupby("label", as_index=False)
        .agg(n_nodes=("name", "size"))
        .sort_values("label")
        .reset_index(drop=True)
    )
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out


def media_features_golden() -> pa.Table:
    """Fake-decoder media features computed sequentially (no actor pool):
    the Ray side must reproduce exactly this through the real plumbing."""
    from .fixtures import generate_corpus
    from .stages.media import fake_image_decoder, media_table_from_docs

    media = media_table_from_docs(generate_corpus())
    refs, widths, heights = [], [], []
    for ref, payload in sorted(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    ):
        _pixels, meta = fake_image_decoder(payload)
        refs.append(ref)
        widths.append(meta["width"])
        heights.append(meta["height"])
    return pa.Table.from_pydict(
        {"media_ref": refs, "width": widths, "height": heights},
        schema=pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
            ]
        ),
    )


def pagerank_golden_arrays(
    src: np.ndarray, dst: np.ndarray, *, iters: int = 10, scale: int = 10**9,
    seeds: np.ndarray | None = None,
) -> pd.DataFrame:
    """Sequential integer PageRank — the same int64 formulas as
    functions/graph.py::pagerank (share = r·17 // (20·out), teleport
    3·scale//20, uniform dangling redistribution with double floor
    division; with ``seeds``, teleport+dangling mass goes only to the
    seed nodes exactly as in the distributed kernel).  Integer sums are
    order-independent, so this matches the distributed result
    bit-for-bit."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    if not n:
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "rank_scaled": pd.Series(dtype="int64")}
        )
    es, ed = inv[: len(src)], inv[len(src) :]
    uniq = np.unique(es * np.int64(n) + ed)  # exact dedup of directed edges
    es, ed = uniq // n, uniq % n
    out = np.zeros(n, np.int64)
    np.add.at(out, es, 1)
    r = np.full(n, scale, np.int64)
    teleport = (3 * scale) // 20
    is_seed = None
    if seeds is not None:
        seeds_arr = np.unique(np.asarray(seeds, dtype=np.int64))
        if not len(seeds_arr):
            raise ValueError("personalized pagerank needs a non-empty seed set")
        is_seed = np.isin(nodes, seeds_arr)
        n_seeds = len(seeds_arr)
    for _ in range(iters):
        dang = int(r[out == 0].sum())
        share = np.zeros(n, np.int64)
        nz = out > 0
        share[nz] = (r[nz] * 17) // (20 * out[nz])
        contrib = np.zeros(n, np.int64)
        np.add.at(contrib, ed, share[es])
        if is_seed is None:
            r = teleport + contrib + ((17 * dang) // 20) // n
        else:
            boost = (3 * scale * n) // (20 * n_seeds) + ((17 * dang) // 20) // n_seeds
            r = contrib + np.where(is_seed, boost, 0).astype(np.int64)
    return pd.DataFrame({"node": nodes, "rank_scaled": r})


def _order_chain_edges(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Directed consecutive-distinct-part edges per order — sequentially,
    mirroring query/relational.py::graph_pagerank's distributed builder."""
    li = pd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    ).drop_duplicates()
    li = li.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
    o = li["l_orderkey"].to_numpy(np.int64)
    p = li["l_partkey"].to_numpy(np.int64)
    same = o[:-1] == o[1:]
    return p[:-1][same], p[1:][same]


# Iterations for the graph_pagerank QUERY (both sides): 5 keeps the
# driver's sf0.01 gate wall at ~20 s — the per-round cost is two shuffle
# barriers of pure coordination at toy scale, not data volume.
PAGERANK_QUERY_ITERS = 5


def pagerank_golden(sf_dir: str) -> pd.DataFrame:
    src, dst = _order_chain_edges(sf_dir)
    return pagerank_golden_arrays(src, dst, iters=PAGERANK_QUERY_ITERS)


PPR_QUERY_SEEDS = np.arange(5, dtype=np.int64)  # part keys 0..4


def ppr_golden(sf_dir: str) -> pd.DataFrame:
    src, dst = _order_chain_edges(sf_dir)
    return pagerank_golden_arrays(
        src, dst, iters=PAGERANK_QUERY_ITERS, seeds=PPR_QUERY_SEEDS
    )


def core_golden(sf_dir: str) -> pd.DataFrame:
    """Core numbers over the order-chain graph viewed UNDIRECTED, by
    sequential min-degree peeling (functions/graph.py::peel_core_numbers)
    — a different algorithm from the distributed h-index iteration the
    graph_core query runs, so the parity check is algorithm-independent."""
    from .functions.graph import peel_core_numbers

    src, dst = _order_chain_edges(sf_dir)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # both directions, exact-deduped — the contract peel_core_numbers wants
    pair = np.unique(
        np.stack(
            [np.concatenate([src, dst]), np.concatenate([dst, src])], axis=1
        ),
        axis=0,
    )
    return peel_core_numbers(pair[:, 0], pair[:, 1])


def _doubling_weighted_edges(sf_dir: str) -> pd.DataFrame:
    """The graph_bfs doubling graph (chain p—p+1 + chord p—2p on part
    keys) with deterministic integer weights w = 1 + (src + dst) mod 7 —
    mirrors query/relational.py::graph_sssp's distributed builder."""
    pk = np.sort(
        pd.read_parquet(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"]
        )["p_partkey"].to_numpy(np.int64)
    )
    mx = int(pk.max())
    chain = pk[pk + 1 <= mx]
    dbl = pk[(pk >= 1) & (2 * pk <= mx)]
    src = np.concatenate([chain, dbl])
    dst = np.concatenate([chain + 1, 2 * dbl])
    return pd.DataFrame({"src": src, "dst": dst, "w": 1 + (src + dst) % 7})


def sssp_golden(sf_dir: str) -> pd.DataFrame:
    """Shortest weighted distances from part key 0 by sequential
    DIJKSTRA (heapq) — a genuinely different algorithm from the
    distributed Bellman-Ford relaxation graph_sssp runs, so the parity
    check is algorithm-independent (the graph_core discipline)."""
    import heapq

    e = _doubling_weighted_edges(sf_dir)
    adj: dict = {}
    for s, d, w in zip(
        e["src"].to_numpy(), e["dst"].to_numpy(), e["w"].to_numpy()
    ):
        adj.setdefault(int(s), []).append((int(d), int(w)))
        adj.setdefault(int(d), []).append((int(s), int(w)))
    dist = {0: 0}
    heap = [(0, 0)]
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    nodes = np.array(sorted(dist), dtype=np.int64)
    return pd.DataFrame(
        {"node": nodes, "dist": np.array([dist[int(n)] for n in nodes], np.int64)}
    )


def bpe_golden(sf_dir: str, k: int = 8, max_vocab: int = 10_000) -> pd.DataFrame:
    """BPE merge table by the pure-Python reference trainer
    (stages/bpe.py::bpe_train_reference — dict/tuple loop, a different
    code shape from the production vectorized kernel): whitespace word
    counts capped to the top ``max_vocab`` by (count desc, word asc),
    then k greedy merges with overlapping pair counts and
    lexicographic tie-break."""
    from collections import Counter

    from .stages.bpe import bpe_train_reference

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    wc = Counter()
    for t in docs["text"].tolist():
        wc.update(t.split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    merges = bpe_train_reference(dict(top), k)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": np.array([m[0] for m in merges], dtype=object),
            "right": np.array([m[1] for m in merges], dtype=object),
            "n": np.array([m[2] for m in merges], dtype=np.int64),
        }
    )


def kcenter_golden(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """Greedy farthest-point selection, sequential whole-matrix reference
    (independent of the distributed per-batch partials): seed = smallest
    vec_id, then k−1 rounds of argmax-of-min-squared-L2 with
    smallest-id tie-break."""
    df = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_values("vec_id")
    ids = df["vec_id"].to_numpy(np.int64)
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    order = [0]
    # SAME per-point formula as the distributed arm's per-center pass —
    # ((V-c)^2).sum over the contiguous dim axis is bit-deterministic per
    # point, so near-ties resolve identically under any partitioning
    mind = ((V - V[0]) ** 2).sum(axis=1)
    mind[0] = -np.inf  # selected points leave the candidate pool (the
    # distributed arm excludes chosen ids — keeps duplicate-vector
    # corpora from re-selecting a zero-distance already-chosen point)
    for _ in range(1, min(k, len(ids))):
        m = mind.max()
        cand = np.where(mind == m)[0]
        nxt = int(cand[np.argmin(ids[cand])])
        order.append(nxt)
        mind = np.minimum(mind, ((V - V[nxt]) ** 2).sum(axis=1))
        mind[nxt] = -np.inf
    return pd.DataFrame(
        {
            "rank": np.arange(len(order), dtype=np.int64),
            "vec_id": ids[np.array(order)],
        }
    )


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def sf_tag(sf_dir: str) -> str:
    """Scale tag embedded in the sf-dependent golden FILENAMES — goldens
    for different scales coexist, so a parity pytest at sf0.001 can never
    clobber the driver's sf0.01 oracles (they are different files)."""
    return os.path.basename(sf_dir.rstrip("/")) or "sf"


_written_for: set[str] = set()


def _atomic_write(table: pa.Table, path: str) -> None:
    # tmp + rename so a concurrent reader never sees a half-written parquet
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def write_goldens(sf_dir: str = GOLDEN_SF_DIR, force: bool = False) -> str:
    """Write every golden parquet (idempotent per process per sf_dir;
    atomic per file).  Cost ~1-2 s — dominated by the 500-doc MinHash
    signatures."""
    if sf_dir in _written_for and not force:
        return GOLDEN_DIR
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tag = sf_tag(sf_dir)
    _atomic_write(
        pa.Table.from_pandas(minhash_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"dedup_minhash_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(simhash_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"dedup_simhash_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(langid_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"text_langid_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(hll_users_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"events_users_hll_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(cms_terms_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"corpus_cms_terms_{tag}.parquet"),
    )
    _atomic_write(
        fixture_triples_golden(),
        os.path.join(GOLDEN_DIR, "fixture_triples.parquet"),
    )
    from .fixtures import generate_corpus

    # the RAW span corpus (not a computed result) — the span-bigram
    # oracle does its own unnest/self-join work in SQL over this file
    _atomic_write(
        generate_corpus(),
        os.path.join(GOLDEN_DIR, "span_corpus.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(label_counts_golden(), preserve_index=False),
        os.path.join(GOLDEN_DIR, "label_counts.parquet"),
    )
    _atomic_write(
        media_features_golden(),
        os.path.join(GOLDEN_DIR, "media_features.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(pagerank_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"graph_pagerank_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(core_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"graph_core_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(hll_types_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"events_type_hll_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(pq_codes_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"pq_codes_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(kmv_quantiles_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"events_kmv_quantiles_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(weighted_sample_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"docs_weighted_sample_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(user_overlap_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"events_user_overlap_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(
            bigram_surprisal_golden(sf_dir), preserve_index=False
        ),
        os.path.join(GOLDEN_DIR, f"docs_bigram_surprisal_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(
            bpe_token_counts_golden(sf_dir), preserve_index=False
        ),
        os.path.join(GOLDEN_DIR, f"docs_bpe_token_counts_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(
            grouped_weighted_sample_golden(sf_dir), preserve_index=False
        ),
        os.path.join(GOLDEN_DIR, f"docs_weighted_sample_by_lang_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(
            perplexity_filter_golden(sf_dir), preserve_index=False
        ),
        os.path.join(GOLDEN_DIR, f"curation_perplexity_filter_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(ppr_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"graph_ppr_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(bpe_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"bpe_merges_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(kcenter_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"kcenter_sample_{tag}.parquet"),
    )
    _atomic_write(
        pa.Table.from_pandas(sssp_golden(sf_dir), preserve_index=False),
        os.path.join(GOLDEN_DIR, f"graph_sssp_{tag}.parquet"),
    )
    _written_for.add(sf_dir)
    return GOLDEN_DIR
