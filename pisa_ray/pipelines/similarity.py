"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_knn`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``); every batch does one numpy matmul and emits its
  LOCAL top-k per query; a final tiny groupby merges partials. The
  full corpus is never collected anywhere — this is the reference's
  score-everything matmul (/root/reference/src/Inference.py:227-231)
  turned into a streaming partial-top-k.
* ``lsh_knn`` — the scale path: random-hyperplane bucket sketch;
  queries only score docs in their (multi-probe) buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _empty_knn_frame(id_col: str = "vec_id") -> pd.DataFrame:
    """Typed empty result — Ray drops 0-row blocks, so an all-miss
    probe would otherwise surface a SCHEMA-LESS DataFrame whose
    consumers KeyError on res['rank'] (review finding). THE single
    definition of the knn result schema (review finding: rerank and
    ivfpq re-implemented it verbatim, a drift hazard)."""
    return pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            id_col: pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )[["query_id", "rank", id_col, "cosine"]]


def _as_matrix(col) -> np.ndarray:
    """(n,) list<float> column -> (n, d) float64 matrix.

    Fast path: uniform-length, null-free List/LargeList/FixedSizeList
    reshapes straight off the flattened Arrow value buffer — no
    per-element Python object materialization (the old ``to_pylist``
    form built n*d PyFloats per batch before the BLAS kernel ever
    ran). Ragged, null-bearing, or non-Arrow inputs fall back to the
    ``to_pylist`` path, which raises numpy's inhomogeneous-shape
    error for ragged rows — the pre-existing error contract.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (
        isinstance(col, pa.Array)
        and (
            pa.types.is_list(col.type)
            or pa.types.is_large_list(col.type)
            or pa.types.is_fixed_size_list(col.type)
        )
        and col.null_count == 0
    ):
        n = len(col)
        if n == 0:
            d = getattr(col.type, "list_size", 0) or 0
            return np.empty((0, d), dtype=np.float64)
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(lengths[0])
        if np.all(lengths == d):
            flat = col.flatten()  # respects slice offsets
            if flat.null_count == 0:
                vals = flat.to_numpy(zero_copy_only=False)
                return np.ascontiguousarray(vals, dtype=np.float64).reshape(
                    n, d
                )
    return np.asarray(
        col.to_pylist() if hasattr(col, "to_pylist") else col,
        dtype=np.float64,
    )


def _matrix_to_list_array(m: np.ndarray) -> pa.LargeListArray:
    """(n, d) float64 -> large_list<double> column OFF THE FLAT BUFFER
    — the write-side twin of _as_matrix's fast path (review finding:
    hot stages built n per-row Python ndarrays via pa.array(list(m)))."""
    n, d = m.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * d, d, dtype=np.int64), type=pa.int64()
    )
    values = pa.array(np.ascontiguousarray(m, dtype=np.float64).reshape(-1))
    return pa.LargeListArray.from_arrays(offsets, values)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_rows(
    sims: np.ndarray, ids: np.ndarray, kk: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-row top-k under the total order (cosine desc,
    vec_id asc) — ONE lexsort over the whole (n_queries, n_docs)
    matrix, no per-query Python loop. Because the order is total,
    exact-cosine ties on the k boundary resolve identically at any
    block boundary / parallelism (the tie-expansion dance the old
    scalar loop did is subsumed by the full sort).

    Returns (sel_ids, sel_sims), both (n_queries, kk).
    """
    order = np.lexsort(
        (np.broadcast_to(ids, sims.shape), -sims), axis=1
    )[:, :kk]
    return ids[order], np.take_along_axis(sims, order, axis=1)


def brute_knn(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k of each query vector against the dataset.

    Returns DataFrame (query_id, rank, vec_id, cosine) with rank by
    (cosine desc, vec_id asc) — deterministic at any parallelism.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = (
        np.arange(q.shape[0], dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, dtype=np.int64)
    )
    qref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = qm @ m.T  # (Q, B)
        kk = min(k, m.shape[0])
        # vectorized LOCAL top-k under (cosine desc, vec_id asc): the
        # total order makes the cut partition-invariant even when
        # exact-cosine ties (duplicate embeddings) straddle the k
        # boundary — the merge uses the same order.
        sel_ids, sel_sims = _topk_rows(sims, ids, kk)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, kk)),
                "vec_id": pa.array(sel_ids.reshape(-1)),
                "cosine": pa.array(sel_sims.reshape(-1)),
            }
        )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        emb.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        # empty dataset / k<=0: Ray drops the 0-row blocks and
        # to_pandas surfaces a SCHEMA-LESS frame whose ["cosine"]
        # would KeyError (review finding — the guard every other knn
        # path already has)
        return _empty_knn_frame()
    out["cosine"] = np.round(out["cosine"], 6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)[
        ["query_id", "rank", "vec_id", "cosine"]
    ]


class LshIndexer:
    """Actor-pool stage: hyperplanes generated once per actor (same
    seed everywhere -> identical planes, no coordination). With
    ``n_tables`` > 1 each vector emits one row PER table (the classic
    OR-amplification: recall 1-(1-p^P)^L at L× shuffle volume); the
    table index is packed into the top bits of the bucket key so one
    shuffle routes all tables."""

    def __init__(
        self, dim: int, n_planes: int = 10, seed: int = 29, n_tables: int = 1
    ):
        self.planes = np.random.default_rng(seed).standard_normal(
            (n_tables, dim, n_planes)
        )
        self.n_planes = n_planes
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # an empty var-length list column decodes as (0, 0) and
            # the plane matmul would raise on the dim mismatch
            return pa.table(
                {
                    "bhash": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.large_list(pa.float64())),
                }
            )
        m = _normalize(_as_matrix(batch["embedding"]))
        bitvals = 1 << np.arange(self.n_planes, dtype=np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = []
        for t in range(self.n_tables):
            bits = (m @ self.planes[t]) > 0
            keys.append((bits @ bitvals) | (np.int64(t) << self.n_planes))
        key = np.concatenate(keys)
        vecs = _matrix_to_list_array(m)
        return pa.table(
            {
                "bhash": pa.array(key),
                "vec_id": pa.array(np.tile(ids, self.n_tables)),
                "vec": pa.concat_arrays([vecs] * self.n_tables),
            }
        )


def lsh_knn(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 10,
    seed: int = 29,
    concurrency: int = 4,
    n_probes: int = 0,
    n_tables: int = 1,
) -> pd.DataFrame:
    """Bucketed ANN with BOTH classic recall levers:

    * multi-probe (``n_probes``): each query probes its home bucket
      plus the ``n_probes`` Hamming-distance-1 neighbors whose bit has
      the smallest |q . plane| margin — the buckets a true neighbor
      most likely fell into. Cost ~(1+n_probes)/2^P of the corpus per
      query, zero extra shuffle volume.
    * multi-table (``n_tables``): L independent plane sets,
      OR-amplified — a neighbor is found if it collides in ANY table
      (recall 1-(1-p^P)^L). Cost: the corpus shuffles L× (each vector
      lives in L buckets), the standard LSH space/recall trade.

    ``n_probes=0, n_tables=1`` is the original single-probe sketch;
    ``brute_knn`` the exact path; ``ivf_knn`` the data-adaptive
    alternative that gets higher recall per scored candidate.

    Ranking precision (deliberate): bucketed paths rank by cosine
    ROUNDED to 1e-6. The same (query, doc) pair scored in different
    bucket groups can differ in the last ulp (BLAS accumulation
    depends on the group's matrix shape), so rounding is what makes
    multi-table dedup and rank order deterministic at any
    partitioning; the cost is that ties within 1e-6 may order
    differently than ``brute_knn``'s unrounded ranking.

    Scale shape: docs shuffle exactly ``n_tables`` times keyed by their
    own bucket; probing replicates only the tiny query table (one row
    per (query, table, probed bucket)), never the corpus. Multi-table
    hits ARE deduped at the merge (same exact cosine from every table,
    so keep-first on (query_id, vec_id) is exact)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if dim is None:
        dim = q.shape[1]
    planes = np.random.default_rng(seed).standard_normal((n_tables, dim, n_planes))
    bitvals = 1 << np.arange(n_planes, dtype=np.int64)
    n_probes = min(int(n_probes), n_planes)

    bucketed = emb.map_batches(
        LshIndexer,
        fn_constructor_kwargs={
            "dim": dim,
            "n_planes": n_planes,
            "seed": seed,
            "n_tables": n_tables,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    # one probe row per (query, table, bucket): per table, home bucket
    # first, then the n_probes lowest-margin bit flips
    probe_qid, probe_key = [], []
    for t in range(n_tables):
        proj = q @ planes[t]  # (Q, P)
        qkeys = ((proj > 0) @ bitvals) | (np.int64(t) << n_planes)
        probe_qid.append(np.arange(q.shape[0], dtype=np.int64))
        probe_key.append(qkeys.astype(np.int64))
        if n_probes > 0:
            flip_order = np.argsort(np.abs(proj), axis=1)[:, :n_probes]
            for j in range(n_probes):
                probe_qid.append(np.arange(q.shape[0], dtype=np.int64))
                probe_key.append(
                    (qkeys ^ bitvals[flip_order[:, j]]).astype(np.int64)
                )
    # probe table broadcast SORTED by bucket key: each bucket group
    # finds its queries with two searchsorted probes instead of a full
    # linear scan of every (query, table, probe) row per group (review
    # finding: ~|groups| x |probe rows| comparisons of pure overhead)
    p_keys = np.concatenate(probe_key)
    p_qids = np.concatenate(probe_qid)
    p_order = np.argsort(p_keys, kind="stable")
    qref = ray.put((p_keys[p_order], p_qids[p_order], q))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        keys_sorted, qids_sorted, qmat = ray.get(qref)
        key = int(g["bhash"].iloc[0])
        lo = int(np.searchsorted(keys_sorted, key, side="left"))
        hi = int(np.searchsorted(keys_sorted, key, side="right"))
        if lo == hi:
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "cosine": []}
            ).astype({"query_id": "int64", "vec_id": "int64", "cosine": "float64"})
        m = np.asarray([np.asarray(v) for v in g["vec"]])
        ids = g["vec_id"].to_numpy().astype(np.int64)
        sub_qids = qids_sorted[lo:hi]
        # round BEFORE the cut so the bucket-local order is exactly
        # the final merge's (rounded cosine desc, vec_id asc) — cutting
        # on raw cosines could keep a doc the rounded order ranks
        # below its dropped neighbor (review finding)
        sims = np.round(qmat[sub_qids] @ m.T, 6)  # (nq, B)
        kk = min(k, len(ids))
        sel_ids, sel_sims = _topk_rows(sims, ids, kk)
        return pd.DataFrame(
            {
                "query_id": np.repeat(sub_qids.astype(np.int64), kk),
                "vec_id": sel_ids.reshape(-1),
                "cosine": sel_sims.reshape(-1),
            }
        )

    res = (
        bucketed.groupby("bhash")
        .map_groups(probe, batch_format="pandas")
        .to_pandas()
    )
    if res.empty:
        return _empty_knn_frame()
    if n_tables > 1:
        # a pair scored in different tables lands in different bucket
        # GROUPS, whose BLAS sums can differ in the last ulp and round
        # to adjacent 1e-6 bins — keep-first would then be
        # order-dependent (review finding); an order-independent MAX
        # per (query, vec) is deterministic at any partitioning
        res = res.groupby(["query_id", "vec_id"], as_index=False)[
            "cosine"
        ].max()
    res = res.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    res["rank"] = res.groupby("query_id").cumcount() + 1
    # documented column order, matching _empty_knn_frame (review
    # finding: the empty and non-empty paths used to disagree)
    return res[res["rank"] <= k].reset_index(drop=True)[
        ["query_id", "rank", "vec_id", "cosine"]
    ]


def ivf_knn(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    kmeans_iter: int = 10,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF ANN: k-means coarse quantizer, exact scoring inside the
    ``n_probe`` clusters nearest each query (the FAISS IVF-Flat shape,
    data-adaptive where ``lsh_knn``'s hyperplanes are oblivious).

    1. ``clustering.kmeans`` (distributed combiner partials) learns
       ``n_clusters`` centroids over the NORMALIZED vectors. Vectors
       are then binned by INNER-PRODUCT argmax against those centroids
       (k-means centroids of unit vectors are not themselves unit-norm,
       so this is a deliberate IP partition, not the euclidean k-means
       partition — valid ANN because index and probe sides use the
       SAME rule, so a probe always reaches the list its true
       neighbors were binned into).
    2. One ``map_batches`` re-assigns each vector to its centroid and
       the corpus shuffles ONCE by cluster id (each doc lives in
       exactly one cluster — probe hits need no dedup).
    3. Queries rank centroids by cosine and probe the top ``n_probe``
       lists; the tiny (query, cluster) probe table broadcasts, the
       corpus never re-shuffles per query.

    Recall→1 as n_probe→n_clusters (== brute). Deterministic at any
    parallelism: the cluster-local cut expands boundary ties then cuts
    under (cosine desc, vec_id asc), like ``brute_knn``.
    """
    from .clustering import kmeans

    q = _normalize(np.asarray(queries, dtype=np.float64))
    # zero-copy emit + MATERIALIZED: kmeans, the assignment/encode
    # pass and (for PQ) the train sample all consume this map, and
    # plans are trees — unmaterialized it re-executed per consumer
    # (review finding)
    norm = emb.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                vec_col: _matrix_to_list_array(
                    _normalize(_as_matrix(b[vec_col]))
                )
                if b.num_rows
                else pa.array([], type=pa.large_list(pa.float64())),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    C, _ = kmeans(norm, n_clusters, n_iter=kmeans_iter, seed=seed,
                  id_col=id_col, vec_col=vec_col)
    n_probe = min(int(n_probe), C.shape[0])
    # queries -> their n_probe nearest centroids by cosine
    qsims = q @ C.T  # (Q, K)
    probe_cl = np.argsort(-qsims, axis=1, kind="stable")[:, :n_probe]
    qdf = pd.DataFrame(
        {
            "query_id": np.repeat(np.arange(q.shape[0], dtype=np.int64), n_probe),
            "cluster": probe_cl.reshape(-1).astype(np.int64),
        }
    )
    qref = ray.put((qdf, q))
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cluster": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.large_list(pa.float64())),
                }
            )
        cc = ray.get(cref)
        m = _normalize(_as_matrix(batch[vec_col]))
        a = np.argmax(m @ cc.T, axis=1)  # IP argmax (same rule as probe)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64)),
                "vec_id": batch[id_col],
                "vec": _matrix_to_list_array(m),
            }
        )

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        qs, qmat = ray.get(qref)
        sub = qs[qs.cluster == g["cluster"].iloc[0]]
        if sub.empty:
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "cosine": []}
            ).astype({"query_id": "int64", "vec_id": "int64", "cosine": "float64"})
        m = np.asarray([np.asarray(v) for v in g["vec"]])
        ids = g["vec_id"].to_numpy().astype(np.int64)
        sub_qids = sub["query_id"].to_numpy()
        # rounded BEFORE the cut: cluster-local order == final merge
        # order (see lsh_knn's probe)
        sims = np.round(qmat[sub_qids] @ m.T, 6)
        kk = min(k, len(ids))
        sel_ids, sel_sims = _topk_rows(sims, ids, kk)
        return pd.DataFrame(
            {
                "query_id": np.repeat(sub_qids.astype(np.int64), kk),
                "vec_id": sel_ids.reshape(-1),
                "cosine": sel_sims.reshape(-1),
            }
        )

    res = (
        emb.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(probe, batch_format="pandas")
        .to_pandas()
    )
    if res.empty:
        return _empty_knn_frame()
    res = res.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    res["rank"] = res.groupby("query_id").cumcount() + 1
    # documented column order, matching _empty_knn_frame (review
    # finding: the empty and non-empty paths used to disagree)
    return res[res["rank"] <= k].reset_index(drop=True)[
        ["query_id", "rank", "vec_id", "cosine"]
    ]


def rerank_topk(
    candidates: pd.DataFrame,
    emb: rd.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand_id_col: str = "doc_id",
) -> pd.DataFrame:
    """Second-stage embedding rerank of per-query candidate lists.

    ``candidates`` is the OUTPUT of a first-stage retrieval (BM25,
    ANN, ...): rows ``(query_id, <cand_id_col>)`` — inherently small
    (n_queries x n_candidates), so holding it on the driver and
    broadcasting it once via ``ray.put`` is the right scale shape.
    The embedding table is NEVER collected: it streams through one
    ``map_batches`` pass that keeps only candidate rows (searchsorted
    membership) and scores each kept row against exactly the queries
    that shortlisted it (one matmul per batch against the broadcast
    normalized query matrix). Docs without an embedding row drop out
    (inner-join semantics). Returns ``(query_id, rank, <cand_id_col>,
    cosine)``, rank by (cosine desc, id asc) — deterministic at any
    parallelism.
    """
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qrow_of = {int(v): i for i, v in enumerate(qids)}
    if candidates.empty:
        return _empty_knn_frame(cand_id_col)
    # dedup (query, candidate) pairs: unioned shortlists (BM25 ∪ ANN)
    # repeat docs, which would score twice and occupy two ranks,
    # pushing a genuine top-k doc past the cut (review finding)
    cand = candidates[["query_id", cand_id_col]].drop_duplicates().copy()
    cand["qrow"] = cand["query_id"].map(qrow_of)
    if cand["qrow"].isna().any():
        missing = sorted(set(cand.loc[cand["qrow"].isna(), "query_id"]))
        raise ValueError(f"rerank_topk: no query vector for query_ids {missing}")
    cand = cand.sort_values([cand_id_col, "qrow"], kind="mergesort")
    cd = cand[cand_id_col].to_numpy()            # id dtype preserved
    id_dtype = cd.dtype                          # (int64 or hashed uint64)
    starts = np.flatnonzero(np.r_[True, cd[1:] != cd[:-1]])
    uniq_docs = cd[starts]                       # sorted unique candidate ids
    offsets = np.r_[starts, cd.size]             # CSR offsets into qrows
    qrows = cand["qrow"].to_numpy(dtype=np.int64)
    state = ray.put((uniq_docs, offsets, qrows, q))

    def score_candidates(batch: pa.Table) -> pa.Table:
        from ..shuffle import sorted_lookup

        docs, off, qr, qm = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(id_dtype)
        hit, pos = sorted_lookup(docs, ids)
        if not hit.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    cand_id_col: pa.array(np.empty(0, dtype=id_dtype)),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        kept = np.flatnonzero(hit)
        m = _normalize(_as_matrix(batch[vec_col].take(pa.array(kept))))
        sims = m @ qm.T                           # (kept, n_queries)
        p = pos[kept]
        counts = off[p + 1] - off[p]
        # vectorized multi-range gather of each kept doc's query rows
        total = int(counts.sum())
        base = np.repeat(off[p] - np.r_[0, np.cumsum(counts)[:-1]], counts)
        take = np.arange(total, dtype=np.int64) + base
        row = np.repeat(np.arange(kept.size, dtype=np.int64), counts)
        qq = qr[take]
        return pa.table(
            {
                "query_id": pa.array(qids[qq]),
                cand_id_col: pa.array(ids[kept][row]),
                "cosine": pa.array(sims[row, qq]),
            }
        )

    out = emb.map_batches(score_candidates, batch_format="pyarrow").to_pandas()
    if out.empty:
        return _empty_knn_frame(cand_id_col)
    out = out.sort_values(
        ["query_id", "cosine", cand_id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[out["rank"] <= k].reset_index(drop=True)
    return out[["query_id", "rank", cand_id_col, "cosine"]].astype(
        {"query_id": "int64", "rank": "int64"}
    )


def hybrid_search(
    queries: rd.Dataset,
    index_dir: str,
    emb: rd.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    n_candidates: int = 25,
    k: int = 5,
    method: str = "auto",
    concurrency: int = 2,
    fetch_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_rank_round: int | None = None,
) -> pd.DataFrame:
    """Two-stage retrieve-then-rerank: stage 1 answers each query with
    BM25 top-``fetch_k`` over the inverted index (stateful actor pool,
    :func:`pisa_ray.scorer.query_index`), cuts to ``n_candidates`` per
    query by (score desc, doc_id asc); stage 2 re-scores the shortlist
    by embedding cosine against the query's vector
    (:func:`rerank_topk` — embeddings stream, candidates broadcast).

    ``candidate_rank_round`` rounds BM25 scores to that many decimals
    BEFORE the candidate cut — a SQL oracle replaying BM25 in double
    arithmetic then selects the exact same candidate set (the same
    canonicalization the ``bm25_topk`` driver entry uses); leave None
    for exact-score cuts in production.
    """
    from ..scorer import query_index

    fk = fetch_k if fetch_k is not None else max(4 * n_candidates, n_candidates + 25)
    hits = query_index(
        queries, index_dir, k=fk, method=method, concurrency=concurrency
    ).to_pandas()
    if hits.empty:
        return rerank_topk(
            pd.DataFrame({"query_id": [], "doc_id": []}),
            emb, query_vecs, query_ids, k=k, id_col=id_col, vec_col=vec_col,
        )
    if candidate_rank_round is not None:
        hits = hits.copy()
        hits["score"] = np.round(hits["score"].to_numpy(), candidate_rank_round)
    hits = hits.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    hits["crank"] = hits.groupby("query_id").cumcount() + 1
    cand = hits.loc[hits["crank"] <= n_candidates, ["query_id", "doc_id"]]
    return rerank_topk(
        cand, emb, query_vecs, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )


def rrf_fuse(
    ranked_lists: list[pd.DataFrame],
    k: int = 10,
    k0: float = 60.0,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009, the
    standard score-free fusion for hybrid lexical+vector retrieval):

        rrf(q, d) = Σ_lists 1 / (k0 + rank_list(q, d))

    Each input frame carries (query_id, ``id_col``) rows where rank is
    the 1-based row order within each (list, query_id) group — pass the
    outputs of :func:`pisa_ray.scorer.query_index` (already ranked) or
    any per-query-ordered candidate frame (``rank`` column used when
    present). Docs absent from a list simply contribute nothing —
    exactly the robustness argument for RRF over score interpolation
    (no score calibration across systems needed). Returns (query_id,
    rank, doc_id, rrf_score) rows, ties broken by doc_id ascending.

    Driver-sized by contract: fusion runs over top-k lists (thousands
    of rows), never over corpora — the heavy retrieval stages upstream
    are the distributed parts."""
    if k0 <= 0:
        raise ValueError(f"k0 must be positive, got {k0}")
    parts = []
    for li, df in enumerate(ranked_lists):
        if df is None or len(df) == 0:
            continue
        d = df[["query_id", id_col] + (["rank"] if "rank" in df.columns else [])].copy()
        if "rank" not in d.columns:
            d["rank"] = d.groupby("query_id").cumcount() + 1
        d["__rr"] = 1.0 / (k0 + d["rank"].astype(np.float64))
        parts.append(d[["query_id", id_col, "__rr"]])
    if not parts:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int32"),
                id_col: pd.Series(dtype="int64"),
                "rrf_score": pd.Series(dtype="float64"),
            }
        )
    allp = pd.concat(parts, ignore_index=True)
    fused = (
        allp.groupby(["query_id", id_col], as_index=False)["__rr"]
        .sum()
        .rename(columns={"__rr": "rrf_score"})
    )
    fused = fused.sort_values(
        ["query_id", "rrf_score", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    fused["rank"] = fused.groupby("query_id").cumcount() + 1
    fused = fused[fused["rank"] <= k].reset_index(drop=True)
    return fused[["query_id", "rank", id_col, "rrf_score"]].astype(
        {"rank": "int32"}
    )


def pq_train(
    sample: np.ndarray, m_sub: int, nbits: int = 6, n_iter: int = 15,
    seed: int = 23,
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011): split the
    dimension into ``m_sub`` subspaces and run Lloyd's per subspace on
    the training sample -> (m_sub, 2^nbits, d_sub) centroids. Training
    happens driver-side on a bounded sample — the FAISS train
    contract; the sample is the declared driver-sized object."""
    from .clustering import kmeans_oracle

    X = np.asarray(sample, dtype=np.float64)
    n, d = X.shape
    if d % m_sub:
        raise ValueError(
            f"pq_train: dim {d} not divisible by m_sub {m_sub}"
        )
    if not 1 <= nbits <= 8:
        raise ValueError(
            f"pq_train: nbits must be in [1, 8] (codes are uint8), got {nbits}"
        )
    K = 1 << nbits
    if n < K:
        raise ValueError(
            f"pq_train: sample of {n} vectors < {K} centroids; "
            "lower nbits or raise train_size"
        )
    dsub = d // m_sub
    ids = np.arange(n, dtype=np.int64)
    books = np.empty((m_sub, K, dsub), dtype=np.float64)
    for m in range(m_sub):
        C, _ = kmeans_oracle(
            X[:, m * dsub : (m + 1) * dsub], ids, K, n_iter=n_iter,
            seed=seed + m,
        )
        books[m] = C
    return books


def ivfpq_knn(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    nbits: int = 6,
    refine: int = 4,
    train_size: int = 4096,
    kmeans_iter: int = 10,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-PQ ANN (the FAISS IVFPQ,RFlat shape): coarse k-means
    partition + product-quantized codes through the shuffle + exact
    refine.

    Why this exists next to ``ivf_knn``: at 10^10+ vectors the scan
    working set is the bottleneck — PQ stores ``m_sub`` sub-codes
    (m_sub * nbits bits) per vector instead of d float64s (e.g. 8
    bytes vs 1 KB at d=128: ~128x), so a probe list fits in cache and
    the cluster shuffle moves codes, not vectors. Scoring inside a
    probed cluster is ADC (asymmetric distance computation): per query
    ONE (m_sub x 2^nbits) inner-product lookup table, then each
    vector's approximate cosine is m_sub table gathers — no
    per-vector float math. The top ``k*refine`` approximate
    candidates per query then re-rank EXACTLY against the original
    embedding table via ``rerank_topk`` (one membership-filtered
    streaming pass, never collected), so returned cosines are true
    cosines and recall comes from the refine margin rather than code
    precision alone.

    Codebooks train on a bounded driver-side sample (``train_size``,
    the FAISS train contract); coarse quantizer + assignment +
    encoding reuse the distributed kmeans / one-shuffle layout of
    ``ivf_knn``. Deterministic at any parallelism for a fixed seed."""
    from .clustering import kmeans

    q = _normalize(np.asarray(queries, dtype=np.float64))
    if refine < 1:
        raise ValueError("ivfpq_knn: refine must be >= 1")
    # zero-copy emit + MATERIALIZED: kmeans, the assignment/encode
    # pass and (for PQ) the train sample all consume this map, and
    # plans are trees — unmaterialized it re-executed per consumer
    # (review finding)
    norm = emb.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                vec_col: _matrix_to_list_array(
                    _normalize(_as_matrix(b[vec_col]))
                )
                if b.num_rows
                else pa.array([], type=pa.large_list(pa.float64())),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    C, _ = kmeans(norm, n_clusters, n_iter=kmeans_iter, seed=seed,
                  id_col=id_col, vec_col=vec_col)
    # PQ codebooks from a deterministic bounded sample (row order of
    # the source dataset)
    sample = np.concatenate(
        [
            _as_matrix(b[vec_col])
            for b in norm.limit(int(train_size)).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    books = pq_train(sample, m_sub=m_sub, nbits=nbits, seed=seed + 101)
    M, K, dsub = books.shape
    n_probe = min(int(n_probe), C.shape[0])
    qsims = q @ C.T
    probe_cl = np.argsort(-qsims, axis=1, kind="stable")[:, :n_probe]
    qdf = pd.DataFrame(
        {
            "query_id": np.repeat(
                np.arange(q.shape[0], dtype=np.int64), n_probe
            ),
            "cluster": probe_cl.reshape(-1).astype(np.int64),
        }
    )
    qref = ray.put((qdf, q))
    cref = ray.put((C, books))

    def encode(batch: pa.Table) -> pa.Table:
        cc, bk = ray.get(cref)
        m = _normalize(_as_matrix(batch[vec_col]))
        # coarse bin by IP argmax — same rule on the probe side (see
        # ivf_knn docstring); per-subspace PQ codes below use TRUE
        # euclidean argmin, where the ||bk||^2 correction matters
        a = np.argmax(m @ cc.T, axis=1)
        n = m.shape[0]
        codes = np.empty((n, M), dtype=np.uint8)
        for j in range(M):
            sub = m[:, j * dsub : (j + 1) * dsub]
            # euclid argmin == IP argmax on centroid-norm-corrected
            # distances; use full euclidean for exactness
            d2 = (
                -2.0 * (sub @ bk[j].T)
                + (bk[j] * bk[j]).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64)),
                "vec_id": batch[id_col],
                "codes": pa.Array.from_buffers(
                    pa.binary(M), n, [None, pa.py_buffer(codes.tobytes())]
                ),
            }
        )

    n_cand = int(k) * int(refine)

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        qs, qmat = ray.get(qref)
        _, bk = ray.get(cref)
        sub = qs[qs.cluster == g["cluster"].iloc[0]]
        empty = pd.DataFrame({"query_id": [], "vec_id": [], "approx": []}).astype(
            {"query_id": "int64", "vec_id": "int64", "approx": "float64"}
        )
        if sub.empty:
            return empty
        codes = np.frombuffer(b"".join(g["codes"]), dtype=np.uint8).reshape(
            -1, M
        )
        ids = g["vec_id"].to_numpy().astype(np.int64)
        sub_qids = sub["query_id"].to_numpy()
        qm = qmat[sub_qids]  # (Qs, d)
        # ADC: per subspace, (Qs, K) LUT then a (Qs, n) gather
        acc = np.zeros((qm.shape[0], ids.size), dtype=np.float64)
        for j in range(M):
            lut = qm[:, j * dsub : (j + 1) * dsub] @ bk[j].T  # (Qs, K)
            acc += lut[:, codes[:, j]]
        kk = min(n_cand, ids.size)
        sel_ids, sel_sims = _topk_rows(acc, ids, kk)
        return pd.DataFrame(
            {
                "query_id": np.repeat(sub_qids.astype(np.int64), kk),
                "vec_id": sel_ids.reshape(-1),
                "approx": sel_sims.reshape(-1),
            }
        )

    cand = (
        emb.map_batches(encode, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(probe, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return _empty_knn_frame()
    cand = (
        cand.sort_values(
            ["query_id", "approx", "vec_id"], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(n_cand)
    )
    qids = np.arange(q.shape[0], dtype=np.int64)
    return rerank_topk(
        cand[["query_id", "vec_id"]], emb, q, qids, k=k,
        id_col=id_col, vec_col=vec_col, cand_id_col="vec_id",
    )
