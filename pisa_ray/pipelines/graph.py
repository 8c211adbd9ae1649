"""Distributed connected components over an edge list.

The missing piece between pair-emitting dedup (MinHash LSH, exact
n-gram Jaccard, SimHash — all emit (id_a, id_b) near-dup PAIRS) and
the thing a training-data pipeline actually needs: a canonical
cluster id per document so "keep one doc per duplicate cluster" is a
single filter. Shared-bucket reach misses transitive duplicates
(A~B, B~C but A,C never share a bucket); components close them.

Algorithm: alternating large-star / small-star edge contraction —
the classic MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; public literature, no
code consulted). Both steps are ONE hash-partition exchange each
(`pisa_ray.shuffle.hash_group_apply`): the map side re-keys each edge
(both directions for large-star, max->min for small-star) fused into
the exchange's map tasks, and the reducer runs one vectorized
lexsort + run-min over its whole shard — no per-group UDFs, no driver
materialization, edges cross the wire O(|E|) per round, O(log n)
rounds. At the fixpoint the edge set is a forest of stars
(child -> component-minimum), which one final exchange turns into a
(id, comp_id) labeling. All reductions are exact minima, so results
are deterministic at any parallelism / block layout.

Convergence is detected by an order-independent fingerprint of the
edge set (row count + two independent 64-bit mix sums) going stable
across a large+small round; at the true fixpoint the edge set is
literally unchanged, so the fingerprint test is exact up to a
~2^-128 collision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..shuffle import _mix64, hash_group_apply, run_starts

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = run_starts(u, v)
    return u[keep], v[keep]


def _edge_cols(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    u = t["u"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    return u, v


def _large_map(t: pa.Table) -> pa.Table:
    u, v = _edge_cols(t)
    return pa.table(
        {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])},
        schema=_EDGE_SCHEMA,
    )


def _large_reduce(t: pa.Table) -> pa.Table:
    """Per node u with neighborhood G(u): connect every neighbor
    v > u to m = min(G(u) + {u}). Every undirected edge {a,b}, a<b is
    re-emitted exactly once (at reducer a), so |out| <= |E|."""
    if t.num_rows == 0:
        return pa.table({"u": [], "v": []}, schema=_EDGE_SCHEMA)
    u, v = _edge_cols(t)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    starts = run_starts(us)
    first = np.flatnonzero(starts)
    m_run = np.minimum(us[first], vs[first])  # v sorted within run
    m = m_run[np.cumsum(starts) - 1]
    keep = vs > us
    ou, ov = _dedup_pairs(vs[keep], m[keep])
    return pa.table({"u": ou, "v": ov}, schema=_EDGE_SCHEMA)


def _small_map(t: pa.Table) -> pa.Table:
    u, v = _edge_cols(t)
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi
    return pa.table({"u": hi[keep], "v": lo[keep]}, schema=_EDGE_SCHEMA)


def _small_reduce(t: pa.Table) -> pa.Table:
    """Per node u with strictly-smaller neighborhood G(u): connect u
    and every v in G(u) to m = min(G(u))."""
    if t.num_rows == 0:
        return pa.table({"u": [], "v": []}, schema=_EDGE_SCHEMA)
    u, v = _edge_cols(t)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    starts = run_starts(us)
    first = np.flatnonzero(starts)
    m_run = vs[first]  # all vs < us in this star orientation
    m = m_run[np.cumsum(starts) - 1]
    ou = np.concatenate([vs, us[first]])
    ov = np.concatenate([m, m_run])
    keep = ou != ov
    ou, ov = _dedup_pairs(ou[keep], ov[keep])
    return pa.table({"u": ou, "v": ov}, schema=_EDGE_SCHEMA)


def _label_reduce(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"id": [], "comp_id": []}, schema=_LABEL_SCHEMA)
    u, v = _edge_cols(t)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    first = np.flatnonzero(run_starts(us))
    return pa.table(
        {"id": us[first], "comp_id": vs[first]}, schema=_LABEL_SCHEMA
    )


_LABEL_SCHEMA = pa.schema([("id", pa.int64()), ("comp_id", pa.int64())])


def _fingerprint(edges: rd.Dataset) -> tuple:
    """Order-independent digest of the edge multiset: count plus two
    independent mix64 sums (per-block partials, tiny driver merge)."""

    def partial(t: pa.Table) -> pa.Table:
        u, v = _edge_cols(t)
        uu = u.view(np.uint64)
        vv = v.view(np.uint64)
        with np.errstate(over="ignore"):
            h1 = _mix64(uu * np.uint64(0x9E3779B97F4A7C15) ^ vv)
            h2 = _mix64(vv * np.uint64(0xC2B2AE3D27D4EB4F) ^ uu)
        return pa.table(
            {
                "n": np.array([t.num_rows], dtype=np.int64),
                "s1": np.array([np.sum(h1, dtype=np.uint64)]),
                "s2": np.array([np.sum(h2, dtype=np.uint64)]),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    with np.errstate(over="ignore"):
        s1 = np.sum(np.array([p["s1"] for p in parts], dtype=np.uint64))
        s2 = np.sum(np.array([p["s2"] for p in parts], dtype=np.uint64))
    return (int(n), int(s1), int(s2))


def connected_components(
    pairs: rd.Dataset,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> rd.Dataset:
    """(src, dst) edge list -> (id, comp_id) with comp_id = the
    minimum id reachable from id. Covers every id that appears in the
    edge list (isolated ids never enter; callers default them to
    themselves). max_iter is a safety rail: star contraction halves
    tree heights per round, so 50 covers any realizable input."""
    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "u": t[src_col].cast(pa.int64()),
                "v": t[dst_col].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"id": [], "comp_id": []}, schema=_LABEL_SCHEMA)
        )
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    prev, converged = None, False
    for _ in range(max_iter):
        edges = hash_group_apply(edges, "u", _large_reduce, map_fn=_large_map)
        edges = hash_group_apply(edges, "u", _small_reduce, map_fn=_small_map)
        fp = _fingerprint(edges)
        if fp == prev or fp[0] == 0:
            converged = True
            break
        prev = fp
    if not converged:
        # star contraction halves tree heights per round; hitting the
        # rail means the input is pathological — fail loudly rather
        # than emit labels from a non-converged edge set
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    if fp[0] == 0:  # no proper edges at all (e.g. self loops only)
        return rd.from_arrow(
            pa.table({"id": [], "comp_id": []}, schema=_LABEL_SCHEMA)
        )
    # star edges (child -> root) + (root -> root) self-labels, one
    # exchange keyed on the node for a unique (id, comp_id) row each
    def label_map(t: pa.Table) -> pa.Table:
        u, v = _edge_cols(t)
        ou, ov = _dedup_pairs(
            np.concatenate([u, v]), np.concatenate([v, v])
        )
        return pa.table({"u": ou, "v": ov}, schema=_EDGE_SCHEMA)

    return hash_group_apply(edges, "u", _label_reduce, map_fn=label_map)
