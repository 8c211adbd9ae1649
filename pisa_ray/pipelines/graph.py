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
    edge list INCLUDING nodes whose only edges are self-loops (they
    label as singletons); ids absent from the edge list never enter —
    callers default them to themselves. max_iter is a safety rail: star contraction halves
    tree heights per round, so 50 covers any realizable input."""
    # ONE pass over the source casts the edge list and is materialized;
    # everything downstream (the self-loop singleton scan, round 1 of
    # the contraction) reads the materialized Arrow blocks from the
    # object store instead of re-decoding the input. The contraction
    # loop materializes O(|E|) per round anyway, so this adds no new
    # peak; spill covers overflow.
    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "u": t[src_col].cast(pa.int64()),
                "v": t[dst_col].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"id": [], "comp_id": []}, schema=_LABEL_SCHEMA)
        )
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")

    # nodes appearing ONLY in self-loop edges would otherwise vanish
    # (round 1's large-star reduce drops u==v rows): collect their
    # (s, s) singleton rows — a cheap scan over the ALREADY-materialized
    # cast, not a second pass over the source — and inject them into
    # the final labeling exchange, whose per-node min-reduce keeps the
    # smaller component label for nodes proper edges also reach.
    # Per-batch unique; the exchange dedups across batches. Self-loop
    # rows stay in `edges` for round 1 — `_large_reduce` discards them
    # (keep = vs > us) without affecting any neighborhood minimum, so
    # no dedicated drop pass is needed.
    def self_rows_map(t: pa.Table) -> pa.Table:
        u, v = _edge_cols(t)
        s = np.unique(u[u == v])
        return pa.table({"u": pa.array(s), "v": pa.array(s)},
                        schema=_EDGE_SCHEMA)

    self_rows = edges.map_batches(
        self_rows_map, batch_format="pyarrow"
    ).materialize()
    if self_rows.count() == 0:
        self_rows = None
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
    # star edges (child -> root) + (root -> root) self-labels, one
    # exchange keyed on the node for a unique (id, comp_id) row each
    def label_map(t: pa.Table) -> pa.Table:
        u, v = _edge_cols(t)
        ou, ov = _dedup_pairs(
            np.concatenate([u, v]), np.concatenate([v, v])
        )
        return pa.table({"u": ou, "v": ov}, schema=_EDGE_SCHEMA)

    if fp[0] == 0:  # no proper edges at all (e.g. self loops only)
        if self_rows is None:
            return rd.from_arrow(
                pa.table({"id": [], "comp_id": []}, schema=_LABEL_SCHEMA)
            )
        return hash_group_apply(self_rows, "u", _label_reduce,
                                map_fn=label_map)
    final = edges if self_rows is None else edges.union(self_rows)
    return hash_group_apply(final, "u", _label_reduce, map_fn=label_map)


# ---------------------------------------------------------------------------
# PageRank (Brin & Page 1998) — web-graph quality weighting


def _pr_tasks():
    global _PR_TASKS
    if _PR_TASKS is not None:
        return _PR_TASKS
    import ray

    @ray.remote
    def edge_shard_setup(s: int, n_shards: int, *blocks):
        """One src-hash shard of the edge list -> the per-iteration
        constants: unique srcs + degrees, per-edge src index, the
        dst-sorted view (dst runs pre-aggregate contributions before
        they cross the wire) and each dst run's target shard."""
        live = [b for b in blocks if b.num_columns and b.num_rows]
        if not live:
            z = np.empty(0, dtype=np.int64)
            return (z, np.empty(0, dtype=np.float64), z, z, z, z, None)
        t = pa.concat_tables(live).combine_chunks()
        u, v = _edge_cols(t)
        weighted = "w" in t.column_names
        if weighted:
            w = t["w"].combine_chunks().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if not np.all(np.isfinite(w)) or np.any(w <= 0):
                raise ValueError(
                    "pagerank: edge weights must be finite and > 0"
                )
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        if weighted:
            w = w[order]
        starts = run_starts(u)
        first = np.flatnonzero(starts)
        su = u[first]
        bounds = np.concatenate([first, [u.size]])
        if weighted:
            # per-src total outgoing weight
            wsum = np.add.reduceat(w, bounds[:-1])
        else:
            # uniform: wsum IS the degree; no per-edge array is built
            # or shipped (8 B/edge saved in long-lived shard state)
            wsum = np.diff(bounds).astype(np.float64)
        rep = np.cumsum(starts) - 1  # edge -> index into su/wsum
        by_dst = np.argsort(v, kind="stable")
        dst_sorted = v[by_dst]
        dfirst = np.flatnonzero(run_starts(dst_sorted))
        du = dst_sorted[dfirst]
        tsh = (_mix64(du.view(np.uint64)) % np.uint64(n_shards)).astype(
            np.int64
        )
        w_dst = w[by_dst] if weighted else None
        return (su, wsum, rep[by_dst], dfirst, du, tsh, w_dst)

    @ray.remote
    def node_shard_setup(s: int, edge_state, *endpoint_blocks):
        """Distinct nodes routed to shard s (sorted) + which of them
        have out-edges (exactly the shard's unique srcs — src rows
        hash to the same shard as the node domain)."""
        arrs = [
            b["node"].combine_chunks().to_numpy(zero_copy_only=False)
            for b in endpoint_blocks
            if b.num_columns and b.num_rows
        ]
        nodes = (
            np.unique(np.concatenate(arrs))
            if arrs
            else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        su = edge_state[0]
        pos = np.searchsorted(nodes, su)
        has_out = np.zeros(nodes.size, dtype=bool)
        has_out[pos] = True  # every src IS in this shard's node set
        return (nodes, has_out)

    @ray.remote
    def contrib(edge_state, node_state, rank_vals, n_shards: int):
        """rank * w/wsum contributions of this shard's edges,
        pre-summed per dst run, split by the dst's target shard."""
        su, wsum, rep_dst, dfirst, du, tsh, w_dst = edge_state
        nodes, _ = node_state
        if su.size == 0:
            return [
                (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
                for _ in range(n_shards)
            ]
        share = rank_vals[np.searchsorted(nodes, su)] / wsum
        c = share[rep_dst]  # per edge, in dst-sorted order
        if w_dst is not None:
            c = c * w_dst
        sums = np.add.reduceat(c, dfirst)
        return [(du[tsh == t], sums[tsh == t]) for t in range(n_shards)]

    @ray.remote
    def apply_rank(
        node_state,
        rank_vals,
        n_total: int,
        damping: float,
        dangling_mass: float,
        tele,
        *partials,
    ):
        """New rank for one node shard: teleport + damped (in-sums +
        dangling share). ``tele`` is None for the uniform model or
        this shard's slice of the normalized personalization vector —
        teleport AND dangling mass both follow it. Partials
        concatenate in a FIXED shard order and stable-sort by dst, so
        the float64 summation order — and the result — is
        bit-deterministic for a given n_shards."""
        nodes, has_out = node_state
        insum = np.zeros(nodes.size, dtype=np.float64)
        dus = [p[0] for p in partials if p[0].size]
        if dus:
            alld = np.concatenate(dus)
            allw = np.concatenate([p[1] for p in partials if p[0].size])
            order = np.argsort(alld, kind="stable")
            alld, allw = alld[order], allw[order]
            first = np.flatnonzero(run_starts(alld))
            sums = np.add.reduceat(allw, first)
            np.add.at(insum, np.searchsorted(nodes, alld[first]), sums)
        t = tele if tele is not None else 1.0 / n_total
        new = (1.0 - damping) * t + damping * (insum + dangling_mass * t)
        delta = float(np.abs(new - rank_vals).sum())
        dangling = float(new[~has_out].sum())
        return new, delta, dangling

    _PR_TASKS = (edge_shard_setup, node_shard_setup, contrib, apply_rank)
    return _PR_TASKS


_PR_TASKS = None


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float | None = 1e-9,
    n_shards: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    teleport: dict | None = None,
) -> rd.Dataset:
    """Distributed PageRank over an (src, dst) edge list -> Dataset
    (node, rank), ranks summing to 1 over every node incident to an
    edge. The standard damped model with uniform teleport and uniform
    dangling-mass redistribution:

        r' = (1-d)/N + d * (sum_in r/deg + D/N),  D = sum over
        out-degree-0 nodes of r

    — the web-crawl quality-weighting stage of training-data curation
    (rank CommonCrawl hosts/pages before sampling; public recipe).

    Distributed shape: edges hash-partition ONCE by src (the same
    mix64 routing as the node domain, so a shard's rank slice and its
    out-edges are CO-LOCATED — the rank/deg join is a shard-local
    searchsorted, no per-iteration join exchange). Each iteration is
    one contribution exchange: S contrib tasks pre-sum per dst run
    before anything crosses the wire, S apply tasks re-sum in a fixed
    order (bit-deterministic per n_shards). The driver holds only
    scalars (delta, dangling mass) and object refs; rank state lives
    sharded in the object store. Convergence = L1 delta <= tol;
    ``tol=None`` runs exactly ``max_iters`` fixed sweeps (the
    deterministic-depth mode the driver oracle replays), no
    convergence test or warning.

    Isolated nodes (never in the edge list) don't exist to PageRank;
    callers default them to (1-d)/N if needed.

    ``weight_col``: positive edge weights — contributions become
    rank * w / sum_out(w) (weighted PageRank; uniform weights reduce
    to the degree model bit-for-bit). ``teleport``: a node -> weight
    dict for PERSONALIZED PageRank: the teleport mass AND the
    dangling mass redistribute proportionally to it instead of
    uniformly (the random surfer restarts at the seed set). Seeds
    absent from the graph are ignored; the present seeds renormalize
    to 1 (all absent -> ValueError). The dict is a declared
    driver-sized object — seed sets are small; a corpus-sized
    personalization vector would ship as a Dataset instead."""
    import ray

    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0,1), got {damping}")
    if max_iters < 1:
        raise ValueError("pagerank: max_iters must be >= 1")
    if n_shards is not None and int(n_shards) < 1:
        raise ValueError(f"pagerank: n_shards must be >= 1, got {n_shards}")
    def _norm(t: pa.Table) -> pa.Table:
        cols = {
            "u": t[src_col].cast(pa.int64()),
            "v": t[dst_col].cast(pa.int64()),
        }
        if weight_col is not None:
            cols["w"] = t[weight_col].cast(pa.float64())
        return pa.table(cols)

    norm = edges.map_batches(_norm, batch_format="pyarrow").materialize()
    refs = []
    for b in norm.iter_internal_ref_bundles():
        for r, m in b.blocks:
            if m.num_rows is None or m.num_rows > 0:
                refs.append(r)
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
    )
    if not refs:
        return rd.from_arrow(empty)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    S = int(n_shards) if n_shards else min(16, max(4, ncpu))
    edge_setup, node_setup, contrib, apply_rank = _pr_tasks()

    # exchange 1: edges by hash(src); fused endpoint emission for the
    # node domain (same routing -> same shard holds a node's rank AND
    # its out-edges). One map task returns 2S values: S edge slices
    # then S node-domain tables.
    route = _pr_route_task()
    n_map = max(4, min(len(refs), 2 * ncpu))
    groups = [g for g in (refs[i::n_map] for i in range(n_map)) if g]
    outs = [route.options(num_returns=2 * S).remote(S, *g) for g in groups]

    edge_states = []
    node_states = []
    for s in range(S):
        est = edge_setup.remote(s, S, *[o[s] for o in outs])
        edge_states.append(est)
        node_states.append(
            node_setup.remote(s, est, *[o[S + s] for o in outs])
        )

    stats = ray.get([_pr_stats_task().remote(ns) for ns in node_states])
    sizes = [s[0] for s in stats]
    n_total = sum(sizes)
    if n_total == 0:
        return rd.from_arrow(empty)
    ranks = [
        ray.put(np.full(sz, 1.0 / n_total, dtype=np.float64)) for sz in sizes
    ]
    # initial dangling mass from the uniform vector
    dangling = float(sum(sz - ho for sz, ho in stats)) / n_total

    teles = [None] * S
    if teleport is not None:
        tref = ray.put(dict(teleport))
        tele_task = _pr_tele_task()
        pairs = ray.get([tele_task.remote(ns, tref) for ns in node_states])
        mass = float(sum(p[1] for p in pairs))
        if mass <= 0:
            raise ValueError(
                "pagerank: no teleport node is present in the graph"
            )
        teles = [ray.put(p[0] / mass) for p in pairs]

    for _ in range(max_iters):
        parts = [
            contrib.options(num_returns=S).remote(
                edge_states[s], node_states[s], ranks[s], S
            )
            for s in range(S)
        ]
        results = [
            apply_rank.options(num_returns=3).remote(
                node_states[t],
                ranks[t],
                n_total,
                damping,
                dangling,
                teles[t],
                *[parts[s][t] for s in range(S)],
            )
            for t in range(S)
        ]
        ranks = [r[0] for r in results]
        scalars = ray.get([r[1] for r in results] + [r[2] for r in results])
        delta = float(sum(scalars[:S]))
        dangling = float(sum(scalars[S:]))
        # tol=None: FIXED-SWEEP mode — run exactly max_iters power
        # iterations (the replayable/deterministic-depth contract the
        # driver oracle and fixed-budget curation passes use); no
        # convergence test, no non-convergence warning
        if tol is not None and delta <= tol:
            break
    else:
        # power iteration exhausting its budget is a legitimate stop
        # (fixed-sweep usage), but it must not be SILENT — callers
        # sampling a training mixture by rank need to know the ranks
        # are unconverged (connected_components raises in the
        # analogous state; ranks are still well-defined here, so a
        # loud warning is the proportionate contract). In tol=None
        # fixed-sweep mode exhausting the budget IS the contract —
        # no warning.
        if tol is not None:
            import warnings

            warnings.warn(
                f"pagerank: not converged after max_iters={max_iters} "
                f"(final L1 delta {delta:.3e} > tol {tol:.1e}); returning "
                "the last iterate",
                stacklevel=2,
            )

    @ray.remote
    def emit(node_state, rank_vals) -> pa.Table:
        nodes, _ = node_state
        return pa.table({"node": pa.array(nodes), "rank": pa.array(rank_vals)})

    return rd.from_arrow_refs(
        [emit.remote(node_states[s], ranks[s]) for s in range(S)]
    )


_PR_STATS = None


def _pr_stats_task():
    global _PR_STATS
    if _PR_STATS is None:
        import ray

        @ray.remote
        def shard_stats(node_state) -> tuple[int, int]:
            return int(node_state[0].size), int(node_state[1].sum())

        _PR_STATS = shard_stats
    return _PR_STATS


_PR_ROUTE = None


def _pr_route_task():
    global _PR_ROUTE
    if _PR_ROUTE is None:
        import ray

        @ray.remote
        def route(n_shards: int, *blocks):
            live = [b for b in blocks if b.num_columns and b.num_rows]
            if not live:
                e = pa.table({"u": [], "v": []}, schema=_EDGE_SCHEMA)
                n = pa.table({"node": pa.array([], pa.int64())})
                return tuple([e] * n_shards + [n] * n_shards)
            t = pa.concat_tables(live).combine_chunks()
            u, v = _edge_cols(t)
            pid = (_mix64(u.view(np.uint64)) % np.uint64(n_shards)).astype(
                np.int64
            )
            order = np.argsort(pid, kind="stable")
            t = t.take(order)
            bounds = np.searchsorted(pid[order], np.arange(n_shards + 1))
            ends = np.unique(np.concatenate([u, v]))
            npid = (_mix64(ends.view(np.uint64)) % np.uint64(n_shards)).astype(
                np.int64
            )
            norder = np.argsort(npid, kind="stable")
            ends_s = ends[norder]
            nbounds = np.searchsorted(npid[norder], np.arange(n_shards + 1))
            eparts = [
                t.slice(int(s), int(e - s))
                for s, e in zip(bounds[:-1], bounds[1:])
            ]
            nparts = [
                pa.table({"node": pa.array(ends_s[int(ns):int(ne)])})
                for ns, ne in zip(nbounds[:-1], nbounds[1:])
            ]
            return tuple(eparts + nparts)

        _PR_ROUTE = route
    return _PR_ROUTE


_PR_TELE = None


def _pr_tele_task():
    global _PR_TELE
    if _PR_TELE is None:
        import ray

        @ray.remote
        def tele_slice(node_state, tdict) -> tuple[np.ndarray, float]:
            """This shard's raw personalization weights (0 for nodes
            outside the seed dict) + their mass, for driver-side
            normalization across shards."""
            nodes, _ = node_state
            t = np.zeros(nodes.size, dtype=np.float64)
            for node, w in tdict.items():
                if w < 0:
                    raise ValueError(
                        "pagerank: teleport weights must be >= 0"
                    )
                i = int(np.searchsorted(nodes, int(node)))
                if i < nodes.size and nodes[i] == int(node):
                    t[i] = float(w)
            return t, float(t.sum())

        _PR_TELE = tele_slice
    return _PR_TELE
