"""Distributed k-means (Lloyd's) over an embedding column.

Reference semantics: /root/reference/src/models/PISA.py:91-134 —
iterative assign/update with empty-cluster reinitialization. Re-expressed
Ray-Data-first:

* each iteration is ONE ``map_batches`` pass emitting per-batch PARTIAL
  per-cluster (sum, count) rows (the combiner pattern — the shuffle
  carries k×dim floats per block, never the points);
* the k×dim reduce happens on the driver (tiny), new centroids are
  re-broadcast via ``ray.put``;
* empty clusters reinitialize DETERMINISTICALLY to the globally
  farthest-from-its-centroid point (ties by smallest id) — the
  reference reinitializes to a random item embedding
  (PISA.py:105); farthest-point is its deterministic analog, so
  results are reproducible at any parallelism;
* init is coordination-free and deterministic: the k points with the
  smallest ``splitmix64(seed ^ id)`` mix (a seeded uniform draw that
  needs no global sort or shuffle — only a k-row top-k reduce).

Scale notes: per-iteration cost is one streaming pass; driver state is
k×dim + num_blocks×k×dim partials. Float summation order across blocks
is not fixed, so centroids are deterministic to ~1e-12 rather than
bit-identical across parallelism levels; assignments are stable unless
a point sits within that noise of two centroids (tested at two
parallelism levels on a seeded fixture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..docids import splitmix64


# single shared copy — similarity.py owns the list-column -> float64
# matrix helper (dedup.py imports it from there too)
from .similarity import _as_matrix  # noqa: E402


def _init_centroids(
    emb: rd.Dataset, k: int, seed: int, id_col: str, vec_col: str
) -> np.ndarray:
    """k seed points chosen by smallest splitmix64(seed ^ id) — a
    deterministic uniform draw computable with a per-batch top-k and a
    tiny merge (no global sort)."""

    def local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        kk = min(k, ids.size)
        sel = np.argsort(key, kind="stable")[:kk]
        m = _as_matrix(batch[vec_col])[sel]
        return pa.table(
            {
                "key": pa.array(key[sel].astype(np.uint64)),
                id_col: pa.array(ids[sel]),
                "vec": pa.array(list(m), type=pa.large_list(pa.float64())),
            }
        )

    cand = emb.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["key", id_col], kind="mergesort").head(k)
    return np.asarray([np.asarray(v, dtype=np.float64) for v in cand["vec"]])


def kmeans(
    emb: rd.Dataset,
    k: int,
    n_iter: int = 25,
    tol: float = 1e-9,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, rd.Dataset]:
    """Returns (centroids (k, dim) ndarray, assignments Dataset with
    columns (id_col, cluster:int64, dist:float64))."""
    emb = emb.materialize()  # consumed once per iteration + final pass
    C = _init_centroids(emb, k, seed, id_col, vec_col)
    k = C.shape[0]  # corpus smaller than requested k shrinks it

    for _ in range(n_iter):
        cent_ref = ray.put(C)

        def partial(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
            cc = ray.get(cent_ref)
            x = _as_matrix(batch[vec_col])
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            # squared euclidean via the expansion; argmin ties -> lower
            # cluster id (np.argmin first-max rule), same as the oracle
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ cc.T)
                + (cc * cc).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            dist = d2[np.arange(x.shape[0]), a]
            sums = np.zeros((cc.shape[0], x.shape[1]), dtype=np.float64)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=cc.shape[0]).astype(np.int64)
            # farthest-point candidates for empty-cluster reinit: one
            # per batch is enough (driver keeps the global argmax)
            far = np.lexsort((ids, -dist))[: min(cc.shape[0], ids.size)]
            return pa.table(
                {
                    "sums": pa.array([sums.reshape(-1)], type=pa.large_list(pa.float64())),
                    "counts": pa.array([counts], type=pa.large_list(pa.int64())),
                    "far_ids": pa.array([ids[far]], type=pa.large_list(pa.int64())),
                    "far_dist": pa.array([dist[far]], type=pa.large_list(pa.float64())),
                    "far_vecs": pa.array(
                        [x[far].reshape(-1)], type=pa.large_list(pa.float64())
                    ),
                }
            )

        parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
        dim = C.shape[1]
        # vectorized partial fold: stack the per-block (k*dim) rows and
        # reduce with ONE numpy sum — no per-row Python arithmetic.
        # Each partial is one row per input BLOCK, so the driver holds
        # O(num_blocks * k * dim) floats transiently; at extreme block
        # counts, fold through a tiny constant-key groupby first.
        sums = (
            np.vstack([np.asarray(s, dtype=np.float64) for s in parts["sums"]])
            .sum(axis=0)
            .reshape(k, dim)
        )
        counts = np.vstack(
            [np.asarray(c, dtype=np.int64) for c in parts["counts"]]
        ).sum(axis=0)
        far_ids = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in parts["far_ids"]]
        )
        far_dist = np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in parts["far_dist"]]
        )
        far_vecs = np.vstack(
            [
                np.asarray(x, dtype=np.float64).reshape(-1, dim)
                for x in parts["far_vecs"]
            ]
        )
        far_order = np.lexsort((far_ids, -far_dist))  # dist desc, id asc

        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        # deterministic empty-cluster reinit (reference: random item,
        # PISA.py:105) — farthest points, one per empty cluster
        empty = np.flatnonzero(~nz)
        take = min(empty.size, far_order.size)
        if take:
            newC[empty[:take]] = far_vecs[far_order[:take]]
        shift = float(np.max(np.abs(newC - C))) if k else 0.0
        C = newC
        if shift <= tol:
            break

    cent_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        x = _as_matrix(batch[vec_col])
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cc.T)
            + (cc * cc).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(np.sqrt(np.maximum(d2[np.arange(x.shape[0]), a], 0.0))),
            }
        )

    return C, emb.map_batches(assign, batch_format="pyarrow")


def jsd_softmax_weights(
    prev: rd.Dataset,
    cur: rd.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    temp: float = 1.0,
    n_parts: int = 64,
) -> rd.Dataset:
    """Two-sided lookup + elementwise kernel (SURVEY T6; reference
    /root/reference/src/models/PISA.py:137-161): per id, the
    Jensen-Shannon divergence between the softmax cluster-assignment
    distributions of its PREV and CURRENT embeddings, then globally
    mean-centered and squashed with a sigmoid into a (0,1) weight.

    Ray shape: each side is one vectorized ``map_batches`` computing
    softmax(-dist²/temp) against the broadcast centroids; the two-sided
    join is a tagged union hash-partitioned on the id (``n_parts``
    groups), with the per-partition pairing fully vectorized (sort +
    searchsorted inside the group — never a per-id group). Ids present
    on only one side are dropped (reference: ``torch.isin`` semi-join,
    PISA.py:184-186). Returns (id, jsd, weight)."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def make_dists(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cc = ray.get(cent_ref)
            x = _as_matrix(batch[vec_col])
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ cc.T)
                + (cc * cc).sum(axis=1)[None, :]
            )
            z = -d2 / temp
            z -= z.max(axis=1, keepdims=True)
            p = np.exp(z)
            p /= p.sum(axis=1, keepdims=True)
            part = (splitmix64(ids.astype(np.uint64)) % np.uint64(n_parts)).astype(
                np.int64
            )
            return pa.table(
                {
                    "part": pa.array(part),
                    id_col: pa.array(ids),
                    "side": pa.array(np.full(ids.size, side, dtype=np.int32)),
                    "p": pa.array(list(p), type=pa.large_list(pa.float64())),
                }
            )

        return fn

    u = prev.map_batches(make_dists(0), batch_format="pyarrow").union(
        cur.map_batches(make_dists(1), batch_format="pyarrow")
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0].sort_values(id_col, kind="mergesort")
        b = g[g["side"] == 1].sort_values(id_col, kind="mergesort")
        ia = a[id_col].to_numpy()
        ib = b[id_col].to_numpy()
        from ..shuffle import sorted_lookup

        ok, pos = sorted_lookup(ia, ib)
        if not ok.any():
            return pd.DataFrame({id_col: [], "jsd": []}).astype(
                {id_col: "int64", "jsd": "float64"}
            )
        P = np.stack([np.asarray(v, dtype=np.float64) for v in a["p"]])[pos[ok]]
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in b["p"].iloc[np.flatnonzero(ok)]])
        M = 0.5 * (P + Q)
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_pm = np.where(P > 0, P * np.log(P / M), 0.0).sum(axis=1)
            kl_qm = np.where(Q > 0, Q * np.log(Q / M), 0.0).sum(axis=1)
        return pd.DataFrame(
            {id_col: ib[ok].astype("int64"), "jsd": 0.5 * (kl_pm + kl_qm)}
        )

    j = u.groupby("part").map_groups(per_part, batch_format="pandas").materialize()
    mean_jsd = float(j.mean("jsd") or 0.0)

    def weight(batch: pa.Table) -> pa.Table:
        v = batch["jsd"].to_numpy(zero_copy_only=False)
        w = 1.0 / (1.0 + np.exp(-(v - mean_jsd)))
        return batch.append_column("weight", pa.array(w))

    return j.map_batches(weight, batch_format="pyarrow")


def kmeans_oracle(
    X: np.ndarray, ids: np.ndarray, k: int, n_iter: int = 25, tol: float = 1e-9,
    seed: int = 17,
) -> tuple[np.ndarray, np.ndarray]:
    """Single-process numpy Lloyd's with the SAME init and reinit rules
    (the golden the distributed path is tested against)."""
    ids = np.asarray(ids, dtype=np.int64)
    key = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    order = np.lexsort((ids, key))
    C = X[order[:k]].astype(np.float64).copy()
    k = C.shape[0]
    for _ in range(n_iter):
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        dist = d2[np.arange(X.shape[0]), a]
        newC = C.copy()
        far_order = np.lexsort((ids, -dist))
        fi = 0
        for c in range(k):
            m = a == c
            if m.any():
                newC[c] = X[m].mean(axis=0)
            else:
                newC[c] = X[far_order[fi]]
                fi += 1
        shift = float(np.max(np.abs(newC - C)))
        C = newC
        if shift <= tol:
            break
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return C, np.argmin(d2, axis=1)
