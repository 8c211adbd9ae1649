"""Reference-repo evaluation semantics as Ray Data operators.

The reference (hsyoo32/pisa) evaluates a recommender by: building
per-user clicked sets (groupby-unique,
/root/reference/src/helpers/Reader.py:188), scoring every user against
all items (/root/reference/src/Inference.py:227-231), masking
train-seen items to -inf (exclusion, /root/reference/src/Inference.py:233-238),
taking per-user top-k (/root/reference/src/Inference.py:240), and
computing Recall/NDCG/MRR/Precision@K
(/root/reference/src/Inference.py:8-71). This module re-expresses each
as a streaming Ray op; a pandas oracle in the tests pins the semantics.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def clicked_sets(
    ds: rd.Dataset,
    user_col: str = "user_id",
    item_col: str = "item_id",
    order_col: str | None = None,
) -> rd.Dataset:
    """Per-user distinct item lists (the reference's inverted lists).

    The reference's ``.unique()`` keeps first-occurrence order of the
    time-sorted log — but a distributed shuffle doesn't preserve row
    order, so the ordering column must be named explicitly
    (``order_col``); without it, items come out sorted."""

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            g = g.sort_values(order_col, kind="mergesort")
            items = pd.unique(g[item_col]).tolist()
        else:
            items = sorted(pd.unique(g[item_col]).tolist())
        return pd.DataFrame({user_col: [g[user_col].iloc[0]], "items": [items]})

    from ..shuffle import exchange_routable, hash_group_apply, run_starts

    if not exchange_routable(ds, user_col):
        return ds.groupby(user_col).map_groups(uniq, batch_format="pandas")

    def uniq_shard(t: pa.Table) -> pa.Table:
        # whole-shard reducer: one sort + drop_duplicates picks every
        # user's first-occurrence (or sorted) distinct item rows, then
        # the per-user lists are zero-copy ListArray offsets over an
        # Arrow take (keeps the original item/user types exactly)
        sort_by = (
            [user_col, order_col] if order_col is not None else [user_col, item_col]
        )
        g = t.select(list(dict.fromkeys([user_col, item_col, *sort_by]))).to_pandas()
        g["__i"] = np.arange(len(g), dtype=np.int64)
        g = g.sort_values(sort_by, kind="mergesort")
        g = g.drop_duplicates([user_col, item_col], keep="first")
        kept = g["__i"].to_numpy()
        users_np = g[user_col].to_numpy()
        starts = run_starts(users_np)
        first_idx = np.flatnonzero(starts)
        offsets = np.append(first_idx, len(g)).astype(np.int64)
        items = pa.LargeListArray.from_arrays(
            pa.array(offsets),
            t[item_col].take(pa.array(kept)).combine_chunks(),
        )
        return pa.table(
            {
                user_col: t[user_col].take(pa.array(kept[starts])),
                "items": items,
            }
        )

    return hash_group_apply(ds, user_col, uniq_shard)


def topk_excluding(
    users: Sequence[int],
    n_items: int,
    score_fn: Callable[[np.ndarray], np.ndarray],
    clicked: dict[int, np.ndarray],
    k: int = 100,
    batch_size: int = 1024,
) -> rd.Dataset:
    """Score users against ALL items, mask already-clicked to -inf,
    take per-user top-k (ties by item index order, like torch.topk).

    ``score_fn(user_batch) -> (len(batch), n_items) float32`` plays the
    model's role; ``clicked`` is broadcast via ``ray.put`` exactly as
    the reference holds ``user_clicked_set`` in every worker."""
    clicked_ref = ray.put(clicked)

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        cl = ray.get(clicked_ref)
        u = batch["user_id"].to_numpy()
        scores = np.asarray(score_fn(u), dtype=np.float32)
        for i, uid in enumerate(u):
            seen = cl.get(int(uid))
            if seen is not None and len(seen):
                scores[i, np.asarray(seen, dtype=np.int64)] = -np.inf
        kk = min(k, n_items)
        # torch.topk's lower-index-first tie order INCLUDING selection
        # at the k boundary (bare argpartition picks boundary ties
        # arbitrarily — caught by the topn_accuracy DuckDB replay when
        # equal popularity scores straddled rank k). Linear select:
        # argpartition finds the kth value, the candidate set extends
        # to ALL items tied at it, then one small lexsort orders the
        # candidates — O(n_items) per user unless the boundary tie
        # class itself is huge (degenerates to the full sort cost,
        # which is also the correct output cost in that case).
        rows = []
        for i, uid in enumerate(u):
            s = scores[i]
            if kk < n_items:
                part = np.argpartition(-s, kk - 1)[:kk]
                kth = s[part].min()
                cand = np.flatnonzero(s >= kth)
            else:
                cand = np.arange(n_items, dtype=np.int64)
            order = np.lexsort((cand, -s[cand]))[:kk]
            items = cand[order]
            rows.append((int(uid), items.tolist(), s[items].tolist()))
        return pd.DataFrame(rows, columns=["user_id", "items", "scores"])

    return rd.from_items([{"user_id": int(u)} for u in users]).map_batches(
        score_batch, batch_format="pandas", batch_size=batch_size
    )


def topn_accuracy(
    topk_df: pd.DataFrame,
    positives: dict[int, set[int]],
    ks: Sequence[int] = (10, 20, 50, 100),
) -> dict[str, float]:
    """Recall/NDCG/MRR/Precision@K averaged over users with positives —
    formula-identical to /root/reference/src/Inference.py:8-71."""
    sums = {f"{m}@{k}": 0.0 for k in ks for m in ("Recall", "NDCG", "MRR", "Precision")}
    n_users = 0
    for _, row in topk_df.iterrows():
        pos = positives.get(int(row["user_id"]))
        if not pos:
            continue
        n_users += 1
        ranked = list(row["items"])
        hits = [1.0 if it in pos else 0.0 for it in ranked]
        # MRR over the full ranked list (reference: first hit anywhere)
        first = next((i for i, h in enumerate(hits) if h), None)
        for k in ks:
            hk = hits[:k]
            n_hit = sum(hk)
            sums[f"Recall@{k}"] += n_hit / len(pos)
            sums[f"Precision@{k}"] += n_hit / k
            if first is not None and first < k:
                sums[f"MRR@{k}"] += 1.0 / (first + 1)
            dcg = sum(h / np.log2(i + 2) for i, h in enumerate(hk))
            idcg = sum(1.0 / np.log2(i + 2) for i in range(min(len(pos), k)))
            sums[f"NDCG@{k}"] += dcg / idcg if idcg > 0 else 0.0
    if n_users == 0:
        return {m: 0.0 for m in sums}
    return {m: round(v / n_users, 6) for m, v in sums.items()}
