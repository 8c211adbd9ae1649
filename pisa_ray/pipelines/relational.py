"""Relational operators — the reference's data-processing surface
re-expressed Ray-Data-first (SURVEY.md §2.2-§2.7).

Every helper takes/returns ``ray.data.Dataset`` and streams; small
sides are broadcast via ``ray.put`` (never shuffled); wide steps are
explicit ``groupby``s.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def broadcast_inner_join(
    big: rd.Dataset, small: pd.DataFrame, on: str | list[str]
) -> rd.Dataset:
    """Map-side join: the small table rides the object store once
    (``ray.put``) and each batch merges against it — no shuffle.
    Reference analog: dict lookups against broadcast state
    (/root/reference/src/models/PISA.py:262-275)."""
    ref = ray.put(small)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        return batch.merge(sm, on=on, how="inner")

    return big.map_batches(fn, batch_format="pandas")


def broadcast_semi_join(big: rd.Dataset, keys, col: str) -> rd.Dataset:
    """Keep rows whose ``col`` is in the broadcast key set
    (reference: ``torch.isin`` membership at
    /root/reference/src/models/PISA.py:184-186)."""
    ref = ray.put(pa.array(sorted(set(keys))))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(pc.is_in(batch[col], value_set=ks))

    return big.map_batches(fn, batch_format="pyarrow")


def broadcast_anti_join(big: rd.Dataset, keys, col: str) -> rd.Dataset:
    """Drop rows whose ``col`` is in the broadcast key set
    (reference: -inf exclusion mask at
    /root/reference/src/Inference.py:233-238)."""
    ref = ray.put(pa.array(sorted(set(keys))))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(pc.invert(pc.is_in(batch[col], value_set=ks)))

    return big.map_batches(fn, batch_format="pyarrow")


def per_group_topk(
    ds: rd.Dataset,
    group_col: str,
    sort_cols: Sequence[str],
    ascending: Sequence[bool],
    k: int,
    rank_col: str = "rank",
) -> rd.Dataset:
    """Per-group top-k with explicit tie-break columns
    (reference: per-user ``torch.topk`` at
    /root/reference/src/Inference.py:240)."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(sort_cols), ascending=list(ascending), kind="mergesort")
        g = g.head(k).copy()
        g[rank_col] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby(group_col).map_groups(topk, batch_format="pandas")


def snapshot_boundaries(n_rows: int, train_ratio: float, n_snapshots: int) -> list[int]:
    """The reference's size-based snapshot boundary rule, verbatim
    semantics (/root/reference/src/helpers/Reader.py:81-92):
    ``n_train = int(n*ratio)``; the remainder splits evenly, leftover
    rows fold into the last snapshot."""
    n_train = int(n_rows * train_ratio)
    incre = (n_rows - n_train) // n_snapshots
    bounds = [n_train + i * incre for i in range(n_snapshots)]
    bounds.append(n_rows)
    return bounds


def snapshot_blocks(
    ds: rd.Dataset, order_cols: Sequence[str], train_ratio: float, n_snapshots: int
) -> list[rd.Dataset]:
    """Materialize the reference's hist/incre window slices as
    Datasets: globally sort by the time columns, then
    ``split_at_indices`` at the size-based boundaries — the Ray-Data
    analog of the positional row-range slicing at
    /root/reference/src/helpers/Reader.py:148-178. Returns
    ``n_snapshots + 1`` datasets: [train, incre_0, ..., incre_{n-1}]."""
    n = ds.count()
    bounds = snapshot_boundaries(n, train_ratio, n_snapshots)
    s = ds.sort(list(order_cols))
    return s.split_at_indices(bounds[:-1])


def tumbling_window_agg(
    ds: rd.Dataset,
    ts_col: str,
    key_col: str,
    value_col: str,
    window: str = "hour",
) -> rd.Dataset:
    """Count-and-sum per (key, tumbling time window). Streaming-shaped
    semantics on a batch engine: the window id is a per-row pure
    function of event time, so this is one groupby — no watermarks
    needed (the reference simulates streams the same way, with static
    block slicing)."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=window)
        return batch.append_column("window", w)

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window", key_col])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def sessionize(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("ts", "event_id"),
    gap_seconds: int = 1800,
) -> rd.Dataset:
    """Session windows: per key, a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Batch-engine shape of
    the streaming semantic (the reference simulates streams with static
    slicing the same way, /root/reference/src/helpers/Reader.py:148-178):
    one groupby(key), sessions derived inside the sorted group.

    Returns one row per session: (key, session_id, session_start,
    n_events) with session_id numbered 1.. per key in time order.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(float("inf"))
        sess = (gap > gap_seconds).cumsum()
        out = g.groupby(sess).agg(
            session_start=(ts_col, "first"), n_events=(ts_col, "size")
        )
        out = out.reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_id", np.arange(1, len(out) + 1, dtype=np.int64))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
