"""Grouped window functions: lag/lead, row_number, running sum and
trailing RANGE-frame rolling aggregates, per key, ordered by a column.

The reference walks per-user interaction histories in Python to build
"previous item" / running-count features (e.g. the per-user sequence
scans in /root/reference/src/Dataset.py); at scale that is a window
function: partition by user, order by time, shift/accumulate. This
module expresses it Ray-first — ONE hash exchange co-locates each
key's rows, then a single vectorized pass per reducer shard computes
every requested window column (pandas groupby shift/cumsum/cumcount
are C kernels; the trailing time-window frame is a banded
searchsorted, no per-group Python loop on the int/timestamp path).

Semantics match ANSI SQL window functions with frame
``PARTITION BY key ORDER BY order``:

- ``("lag", col, n)`` / ``("lead", col, n)`` — value n rows
  before/after within the group, null when it falls outside.
- ``("row_number",)`` — 1-based position within the group.
- ``("cumsum", col)`` — ``SUM(col) OVER (... ROWS UNBOUNDED
  PRECEDING)``.
- ``("rolling_sum", col, w)`` / ``("rolling_mean", col, w)`` /
  ``("rolling_count", w)`` — ``RANGE BETWEEN w PRECEDING AND CURRENT
  ROW``: every row whose order value lies in ``[t_i - w, t_i]``,
  INCLUDING later peers with the same order value (exact SQL RANGE
  peer semantics, which pandas ``groupby().rolling`` does not give).

Ties in ``order_col`` make lag/lead/row_number/cumsum order-dependent
exactly as in SQL (the engine breaks ties by stable input order within
a reducer shard — deterministic for a fixed block layout, unspecified
across layouts, same as an unqualified SQL ORDER BY).

Scale shape (100 TB): one exchange, each row crosses once; reducer
work is O(rows log rows) for the sort plus O(rows) per window column.
A single hot key's rows land on one reducer — windows are inherently
per-key-sequential, so salt upstream (e.g. split by coarse time range
and stitch the first w of each bucket) only if one key exceeds a
worker's heap.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_ROLLING = ("rolling_sum", "rolling_mean", "rolling_count")
_KINDS = ("lag", "lead", "row_number", "cumsum") + _ROLLING


def _order_i64(s: pd.Series) -> np.ndarray:
    """Order column as a numeric array for frame arithmetic:
    timestamps become int64 epoch-nanoseconds (window widths are then
    in ns), integers pass through, floats stay float64."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.to_numpy(dtype="datetime64[ns]").view(np.int64)
    return s.to_numpy()


def _trailing_bounds(t: np.ndarray, starts: np.ndarray, w) -> tuple:
    """(lo, hi) inclusive frame bounds per row for the trailing RANGE
    window, where ``t`` is sorted ascending within each group and
    ``starts`` marks group firsts.

    Int path: band each group's re-based order values into disjoint
    non-overlapping ranges so ONE global searchsorted resolves every
    group at once; falls back to a per-group loop when the band
    arithmetic would overflow int64 or the order column is float.
    """
    n = t.size
    gid = np.cumsum(starts) - 1
    g_first = np.flatnonzero(starts)
    t0 = t - np.repeat(t[g_first], np.diff(np.append(g_first, n)))
    if np.issubdtype(t.dtype, np.integer):
        w = int(w)
        max_range = int(t0.max()) if n else 0
        band_w = max_range + w + 2
        n_groups = int(gid[-1]) + 1 if n else 0
        if n_groups * band_w < np.iinfo(np.int64).max // 2:
            tb = gid * band_w + t0
            lo = np.searchsorted(tb, tb - w, side="left")
            hi = np.searchsorted(tb, tb, side="right") - 1
            return lo, hi
    # float order values (or overflow): per-group searchsorted, still
    # vectorized within each group
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    bounds = np.append(g_first, n)
    for a, b in zip(bounds[:-1], bounds[1:]):
        seg = t[a:b]
        lo[a:b] = a + np.searchsorted(seg, seg - w, side="left")
        hi[a:b] = a + np.searchsorted(seg, seg, side="right") - 1
    return lo, hi


def _validate_specs(specs: Mapping[str, Sequence]) -> None:
    for out, spec in specs.items():
        kind = spec[0]
        if kind not in _KINDS:
            raise ValueError(f"{out}: unknown window kind {kind!r}")
        if kind in ("lag", "lead") and (len(spec) != 3 or int(spec[2]) < 1):
            raise ValueError(f"{out}: expected ({kind!r}, col, n>=1)")
        if kind == "row_number" and len(spec) != 1:
            raise ValueError(f"{out}: expected ('row_number',)")
        if kind == "cumsum" and len(spec) != 2:
            raise ValueError(f"{out}: expected ('cumsum', col)")
        if kind == "rolling_count" and len(spec) != 2:
            raise ValueError(f"{out}: expected ('rolling_count', w)")
        if kind in ("rolling_sum", "rolling_mean") and len(spec) != 3:
            raise ValueError(f"{out}: expected ({kind!r}, col, w)")


def grouped_window(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    specs: Mapping[str, Sequence],
) -> rd.Dataset:
    """Append window-function columns; see module docstring for the
    spec grammar. Key and order values must be non-null (raises —
    SQL's NULL-ordering knobs are not replicated); summed columns must
    be non-null numeric.
    """
    from ..shuffle import exchange_routable, hash_group_apply, run_starts

    _validate_specs(dict(specs))
    value_cols = sorted(
        {spec[1] for spec in specs.values() if spec[0] in ("cumsum", "rolling_sum", "rolling_mean")}
    )

    def window_shard(t: pa.Table) -> pa.Table:
        for c in (key_col, order_col):
            if t.num_rows and t[c].null_count:
                raise ValueError(f"{c!r} contains nulls; window frames are undefined")
        g = t.to_pandas()
        if t.num_rows == 0:
            # empty shards must emit the SAME dtypes populated shards
            # produce, or the output blocks' schemas conflict: lag/lead
            # of an integer column is float64 (shift introduces NaN),
            # of any other column its own dtype (string stays string)
            for out, spec in specs.items():
                if spec[0] in ("row_number", "rolling_count"):
                    dt = "int64"
                elif spec[0] in ("lag", "lead"):
                    src = g[spec[1]]
                    dt = (
                        "float64"
                        if pd.api.types.is_integer_dtype(src)
                        else src.dtype
                    )
                else:
                    dt = "float64"
                g[out] = pd.Series([], dtype=dt)
            return pa.Table.from_pandas(g, preserve_index=False)
        for c in value_cols:
            if g[c].isna().any():
                raise ValueError(f"{c!r} contains nulls; sums would be ambiguous")
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        gb = g.groupby(key_col, sort=False)
        rolling = {o: s for o, s in specs.items() if s[0] in _ROLLING}
        lo = hi = cum = None
        if rolling:
            keys = g[key_col].to_numpy()
            starts = run_starts(keys)
            tvals = _order_i64(g[order_col])
            widths = {s[-1] for s in rolling.values()}
            bounds = {w: _trailing_bounds(tvals, starts, w) for w in widths}
            cum = {
                c: np.cumsum(g[c].to_numpy(dtype=np.float64)) for c in value_cols
            }
        for out, spec in specs.items():
            kind = spec[0]
            if kind == "lag":
                g[out] = gb[spec[1]].shift(int(spec[2]))
            elif kind == "lead":
                g[out] = gb[spec[1]].shift(-int(spec[2]))
            elif kind == "row_number":
                g[out] = (gb.cumcount() + 1).astype(np.int64)
            elif kind == "cumsum":
                g[out] = gb[spec[1]].cumsum().astype(np.float64)
            else:
                lo, hi = bounds[spec[-1]]
                cnt = hi - lo + 1
                if kind == "rolling_count":
                    g[out] = cnt.astype(np.int64)
                else:
                    s = cum[spec[1]]
                    v = g[spec[1]].to_numpy(dtype=np.float64)
                    wsum = s[hi] - s[lo] + v[lo]
                    g[out] = wsum if kind == "rolling_sum" else wsum / cnt
        return pa.Table.from_pandas(g, preserve_index=False)

    if not exchange_routable(ds, key_col):
        # float keys: map_groups fallback (exact, slower dispatch)
        def per_group(gr: pd.DataFrame) -> pd.DataFrame:
            return window_shard(pa.Table.from_pandas(gr, preserve_index=False)).to_pandas()

        return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")
    return hash_group_apply(ds, key_col, window_shard)
