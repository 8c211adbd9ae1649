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


_NULLABLE_PD = {
    pa.int8(): "Int8", pa.int16(): "Int16", pa.int32(): "Int32",
    pa.int64(): "Int64", pa.uint8(): "UInt8", pa.uint16(): "UInt16",
    pa.uint32(): "UInt32", pa.uint64(): "UInt64",
}


def _exact_pandas(t: pa.Table) -> pd.DataFrame:
    """``to_pandas`` that keeps integer columns EXACT: pandas' default
    conversion upcasts any null-holding int column to float64, which
    silently rounds values beyond 2^53 (review finding — snowflake-
    scale ids corrupted through every pandas-reducer round trip).
    Nullable pandas extension dtypes hold int64 + nulls losslessly and
    convert back to plain Arrow ints; sorts, groupbys and merge_asof
    (keys AND values — verified) all accept them."""
    return t.to_pandas(
        types_mapper=lambda typ: pd.api.types.pandas_dtype(
            _NULLABLE_PD[typ]
        )
        if typ in _NULLABLE_PD
        else None
    )


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


_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "full": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    hot_keys: Sequence | None = None,
    bloom_expected: int | None = None,
    bloom_fp_rate: float = 0.01,
) -> rd.Dataset:
    """Large x large distributed join — both sides hash-partitioned by
    key, each partition joined independently (Ray Data's native
    hash-shuffle ``Dataset.join``; this wrapper adds partition sizing
    and a skew escape hatch). Use this when NEITHER side fits a
    broadcast; for a small side keep :func:`broadcast_inner_join` /
    :func:`broadcast_semi_join` — one ``ray.put``, no shuffle.

    ``how``: inner | left | right | full | semi | anti (semi/anti keep
    left rows with/without a right match, left columns only). The
    right key column is dropped from the output (it equals ``on`` on
    every surviving row); remaining name collisions are the caller's
    to resolve by renaming beforehand.

    Scale shape (100 TB): each row crosses the exchange exactly once;
    ``num_partitions`` defaults to ~64 MB of combined input per
    partition capped at 2x the cluster's cores, so partitions stay
    spillable. Prune both sides to the join keys + needed value
    columns BEFORE calling — the shuffle ships every selected byte.

    Skew: one key's rows on BOTH sides land in one partition; a hot
    key with a large match cardinality concentrates there. For inner
    joins pass ``hot_keys`` (the known heavy keys, e.g. from a
    sampled count): their right-side rows are collected once and
    broadcast-joined map-side against the left (no shuffle for the
    hot rows), the remaining keys take the hash exchange, and the two
    streams union. Results are row-order-independent, values exact.

    ``bloom_expected`` (inner/semi only): build a Bloom filter of the
    right side's keys (sized for that many distinct values at
    ``bloom_fp_rate``) and drop definitely-unmatched LEFT rows
    map-side BEFORE the exchange — results identical (the join
    discards false positives), only shuffle bytes change. Worth it
    when the left side is much wider than its match rate; pointless
    when both sides are match-dense. The right side is materialized
    once so the bloom pass and the join don't recompute it.

    Reference analog: the reference holds every interaction table in
    one process and joins via dict lookups (e.g. building per-user
    positives, /root/reference/src/Dataset.py); at 100 TB that becomes
    this hash exchange.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}, got {how!r}")
    rkey = right_on or on
    if bloom_expected is not None:
        if how not in ("inner", "semi"):
            raise ValueError("bloom_expected only preserves inner/semi results")
        from .bloom import bloom_prefilter, build_bloom

        right = right.materialize()
        bloom = build_bloom(right, rkey, bloom_expected, bloom_fp_rate)
        left = bloom_prefilter(left, on, bloom)
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        try:
            nbytes = (left.size_bytes() or 0) + (right.size_bytes() or 0)
        except Exception:
            nbytes = 0
        num_partitions = int(
            min(max(4, 2 * ncpu), max(4, nbytes // (64 << 20) + 1))
        )

    if hot_keys is not None and len(list(hot_keys)):
        if how != "inner":
            raise ValueError("hot_keys split is only defined for how='inner'")
        hot = pa.array(sorted(set(hot_keys)))

        def keep_hot(col: str):
            def fn(b: pa.Table) -> pa.Table:
                return b.filter(pc.is_in(b[col], value_set=hot))
            return fn

        def drop_hot(col: str):
            def fn(b: pa.Table) -> pa.Table:
                return b.filter(pc.invert(pc.is_in(b[col], value_set=hot)))
            return fn

        # hot right rows are small by contract (caller names only keys
        # whose LEFT side is heavy) -> one driver collect + broadcast.
        # Collected as ARROW and converted via _exact_pandas: the
        # default pandas conversion upcasts null-holding int columns
        # to float64, diverging the hot stream's schema from the cold
        # Dataset.join output and rounding ints > 2^53 (review
        # finding)
        hot_ds = right.map_batches(
            keep_hot(rkey), batch_format="pyarrow"
        ).materialize()
        hot_blocks = [
            ray.get(r)
            for b in hot_ds.iter_internal_ref_bundles()
            for r in b.block_refs
        ]
        hot_blocks = [t for t in hot_blocks if t.num_rows]
        r_hot = _exact_pandas(
            pa.concat_tables(hot_blocks)
            if hot_blocks
            else hot_ds.schema().base_schema.empty_table()
        )
        if rkey != on:
            r_hot = r_hot.rename(columns={rkey: on})
        l_hot = left.map_batches(keep_hot(on), batch_format="pyarrow")
        hot_joined = broadcast_inner_join(l_hot, r_hot, on=on)
        cold = hash_join(
            left.map_batches(drop_hot(on), batch_format="pyarrow"),
            right.map_batches(drop_hot(rkey), batch_format="pyarrow"),
            on=on, right_on=right_on, how="inner",
            num_partitions=num_partitions,
        )
        cols = cold.columns()
        return cold.union(hot_joined.select_columns(cols))

    return left.join(
        right,
        join_type=_JOIN_TYPES[how],
        num_partitions=num_partitions,
        on=(on,),
        right_on=(rkey,),
    )


def global_topk(
    ds: rd.Dataset,
    sort_cols: Sequence[str],
    ascending: Sequence[bool],
    k: int,
) -> pd.DataFrame:
    """Global top-k rows WITHOUT a global sort (the ``ORDER BY ...
    LIMIT k`` shape): every block emits its own top-k with one
    vectorized sort, then the ≤ k×#blocks candidate rows merge once on
    the driver. ``ds.sort().limit(k)`` would shuffle every row of the
    dataset to rank the top ten; this moves k rows per block, total
    independent of n. Ties beyond ``sort_cols`` are unspecified — pass
    a unique tie-break column (id) for a deterministic result.

    Reference analog: the global eval ranking collect at
    /root/reference/src/Inference.py:240 (torch.topk over all users'
    scores in one process).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cols, asc = list(sort_cols), list(ascending)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        g = b.to_pandas().sort_values(cols, ascending=asc, kind="mergesort")
        return pa.Table.from_pandas(g.head(k), preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        cand.sort_values(cols, ascending=asc, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


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
    /root/reference/src/Inference.py:240).

    Integer, string, temporal and boolean group keys all route
    through the hash exchange with ONE pandas sort + cumcount per
    reducer shard (no per-group UDF); only unroutable dtypes (floats)
    fall back to ``groupby().map_groups``."""
    from ..shuffle import exchange_routable, hash_group_apply

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(sort_cols), ascending=list(ascending), kind="mergesort")
        g = g.head(k).copy()
        g[rank_col] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    if not exchange_routable(ds, group_col):
        return ds.groupby(group_col).map_groups(topk, batch_format="pandas")

    def topk_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # preserve the input schema exactly (a pandas round-trip
            # degrades an empty string column to null type)
            return t.append_column(rank_col, pa.array([], type=pa.int64()))
        # Arrow-native: one multi-key sort + a vectorized run-rank —
        # no pandas round trip (which upcast null-holding int columns
        # to float64, silently rounding values > 2^53 and drifting the
        # schema from the empty branch — review finding), and faster
        keys = [(group_col, "ascending")] + [
            (c, "ascending" if asc else "descending")
            for c, asc in zip(sort_cols, ascending)
        ]
        t = t.take(pc.sort_indices(t, sort_keys=keys)).combine_chunks()
        codes = (
            t[group_col]
            .dictionary_encode()
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
        )
        n = t.num_rows
        starts = np.ones(n, dtype=bool)
        starts[1:] = codes[1:] != codes[:-1]
        first = np.flatnonzero(starts)
        run = np.cumsum(starts) - 1
        rank = np.arange(n, dtype=np.int64) - first[run] + 1
        keep = rank <= k
        return t.filter(pa.array(keep)).append_column(
            rank_col, pa.array(rank[keep], type=pa.int64())
        )

    return hash_group_apply(ds, group_col, topk_shard)


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


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str,
    ts_col: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_right",
    salt_bucket_seconds: int | None = None,
) -> rd.Dataset:
    """As-of join: for every left row, attach the right row with the
    greatest right ``ts_col`` <= left ``ts_col`` (direction="backward";
    "forward" = smallest >=) sharing ``key_col``. Left rows with no
    match keep nulls. Right value columns are emitted as
    ``<col><suffix>`` (plus ``<ts_col><suffix>`` for the matched time).

    Ray-Data-first shape: NO sorted-merge machinery and no broadcast —
    both sides are tagged, schema-aligned and unioned, then ONE
    ``groupby(key)`` co-locates each key's rows and a vectorized
    per-group ``pd.merge_asof`` does the time matching. The single
    shuffle moves only the join keys' rows (prune both sides to the
    needed columns before calling at scale).

    Partitioning assumption (documented per the custom-operator rule):
    one key's rows must fit a worker. ``salt_bucket_seconds`` removes
    that assumption: groups become (key, ts//bucket) so a hot key's
    rows spread across reducers, and the join stays EXACT via a
    carry pass — a tiny first exchange (per-block pre-aggregated to
    one presence row + one last/first right row per (key, bucket))
    computes, for every bucket the left occupies, the latest right
    row from any EARLIER bucket (earliest LATER bucket for
    direction="forward"); that one carry row is injected into the
    bucket's group, and it is the only right row outside the bucket
    that can win an as-of match across the boundary. Cost: one extra
    small exchange + one carry row per occupied (key, bucket).

    Ties on equal right ts: the row latest in (ts, original right
    order) wins — made deterministic by sorting the right side with a
    stable mergesort before the asof scan.

    Reference analog: the left-outer lookup-with-default of
    /root/reference/src/Inference.py:216-221, upgraded with a time
    predicate.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_value_cols = [c for c in right_value_cols if c != key_col]

    def _arrow_types(ds: rd.Dataset) -> dict:
        base = ds.schema().base_schema
        if hasattr(base, "field"):  # Arrow-block dataset
            return {n: base.field(n).type for n in base.names}
        # pandas-block dataset: numpy dtypes -> Arrow
        out = {}
        for n, t in zip(base.names, base.types):
            try:
                out[n] = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, pa.ArrowTypeError, TypeError):
                out[n] = pa.string()
        return out

    l_types = _arrow_types(left)
    l_names = list(l_types)
    r_keep = [key_col, ts_col, *[c for c in right_value_cols if c != ts_col]]
    right = right.select_columns(r_keep)

    out_ts = f"{ts_col}{suffix}"
    r_renamed = {ts_col: out_ts, **{c: f"{c}{suffix}" for c in right_value_cols}}
    r_out_names = [r_renamed[c] for c in [ts_col, *right_value_cols]]
    clash = set(r_out_names) & set(l_names)
    if clash:
        # same guard range_join grew: tag_left would silently null out
        # the left's real column and the output would carry duplicate
        # labels (review finding)
        raise ValueError(
            f"asof_join: suffixed right columns {sorted(clash)} collide "
            "with left columns — rename one side or change suffix"
        )

    # align schemas: union needs identical columns; each side fills the
    # other's columns with typed nulls and carries a __side tag
    r_types_raw = _arrow_types(right)
    r_types = {r_renamed[n]: r_types_raw[n] for n in r_keep if n != key_col}
    all_names = l_names + r_out_names

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in l_names}
        for n in r_out_names:
            cols[n] = pa.nulls(b.num_rows, type=r_types[n])
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for n in all_names:
            if n == key_col:
                # cast to the LEFT key dtype: a mismatched pair (int32
                # vs int64, string vs large_string) would otherwise
                # crash pa.concat_tables deep inside the exchange
                # (review finding); incompatible keys fail HERE with
                # Arrow's cast error instead
                cols[n] = b[key_col].cast(l_types[key_col])
            elif n in r_out_names:
                src = [k for k, v in r_renamed.items() if v == n][0]
                cols[n] = b[src]
            else:
                cols[n] = pa.nulls(b.num_rows, type=l_types[n])
        cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    # pinned output schema for EVERY branch (the salted path always
    # had this; the unsalted reducers used to let the pandas
    # round-trip upcast null-holding int64 columns to float64 —
    # corrupting ints > 2^53 and drifting schemas across shards)
    out_schema = pa.schema(
        [pa.field(n, l_types[n]) for n in l_names]
        + [pa.field(n, r_types[n]) for n in r_out_names]
    )

    def join_group(g: pd.DataFrame) -> pa.Table:
        lg = g[g["__side"] == 0]
        rg = g[g["__side"] == 1]
        lg = lg[l_names].sort_values(ts_col, kind="mergesort")
        rg = rg[[key_col, *r_out_names]].sort_values(out_ts, kind="mergesort")
        out = pd.merge_asof(
            lg,
            rg.drop(columns=[key_col]),
            left_on=ts_col,
            right_on=out_ts,
            direction=direction,
        )
        return pa.Table.from_pandas(
            out[l_names + r_out_names], preserve_index=False, schema=out_schema
        )

    from ..shuffle import exchange_routable, hash_group_apply

    if salt_bucket_seconds:
        return _asof_join_salted(
            unioned, key_col, ts_col, out_ts, l_names, r_out_names,
            direction, int(salt_bucket_seconds),
        )

    if not exchange_routable(left, key_col):
        return unioned.groupby(key_col).map_groups(
            lambda t: join_group(_exact_pandas(t)), batch_format="pyarrow"
        )

    def join_shard(t: pa.Table) -> pa.Table:
        # whole-shard reducer: merge_asof(by=key) matches every key in
        # the shard in one C pass — no per-group UDF
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = _exact_pandas(t)
        lg = g[g["__side"] == 0][l_names].sort_values(ts_col, kind="mergesort")
        rg = g[g["__side"] == 1][[key_col, *r_out_names]].sort_values(
            out_ts, kind="mergesort"
        )
        out = pd.merge_asof(
            lg,
            rg,
            left_on=ts_col,
            right_on=out_ts,
            by=key_col,
            direction=direction,
        )
        return pa.Table.from_pandas(
            out[l_names + r_out_names], preserve_index=False, schema=out_schema
        )

    return hash_group_apply(unioned, key_col, join_shard)


def _asof_join_salted(
    unioned: rd.Dataset,
    key_col: str,
    ts_col: str,
    out_ts: str,
    l_names: list,
    r_out_names: list,
    direction: str,
    bucket_seconds: int,
) -> rd.Dataset:
    """Hot-key-safe as-of join body: groups are (key, time bucket).

    Exactness argument: within a bucket the as-of match is the normal
    merge_asof. The only right row OUTSIDE a left row's bucket that
    can win a backward match is the globally latest right row in any
    strictly earlier bucket (any other earlier row is dominated by
    it; later-bucket rows have ts past the bucket edge, above every
    left ts in the bucket). The carry exchange injects exactly that
    row per occupied (key, bucket); symmetric for forward. Per-block
    map partials pre-aggregate to one presence + one candidate row
    per (key, bucket, block), so the carry exchange ships O(groups),
    never the hot key's row count.
    """
    from ..shuffle import (
        _key_u64, _mix64, hash_group_apply, hash_group_exchange,
    )

    bucket_us = bucket_seconds * 1_000_000
    back = direction == "backward"

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = pc.coalesce(b[ts_col], b[out_ts])  # left rows | right rows
        tsi = (
            pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bk = np.floor_divide(tsi.astype(np.int64), bucket_us)
        return b.append_column("__bucket", pa.array(bk, type=pa.int64()))

    tagged = unioned.map_batches(add_bucket, batch_format="pyarrow").materialize()
    full_schema = tagged.schema().base_schema  # captured for widen_carry
    narrow = [key_col, "__bucket", "__side", out_ts, *
              [c for c in r_out_names if c != out_ts]]
    # every exchange boundary pins an explicit Arrow schema: pandas
    # round-trips infer per-block dtypes (a left-only block would emit
    # float64/null value columns) and pa.concat_tables in the reducer
    # requires identical schemas across map shards
    narrow_schema = pa.schema(
        [pa.field(n, full_schema.field(n).type) for n in narrow]
    )

    def carry_partials(b: pa.Table) -> pa.Table:
        # per-block pre-aggregation: one left-presence row and one
        # right candidate (last for backward / first for forward) per
        # (key, bucket)
        g = b.select(narrow).to_pandas()
        left_p = (
            g[g["__side"] == 0][[key_col, "__bucket", "__side"]]
            .drop_duplicates()
        )
        rg = g[g["__side"] == 1].sort_values(out_ts, kind="mergesort")
        # whole-ROW candidate per (key, bucket) — tail/head, not agg,
        # so value columns stay consistent with their timestamp
        grp = rg.groupby([key_col, "__bucket"], sort=False)
        right_c = grp.tail(1) if back else grp.head(1)
        out = pd.concat([left_p, right_c], ignore_index=True)
        return pa.Table.from_pandas(
            out, preserve_index=False, schema=narrow_schema
        )

    def carry_reduce(t: pa.Table) -> pa.Table:
        # per key: for each left-occupied bucket, the winning right
        # row from strictly earlier (later, if forward) buckets —
        # itself a merge_asof over the per-bucket candidates
        if t.num_rows == 0:
            return narrow_schema.empty_table()
        g = t.to_pandas()
        lefts = (
            g[g["__side"] == 0][[key_col, "__bucket"]]
            .drop_duplicates()
            .sort_values("__bucket", kind="mergesort")
        )
        rg = g[g["__side"] == 1].sort_values(out_ts, kind="mergesort")
        grp = rg.groupby([key_col, "__bucket"], sort=False)
        rl = (
            (grp.tail(1) if back else grp.head(1))
            .drop(columns="__side")
            .sort_values("__bucket", kind="mergesort")
        )
        carr = pd.merge_asof(
            lefts, rl, on="__bucket", by=key_col,
            direction="backward" if back else "forward",
            allow_exact_matches=False,
        )
        carr = carr[carr[out_ts].notna()].copy()
        carr["__side"] = np.int8(1)
        return pa.Table.from_pandas(
            carr, preserve_index=False, schema=narrow_schema
        )

    carry_refs = hash_group_exchange(
        tagged, key_col, carry_reduce, map_fn=carry_partials
    )
    carries = rd.from_arrow_refs(carry_refs) if carry_refs else None

    def widen_carry(b: pa.Table) -> pa.Table:
        # carries back to the union's full schema (left cols null)
        cols = {}
        for n in [*l_names, *r_out_names, "__side", "__bucket"]:
            if n in b.schema.names:
                cols[n] = b[n].cast(full_schema.field(n).type)
            else:
                cols[n] = pa.nulls(b.num_rows, type=full_schema.field(n).type)
        return pa.table(cols)

    salted_in = tagged
    if carries is not None:
        salted_in = tagged.union(
            carries.map_batches(widen_carry, batch_format="pyarrow")
        )

    def add_salt(b: pa.Table) -> pa.Table:
        ku = _mix64(_key_u64(b, key_col))
        bu = _mix64(
            b["__bucket"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        return b.append_column(
            "__salt", pa.array((ku ^ bu).view(np.int64))
        )

    out_schema = pa.schema(
        [pa.field(n, full_schema.field(n).type) for n in [*l_names, *r_out_names]]
    )

    def join_shard_salted(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = t.to_pandas()
        lg = g[g["__side"] == 0][[*l_names, "__bucket"]].sort_values(
            ts_col, kind="mergesort"
        )
        rg = g[g["__side"] == 1][[key_col, "__bucket", *r_out_names]].sort_values(
            out_ts, kind="mergesort"
        )
        out = pd.merge_asof(
            lg, rg,
            left_on=ts_col, right_on=out_ts,
            by=[key_col, "__bucket"],
            direction=direction,
        )
        return pa.Table.from_pandas(
            out[l_names + r_out_names], preserve_index=False, schema=out_schema
        )

    return hash_group_apply(salted_in, "__salt", join_shard_salted, map_fn=add_salt)


def range_join(
    big: rd.Dataset,
    ranges: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> rd.Dataset:
    """Range (interval) join: each big-side row matches every range row
    with ``lo <= value < hi``. The range table is broadcast once
    (``ray.put``); the big side streams — no shuffle.

    Two vectorized paths, picked per call:

    - ranges sorted by ``lo`` with non-overlapping intervals (the
      common banding case): ONE ``np.searchsorted`` per batch — each
      value matches at most one band;
    - overlapping intervals: a chunked |batch| x |ranges| containment
      mask (exact, still vectorized) — right only for broadcast-sized
      range tables; an all-to-all interval join at 100 TB should
      instead bucket both sides by an interval-aligned grid key.

    ``how="inner"`` drops non-matching rows; ``how="left"`` keeps them
    with null range columns (single-band path only, where output rows
    stay 1:1).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    r = ranges.reset_index(drop=True).sort_values(lo_col, kind="mergesort")
    # overlapping NON-key column names would silently collide in the
    # output (the left path used to overwrite batch data) — refuse
    big_schema = big.schema()
    overlap = (
        set(r.columns) & set(big_schema.names) if big_schema is not None else set()
    )
    if overlap:
        raise ValueError(
            f"range_join: range columns {sorted(overlap)} collide with "
            "big-side columns — rename one side before joining"
        )
    los = r[lo_col].to_numpy()
    his = r[hi_col].to_numpy()
    if len(r) == 0:
        # no ranges: inner matches nothing; left keeps rows with null
        # range columns (the searchsorted probe below would index [-1]
        # into an empty array otherwise)
        def empty_fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.reset_index(drop=True)
            if how == "left":
                out = out.copy()
                for c in r.columns:
                    if r[c].dtype.kind in "iuf":
                        # numeric: NaN-filled float64, matching the
                        # non-empty left path's int upcast convention
                        out[c] = np.full(len(out), np.nan)
                    else:
                        # object dtype, NOT r[c].dtype: a bool range
                        # column would coerce None -> False, fabricating
                        # values for misses (review finding); object
                        # keeps them null, matching the non-empty left
                        # path where .where() upcasts bool to object
                        out[c] = pd.Series([None] * len(out), dtype="object")
                return out
            return out.iloc[:0]

        return big.map_batches(empty_fn, batch_format="pandas")
    disjoint = bool(np.all(his[:-1] <= los[1:])) if len(r) > 1 else True
    if how == "left" and not disjoint:
        raise ValueError("how='left' needs non-overlapping ranges (1:N otherwise)")
    ref = ray.put(r)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rr = ray.get(ref)
        v = batch[value_col].to_numpy()
        if disjoint:
            idx = np.searchsorted(los, v, side="right") - 1
            ok = (idx >= 0) & (v < his[np.clip(idx, 0, len(his) - 1)])
            if how == "left":
                out = batch.reset_index(drop=True).copy()
                matched = rr.iloc[np.where(ok, idx, 0)].reset_index(drop=True)
                oks = pd.Series(ok)
                for c in rr.columns:
                    # .where null-fills misses (ints upcast to float64,
                    # consistently across batches)
                    out[c] = matched[c].astype("float64").where(oks) if matched[
                        c
                    ].dtype.kind in "iu" else matched[c].where(oks)
                return out
            out = batch.reset_index(drop=True)[ok].reset_index(drop=True)
            return pd.concat(
                [out, rr.iloc[idx[ok]].reset_index(drop=True)], axis=1
            )
        rows, cols = [], []
        for s in range(0, len(v), 4096):
            vv = v[s : s + 4096]
            m = (vv[:, None] >= los[None, :]) & (vv[:, None] < his[None, :])
            ri, ci = np.nonzero(m)
            rows.append(ri + s)
            cols.append(ci)
        ri = np.concatenate(rows) if rows else np.empty(0, np.int64)
        ci = np.concatenate(cols) if cols else np.empty(0, np.int64)
        return pd.concat(
            [
                batch.reset_index(drop=True).iloc[ri].reset_index(drop=True),
                rr.iloc[ci].reset_index(drop=True),
            ],
            axis=1,
        )

    return big.map_batches(fn, batch_format="pandas")


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


def quantile_disc(
    ds: rd.Dataset, col: str, qs: Sequence[float], max_rounds: int = 64
) -> pd.DataFrame:
    """EXACT discrete quantiles (the value at index ``floor((n-1)*q)``
    of the sorted column — SQL ``quantile_disc`` semantics) without a
    global sort and without materializing the column anywhere: radix
    histogram refinement over an order-preserving uint64 view of the
    float bit pattern (IEEE-754 total order), 16 value bits per pass —
    FOUR streaming passes total for ALL requested quantiles (the first
    pass also yields n, so there is no separate count job). Reference
    analog: the quantile threshold cut at
    /root/reference/src/models/PISA.py:244-248.

    Each pass ships back only the NONZERO (target, bucket, count)
    histogram cells per block — bounded by the distinct values inside
    each target's current 16-bit bracket, never the data. The 100-TB
    shape: a sort-based quantile would be an all-to-all shuffle of
    every row; this is 4 map-only scans with KB-scale results.
    ``max_rounds`` caps the passes (exactly 4 are needed for a full
    64-bit refinement; fewer would return a value reconstructed from a
    PARTIAL bit prefix — silently wrong — so the rail REFUSES instead).
    """
    if max_rounds < 4:
        raise ValueError(
            f"quantile_disc: max_rounds={max_rounds} < 4 cannot complete "
            "the 64-bit radix refinement (a partial prefix decodes to a "
            "wrong value, not an approximation)"
        )
    k = len(qs)

    def f2u(x: np.ndarray) -> np.ndarray:
        b = np.asarray(x, dtype=np.float64).view(np.int64)
        return np.where(
            b >= 0, b.view(np.uint64) + np.uint64(1 << 63), ~b.view(np.uint64)
        )

    def u2f(u: np.ndarray) -> np.ndarray:
        u = np.asarray(u, dtype=np.uint64)
        b = np.where(u < np.uint64(1 << 63), ~u, u - np.uint64(1 << 63))
        return b.view(np.float64)

    def hist_pass(prefixes: np.ndarray | None, hi_bits: int) -> np.ndarray:
        """One scan. For each target whose known top ``hi_bits`` equal
        its prefix, bincount the NEXT 16 bits; return k x 65536."""

        def fn(batch: pa.Table) -> pa.Table:
            src = batch[col]
            iv = None
            if pa.types.is_integer(src.type if not isinstance(src, pa.ChunkedArray) else src.type):
                iv = src.to_numpy(zero_copy_only=False)
                if iv.size and np.abs(iv.astype(np.float64)).max() > 2.0**53:
                    # the radix walk runs on float64 bit patterns;
                    # beyond 2^53 distinct ints collapse and the
                    # "EXACT discrete quantile" contract breaks —
                    # refuse loudly (review finding)
                    raise ValueError(
                        f"quantile_disc: {col!r} holds integers beyond "
                        "float64's exact range (2^53) — exact discrete "
                        "quantiles are not representable; rescale first"
                    )
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            # SQL quantile_disc excludes NULL/NaN; the IEEE total-order
            # view would otherwise sort NaN above +inf and count it
            v = v[~np.isnan(v)]
            u = f2u(v)
            ts, bs, cs = [], [], []
            nxt = np.uint64(64 - hi_bits - 16)
            for t in range(k if prefixes is not None else 1):
                if prefixes is None:
                    sel = u  # first pass: one shared histogram
                else:
                    sel = u[(u >> np.uint64(64 - hi_bits)) == prefixes[t]]
                bc = np.bincount(
                    ((sel >> nxt) & np.uint64(0xFFFF)).astype(np.int64),
                    minlength=1 << 16,
                )
                nz = np.flatnonzero(bc)
                ts.append(np.full(nz.size, t, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                cs.append(bc[nz].astype(np.int64))
            return pa.table(
                {
                    "t": np.concatenate(ts) if ts else np.zeros(0, np.int64),
                    "b": np.concatenate(bs) if bs else np.zeros(0, np.int64),
                    "c": np.concatenate(cs) if cs else np.zeros(0, np.int64),
                }
            )

        parts = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
        h = np.zeros((k if prefixes is not None else 1, 1 << 16), dtype=np.int64)
        np.add.at(h, (parts["t"].to_numpy(), parts["b"].to_numpy()), parts["c"].to_numpy())
        return h

    # pass 1: shared top-16-bit histogram; its total is n
    h0 = hist_pass(None, 0)[0]
    n = int(h0.sum())
    if n == 0:
        return pd.DataFrame({"q": list(qs), col: [None] * k})
    # residual 0-based rank per target, walked down one 16-bit digit
    # per pass
    rank = np.asarray(
        [min(n - 1, int(np.floor((n - 1) * q))) for q in qs], dtype=np.int64
    )
    cum = np.cumsum(h0)
    bucket = np.searchsorted(cum, rank + 1, side="left")
    rank = rank - np.where(bucket > 0, cum[bucket - 1], 0)
    prefixes = bucket.astype(np.uint64)
    hi_bits = 16
    for _ in range(min(3, max_rounds - 1)):
        h = hist_pass(prefixes, hi_bits)
        cum = np.cumsum(h, axis=1)
        bucket = np.asarray(
            [np.searchsorted(cum[t], rank[t] + 1, side="left") for t in range(k)],
            dtype=np.int64,
        )
        prev = np.where(bucket > 0, cum[np.arange(k), np.maximum(bucket - 1, 0)], 0)
        rank = rank - prev
        prefixes = (prefixes << np.uint64(16)) | bucket.astype(np.uint64)
        hi_bits += 16
    return pd.DataFrame({"q": list(qs), col: u2f(prefixes)})


def hopping_window_agg(
    ds: rd.Dataset,
    ts_col: str,
    key_col: str,
    value_col: str,
    size_seconds: int,
    hop_seconds: int,
) -> rd.Dataset:
    """Hopping (sliding) window count+sum per key: windows of
    ``size_seconds`` starting every ``hop_seconds`` (size must be a
    multiple of hop). Streaming semantics on the batch engine: each
    event is fanned out to its ``size/hop`` covering windows INSIDE
    ``map_batches`` (vectorized np.repeat — the expansion never
    round-trips through the driver), then ONE groupby aggregates.
    Shuffle volume is size/hop × events — pick the ratio accordingly;
    at 100 TB pre-aggregate per (window, key) inside the batch first,
    which this does via the tumbling trick when batches are large.

    Window label = window START time (epoch-aligned).
    """
    if size_seconds % hop_seconds:
        raise ValueError("size_seconds must be a multiple of hop_seconds")
    n_win = size_seconds // hop_seconds
    hop_us = hop_seconds * 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        tcol = batch[ts_col]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if tcol.null_count:
            # NaT views as INT64_MIN and the window arithmetic wraps,
            # silently filing the row under a garbage window (review
            # finding) — null timestamps belong to NO window, drop
            # them (the SQL GROUP BY analog files them under a NULL
            # window, which downstream window math can't consume)
            batch = batch.filter(pc.is_valid(tcol))
        n = batch.num_rows
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        tsi = ts.view("i8")
        # last covering window start = floor(ts/hop)*hop; earlier ones
        # step back by hop, n_win total, clipped at ts-size exclusive
        last = (tsi // hop_us) * hop_us
        starts = last[:, None] - np.arange(n_win, dtype=np.int64)[None, :] * hop_us
        keep = starts > (tsi[:, None] - size_seconds * 1_000_000)
        ri, ci = np.nonzero(keep)
        w = starts[ri, ci]
        keys = batch[key_col].take(pa.array(ri))
        vals = batch[value_col].take(pa.array(ri))
        return pa.table(
            {
                "window": pa.array(w.view("M8[us]")),
                key_col: keys,
                value_col: vals,
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["window", key_col])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def _knuth_hash(v: np.ndarray, seed: int) -> np.ndarray:
    """The module's ONE SQL-replayable row hash —
    ``((v + seed) % 2^31) * 2654435761 % 2^32`` — shared by
    ``stratified_sample`` / ``hash_split`` / ``rate_sample`` and
    replayed verbatim by their DuckDB oracles; kept inside BIGINT
    range so any SQL engine reproduces it with plain arithmetic."""
    return (
        (v.astype(np.uint64) + np.uint64(seed)) % np.uint64(2**31)
    ) * np.uint64(2654435761) % np.uint64(2**32)


def _hash_key_values(batch: pa.Table, col: str) -> np.ndarray:
    """Validated int64 key extraction for the _knuth_hash-based ops.

    Nulls would surface as float64 NaN from ``to_numpy`` and NaN →
    uint64 is undefined (a null-keyed row would get an arbitrary,
    platform-dependent split/keep decision); negative keys wrap
    differently under numpy uint64 than under the SQL oracles' signed
    modulo. Both silently violate the documented deterministic
    SQL-replayable contract, so reject them loudly up front."""
    c = batch[col]
    if c.null_count:
        raise ValueError(
            f"{col!r} contains {c.null_count} null(s); deterministic "
            "hash sampling/splitting requires non-null integer keys"
        )
    v = c.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    if v.size and v.min() < 0:
        raise ValueError(
            f"{col!r} contains negative values; the SQL-replayable "
            "Knuth hash is defined for non-negative keys only"
        )
    return v


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    n_per_key: int,
    id_col: str,
    seed: int = 0,
) -> rd.Dataset:
    """Deterministic stratified sample: at most ``n_per_key`` rows per
    key, chosen by ranking each key's rows on a seeded hash of the id
    (splitmix64) — a pure per-row function, so the SAME rows are picked
    at any parallelism (training-data curation needs reproducible
    subsets, cf. the reference's fixed seeding,
    /root/reference/src/utils/utils.py:82-87). One groupby(key); the
    per-group cut is a vectorized sort.

    The rank hash is a Knuth multiplicative hash kept inside BIGINT
    range so an external SQL engine can replay the EXACT same choice
    (``((id + seed) % 2^31) * 2654435761 % 2^32``) — cross-engine
    reproducibility of the sampled subset matters more here than hash
    quality (ties broken by id)."""

    def add_h(batch: pa.Table) -> pa.Table:
        v = _hash_key_values(batch, id_col)
        return batch.append_column(
            "__h", pa.array(_knuth_hash(v, seed).astype(np.int64))
        )

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > n_per_key:
            g = g.sort_values(["__h", id_col], kind="mergesort").head(n_per_key)
        return g.drop(columns="__h")

    from ..shuffle import exchange_routable, hash_group_apply

    hashed = ds.map_batches(add_h, batch_format="pyarrow")
    if not exchange_routable(ds, key_col):
        return hashed.groupby(key_col).map_groups(cut, batch_format="pandas")

    def cut_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # schema-preserving empty (column-less degenerates pass through)
            return t.drop_columns("__h") if "__h" in t.schema.names else t
        # Arrow-native sort + run-count (see per_group_topk: the
        # pandas round trip corrupted null-holding int columns)
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[(key_col, "ascending"), ("__h", "ascending"),
                           (id_col, "ascending")],
            )
        ).combine_chunks()
        codes = (
            t[key_col]
            .dictionary_encode()
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
        )
        n = t.num_rows
        starts = np.ones(n, dtype=bool)
        starts[1:] = codes[1:] != codes[:-1]
        first = np.flatnonzero(starts)
        run = np.cumsum(starts) - 1
        keep = (np.arange(n, dtype=np.int64) - first[run]) < n_per_key
        return t.filter(pa.array(keep)).drop_columns("__h")

    return hash_group_apply(hashed, key_col, cut_shard)


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
    slicing the same way, /root/reference/src/helpers/Reader.py:148-178).

    Two stages, pre-aggregated before the shuffle:

    1. per-block LOCAL sessionization (vectorized) collapses each
       block's events into session PARTIALS (key, first_ts, last_ts,
       n_events) — any partitioning of the input is fine;
    2. ``groupby(key)`` over the partials merges them exactly.

    The merge is exact at any parallelism: a local maximal run can
    never straddle a global session boundary (the boundary gap > T
    contains no events anywhere, so a run crossing it would need an
    internal gap > T), and within one global session the partial whose
    ``first_ts`` is smallest among the unmerged ones always starts
    within T of the running-max ``last_ts`` of the merged ones (its
    global predecessor event is already merged). So merging
    first_ts-sorted partials whenever ``first_ts - runmax(last_ts) <=
    T`` reconstructs the global sessions.

    Versus a groupby over raw events this shuffles only O(sessions)
    rows, and a hot key (one bot user with millions of events) costs
    its per-block share in stage 1 and only its session count in
    stage 2 — the skew-safe shape for the 100-TB setting.

    Returns one row per session: (key, session_id, session_start,
    n_events) with session_id numbered 1.. per key in time order.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def local_partials(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=batch[key_col].dtype),
                    "first_ts": pd.Series([], dtype="datetime64[us]"),
                    "last_ts": pd.Series([], dtype="datetime64[us]"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        b = batch.sort_values([key_col, *order_cols], kind="mergesort")
        keys = b[key_col].to_numpy()
        ts = b[ts_col].astype("datetime64[us]").to_numpy()
        tsi = ts.view("i8")
        new = np.ones(len(b), dtype=bool)
        if len(b) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | ((tsi[1:] - tsi[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(b)] - 1
        return pd.DataFrame(
            {
                key_col: keys[starts],
                "first_ts": ts[starts],
                "last_ts": ts[ends],
                "n_events": (ends - starts + 1).astype(np.int64),
            }
        )

    def merge_shard(t: pa.Table) -> pa.Table:
        # whole-shard merge, vectorized across keys: sort by (key,
        # first_ts, last_ts); the within-key running max of last_ts is
        # a pandas groupby.cummax (C-speed across all groups at once)
        g = t.to_pandas().sort_values(
            [key_col, "first_ts", "last_ts"], kind="mergesort"
        )
        n = len(g)
        if n == 0:
            # keep the key's REAL type (string keys route through the
            # exchange too); a column-less degenerate falls back int64
            ktype = (
                t.schema.field(key_col).type
                if key_col in t.schema.names
                else pa.int64()
            )
            return pa.table(
                {
                    key_col: pa.array([], type=ktype),
                    "session_id": pa.array([], type=pa.int64()),
                    "session_start": pa.array([], type=pa.timestamp("us")),
                    "n_events": pa.array([], type=pa.int64()),
                }
            )
        keys = g[key_col].to_numpy()
        f = g["first_ts"].to_numpy().view("i8")
        last_cm = (
            g.groupby(key_col, sort=False)["last_ts"]
            .cummax()
            .to_numpy()
            .view("i8")
        )
        key_start = np.ones(n, dtype=bool)
        key_start[1:] = keys[1:] != keys[:-1]
        new = key_start.copy()
        if n > 1:
            new[1:] |= (f[1:] - last_cm[:-1]) > gap_us
        snum = np.cumsum(new)  # global session counter
        base = snum[key_start]  # counter value at each key's first session
        run_id = np.cumsum(key_start) - 1
        sid = snum - base[run_id] + 1
        grp = snum - 1
        n_sess = int(snum[-1])
        n_events = np.zeros(n_sess, dtype=np.int64)
        np.add.at(n_events, grp, g["n_events"].to_numpy())
        starts = np.flatnonzero(new)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    key_col: keys[starts],
                    "session_id": sid[starts].astype(np.int64),
                    "session_start": g["first_ts"].to_numpy()[starts],
                    "n_events": n_events,
                }
            ),
            preserve_index=False,
        )

    from ..shuffle import exchange_routable, hash_group_apply

    parts = ds.map_batches(local_partials, batch_format="pandas", batch_size=None)
    if not exchange_routable(ds, key_col):
        # merge_shard is key-generic; per-group invocation is the
        # fallback for the rare dtypes the exchange can't route
        return parts.groupby(key_col).map_groups(
            merge_shard, batch_format="pyarrow"
        )
    return hash_group_apply(parts, key_col, merge_shard)


def _as_arrow(t) -> pa.Table:
    # upstream pandas-block stages yield DataFrame blocks
    return t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)


@ray.remote
def _block_scan_partial(order_col: str, value_col: str, t):
    t = _as_arrow(t)
    if t.num_rows == 0:
        return (None, None, 0, False)
    keys = t[order_col].combine_chunks().to_numpy(zero_copy_only=False)
    vals = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
    # duplicate order keys INSIDE a block would make the scan
    # layout-dependent just like boundary duplicates — detect them
    # here. Blocks arrive sorted from ds.sort, so an O(n) adjacency
    # check suffices; only fall back to a copy+sort if a block ever
    # arrives unsorted (paranoia — the apply pass re-sorts anyway).
    if keys.size > 1:
        if np.all(keys[1:] >= keys[:-1]):
            sk = keys
        else:
            sk = np.sort(keys)
        has_dup = bool(np.any(sk[1:] == sk[:-1]))
        lo, hi = sk[0], sk[-1]
    else:
        has_dup = False
        lo = hi = keys[0]
    return (lo, hi, int(np.sum(vals, dtype=np.int64)), has_dup)


@ray.remote
def _block_scan_apply(
    order_col: str, value_col: str, out_col: str, offset: int, t
) -> pa.Table:
    t = _as_arrow(t)
    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], type=pa.int64()))
    idx = pc.sort_indices(t, sort_keys=[(order_col, "ascending")])
    t = t.take(idx)
    vals = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
    off = np.empty(len(vals), dtype=np.int64)
    off[0] = offset
    np.cumsum(vals[:-1], out=off[1:][: len(vals) - 1])
    off[1:] += offset
    return t.append_column(out_col, pa.array(off))


def prefix_sum(
    ds: rd.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
) -> rd.Dataset:
    """EXCLUSIVE prefix sum of ``value_col`` in ``order_col`` order —
    the distributed scan primitive (global positions, sequence
    packing offsets, cumulative quotas).

    Two passes, no all-gather: a range-partitioning sort, then one
    tiny (min_key, sum) scalar per block to the driver — O(#blocks),
    never O(rows) — whose exclusive cumsum seeds per-block local
    cumsums. ``order_col`` values must be unique (with duplicates the
    intra-key order, and so the scan, would depend on block layout);
    blocks are offset in min-key order, so the result is
    parallelism-invariant.

    ``value_col`` must be integer: the scan accumulates in int64
    (float inputs used to truncate silently in the partial pass and
    crash in the apply pass — now refused up front).
    """
    in_schema = ds.schema()
    if in_schema is not None and value_col in in_schema.names:
        vt = dict(zip(in_schema.names, in_schema.types))[value_col]
        if not isinstance(vt, pa.DataType):
            # pandas-block dataset: numpy dtype — normalize so the
            # guard below can't be bypassed (review finding)
            vt = pa.from_numpy_dtype(np.dtype(vt))
        if not (pa.types.is_integer(vt) or pa.types.is_boolean(vt)):
            raise TypeError(
                f"prefix_sum: value_col {value_col!r} is {vt} — the scan "
                "is exact int64 arithmetic; cast or round explicitly first"
            )
    mat = ds.sort(order_col).materialize()
    refs = [r for b in mat.iter_internal_ref_bundles() for r in b.block_refs]

    def _empty_with_out_col() -> rd.Dataset:
        # empty input: emit an empty dataset that still carries the
        # documented (…, out_col) schema rather than a column-less one
        # (sort+materialize of a 0-row dataset drops its schema, so
        # rebuild from the input's)
        if in_schema is None:
            return mat
        types = []
        for t in in_schema.types:
            if not isinstance(t, pa.DataType):
                # pandas-block dataset: numpy dtypes — pa.array([], t)
                # rejects them with TypeError (review finding)
                t = pa.from_numpy_dtype(np.dtype(t))
            types.append(t)
        fields = list(zip(in_schema.names, types))
        fields += [(out_col, pa.int64())]
        return rd.from_arrow(pa.table({n: pa.array([], t) for n, t in fields}))

    if not refs:
        return _empty_with_out_col()
    parts = ray.get(
        [_block_scan_partial.remote(order_col, value_col, r) for r in refs]
    )
    if any(p[3] for p in parts):
        raise AssertionError(
            "prefix_sum: duplicate order_col values inside a block "
            "(order_col must be unique)"
        )
    live = [
        (lo, hi, s, r) for (lo, hi, s, _), r in zip(parts, refs) if lo is not None
    ]
    if not live:
        return _empty_with_out_col()
    live.sort(key=lambda x: x[0])
    # the offsets are only valid if the sort produced disjoint block
    # key ranges (Ray's range-partitioning contract) — check it with
    # the O(#blocks) scalars we already hold rather than trusting it
    for (_, hi_a, _, _), (lo_b, _, _, _) in zip(live, live[1:]):
        # equal boundary keys mean a duplicated order key straddles two
        # blocks — the scan would be layout-dependent, which is exactly
        # the contract violation this guard exists to catch
        if hi_a >= lo_b:
            raise AssertionError(
                "prefix_sum: sorted blocks have overlapping or "
                "boundary-duplicated key ranges (order_col must be unique)"
            )
    sums = np.array([s for _, _, s, _ in live], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(sums)))[:-1]
    return rd.from_arrow_refs(
        [
            _block_scan_apply.remote(order_col, value_col, out_col, int(o), r)
            for (_, _, _, r), o in zip(live, offs)
        ]
    )


def hash_split(
    ds: rd.Dataset,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("validation", 0.1),
        ("test", 0.1),
    ),
    seed: int = 0,
    out_col: str = "split",
) -> rd.Dataset:
    """Leakage-safe deterministic dataset split: the split label is a
    pure function of ``key_col``, so every row sharing a key (a
    duplicate cluster's canon_id, a repo, a user) lands in the SAME
    split — near-dups never straddle train/test. Embarrassingly
    parallel, reproducible at any parallelism, and SQL-replayable:
    the same Knuth multiplicative hash as ``stratified_sample``
    (``((key + seed) % 2^31) * 2654435761 % 2^32``) compared against
    integer thresholds ``floor(cum_weight * 2^32)`` — exact integer
    comparisons, no float boundary drift between engines."""
    total = sum(w for _, w in weights)
    cum, acc = [], 0.0
    for _, w in weights:
        acc += w / total
        cum.append(acc)
    thresholds = np.array(
        [int(np.floor(c * 2**32)) for c in cum[:-1]], dtype=np.uint64
    )
    names = [n for n, _ in weights]

    name_arr = np.asarray(names, dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        v = _hash_key_values(batch, key_col)
        lab = np.searchsorted(thresholds, _knuth_hash(v, seed), side="right")
        return batch.append_column(
            out_col, pa.array(name_arr[lab], type=pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def rate_sample(
    ds: rd.Dataset,
    rates: dict,
    key_col: str,
    id_col: str,
    default_rate: float = 1.0,
    seed: int = 0,
) -> rd.Dataset:
    """Per-group Bernoulli rate sampling — the source-mixing stage of
    a training-data pipeline (keep rows of source s at rate r_s, e.g.
    up-weight books, down-weight crawl). Keeps a row iff
    ``knuth_hash(id + seed) < floor(r * 2^32)``: a pure per-row
    function of (id, its group's rate), so the kept subset is
    deterministic at any parallelism, refreshes coherently when the
    seed changes, and is exactly SQL-replayable (same integer hash as
    ``hash_split`` / ``stratified_sample``)."""
    names = list(rates)
    thresholds = np.array(
        [int(np.floor(float(rates[n]) * 2**32)) for n in names]
        + [int(np.floor(default_rate * 2**32))],
        dtype=np.uint64,
    )

    def fn(batch: pa.Table) -> pa.Table:
        v = _hash_key_values(batch, id_col)
        h = _knuth_hash(v, seed)
        pos = pc.index_in(batch[key_col], value_set=pa.array(names))
        idx = pos.to_numpy(zero_copy_only=False)
        idx = np.where(np.isnan(idx), len(names), idx).astype(np.int64)
        return batch.filter(pa.array(h < thresholds[idx]))

    return ds.map_batches(fn, batch_format="pyarrow")


def bottomk_sample(
    ds: rd.Dataset, key_col: str, k: int, seed: int = 0
) -> rd.Dataset:
    """EXACT uniform k-sample of distinct keys, group-coherent: keep
    every row whose key is among the k distinct keys with the smallest
    ``(knuth_hash(key + seed), key)`` — the classic bottom-k /
    min-wise sample. Deterministic at any parallelism and block
    layout, coherent across TABLES (two datasets sampled with the same
    seed select the SAME keys — join-compatible samples, which
    ``ds.random_sample`` cannot give), refreshes wholesale when the
    seed changes, and exactly SQL-replayable
    (``ORDER BY hash, key LIMIT k`` over distinct keys).

    Shape: pass 1 ships each block's k smallest (hash, key) pairs —
    O(k x blocks) narrow rows, never the key column — and the driver
    keeps the global bottom k; pass 2 is a broadcast ``is_in`` filter.
    At 100 TB the selected-key set (k entries) is the only driver
    state. Hash ties break on the raw key, so the sample is exact even
    under 32-bit hash collisions."""
    if k <= 0:
        raise ValueError(f"bottomk_sample: k must be positive, got {k}")

    def block_bottom(batch: pa.Table) -> pa.Table:
        v = _hash_key_values(batch, key_col)
        keys = np.unique(v)
        h = _knuth_hash(keys, seed)
        if keys.size > k:
            order = np.lexsort((keys, h))[:k]
            keys, h = keys[order], h[order]
        return pa.table(
            {
                "h": pa.array(h.astype(np.int64)),
                "key": pa.array(keys.astype(np.int64)),
            }
        )

    parts = ds.map_batches(block_bottom, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return ds.limit(0)
    hk = parts.drop_duplicates(subset=["key"]).sort_values(
        ["h", "key"], kind="mergesort"
    )
    selected = pa.array(hk["key"].to_numpy()[:k].astype(np.int64))
    sel_ref = ray.put(selected)

    def keep(batch: pa.Table) -> pa.Table:
        v = _hash_key_values(batch, key_col)
        mask = pc.is_in(pa.array(v.astype(np.int64)), value_set=ray.get(sel_ref))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def fuzzy_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    left_id: str = "left_id",
    right_id: str = "right_id",
    max_dist: int = 1,
    max_block: int = 10_000,
) -> rd.Dataset:
    """Edit-distance record linkage: every (left row, right row) pair
    whose ``on`` strings are within edit distance ``max_dist`` —
    EXACT, via SymSpell deletion-neighborhood blocking (two strings
    within ED<=1 necessarily share a 1-deletion variant; public idea,
    the same one the query-typo expander uses). Only ``max_dist=1``
    ships: it is the exact tier; larger radii square the variant fan-
    out and are better served by the n-gram ``jaccard_pairs`` join.

    Distributed shape: each side emits (variant-hash, side, id, value)
    rows — variants are generated per DISTINCT value per batch
    (dictionary-encoded first), so the cost tracks the batch
    vocabulary, not the row count — then ONE hash exchange groups
    shared variants, reducers emit verified (ED<=1, exact check)
    candidate pairs, and a second narrow exchange on the packed pair
    key dedups pairs that share several variants. Result:
    (left_id, right_id, <on>_left, <on>_right, dist), deterministic.

    ``max_block``: loud rail on a variant group's pair fan-out (very
    short strings collapse onto few variants; filter them out or
    pre-block on length before joining)."""
    from ..shuffle import hash_group_apply
    from ..tokenizer import ed_le1

    if max_dist != 1:
        raise ValueError(
            "fuzzy_join: only max_dist=1 is supported (exact deletion-"
            "neighborhood tier); use jaccard_pairs for coarser radii"
        )

    def variants_fn(side: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch[on]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            # null join values match nothing (SQL semantics) — and a
            # null survives dictionary_encode as a null INDEX, which
            # would poison the code array below
            live = pc.is_valid(vals)
            if not pc.all(live).as_py():
                batch = batch.filter(live)
                vals = batch[on]
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
            idc = batch[id_col]
            if isinstance(idc, pa.ChunkedArray):
                idc = idc.combine_chunks()
            if idc.null_count:
                # a null id would make this batch's to_numpy float64
                # (rid schema drift across blocks + NaN crashing the
                # pair reduce far from the cause — review finding)
                raise ValueError(
                    f"fuzzy_join: {id_col!r} contains nulls — ids must "
                    "be non-null int64"
                )
            ids = idc.cast(pa.int64()).to_numpy(zero_copy_only=False)
            denc = vals.dictionary_encode()
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            codes = denc.indices.to_numpy(zero_copy_only=False)
            uniq = denc.dictionary.to_pylist()
            # per-distinct-value variant lists (value + DISTINCT
            # 1-deletions: doubled letters repeat a variant, which
            # would inflate exchange rows and the fan-out rail)
            uvars: list[list[str]] = []
            for v in uniq:
                uvars.append(
                    list(
                        dict.fromkeys(
                            [v] + [v[:i] + v[i + 1:] for i in range(len(v))]
                        )
                    )
                )
            # vectorized emission: flatten the per-VALUE variant lists
            # once, then np.repeat/take per OCCURRENCE — the previous
            # per-row x per-variant Python loop ran ~|rows| x |value|
            # list appends per batch (review finding)
            nvars = np.array([len(v) for v in uvars], dtype=np.int64)
            flat_vars = pa.array(
                [v for vs in uvars for v in vs], type=pa.string()
            )
            var_offs = np.concatenate(([0], np.cumsum(nvars)))
            row_counts = nvars[codes]
            total = int(row_counts.sum())
            # variant index per emitted row: per-occurrence arange
            # offset to its value's variant block
            starts = np.repeat(var_offs[codes], row_counts)
            local = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(row_counts)[:-1])), row_counts
            )
            vidx = starts + local
            rows_rep = np.repeat(np.arange(len(codes)), row_counts)
            return pa.table(
                {
                    "vkey": flat_vars.take(pa.array(vidx)),
                    "side": pa.array(np.full(total, side, dtype=np.int8)),
                    "rid": pa.array(ids[rows_rep]),
                    "val": denc.dictionary.take(pa.array(codes[rows_rep])),
                }
            )

        return fn

    lrows = left.map_batches(variants_fn(0, left_id), batch_format="pyarrow")
    rrows = right.map_batches(variants_fn(1, right_id), batch_format="pyarrow")
    both = lrows.union(rrows)

    def pair_reduce(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                left_id: pa.array([], type=pa.int64()),
                right_id: pa.array([], type=pa.int64()),
                f"{on}_left": pa.array([], type=pa.string()),
                f"{on}_right": pa.array([], type=pa.string()),
                "dist": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        out_l, out_r, out_lv, out_rv, out_d = [], [], [], [], []
        for _, g in df.groupby("vkey", sort=False):
            ls = g[g["side"] == 0]
            rs = g[g["side"] == 1]
            if ls.empty or rs.empty:
                continue
            # dedup (id, value) within the group BEFORE the fan-out
            # rail so duplicate variant rows never trip it
            ls = ls.drop_duplicates(subset=["rid"])
            rs = rs.drop_duplicates(subset=["rid"])
            if len(ls) * len(rs) > max_block:
                raise ValueError(
                    f"fuzzy_join: variant group {g['vkey'].iloc[0]!r} fans "
                    f"out to {len(ls) * len(rs)} pairs (> max_block="
                    f"{max_block}); pre-filter very short strings or "
                    "pre-block on length"
                )
            for lid, lval in zip(ls["rid"], ls["val"]):
                for rid, rval in zip(rs["rid"], rs["val"]):
                    if ed_le1(lval, rval):
                        out_l.append(lid)
                        out_r.append(rid)
                        out_lv.append(lval)
                        out_rv.append(rval)
                        out_d.append(0 if lval == rval else 1)
        if not out_l:
            return empty
        return pa.table(
            {
                left_id: pa.array(np.asarray(out_l, dtype=np.int64)),
                right_id: pa.array(np.asarray(out_r, dtype=np.int64)),
                f"{on}_left": pa.array(out_lv, type=pa.string()),
                f"{on}_right": pa.array(out_rv, type=pa.string()),
                "dist": pa.array(np.asarray(out_d, dtype=np.int64)),
            }
        )

    cand = hash_group_apply(both, "vkey", pair_reduce)

    def add_pair_key(t: pa.Table) -> pa.Table:
        li = t[left_id].to_numpy(zero_copy_only=False).view(np.uint64)
        ri = t[right_id].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            pk = (li * np.uint64(0x9E3779B97F4A7C15) ^ ri).view(np.int64)
        return t.append_column("pkey", pa.array(pk))

    def dedup_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["pkey"]) if "pkey" in t.column_names else t
        df = t.to_pandas().drop_duplicates(subset=[left_id, right_id])
        return pa.Table.from_pandas(
            df.drop(columns=["pkey"]), preserve_index=False
        )

    return hash_group_apply(
        cand.map_batches(add_pair_key, batch_format="pyarrow"),
        "pkey",
        dedup_reduce,
    )
