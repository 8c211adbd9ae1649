"""Hash-partition exchange for group-apply reducers.

``ray.data.Dataset.groupby(key).map_groups(fn)`` invokes the UDF once
PER GROUP (table slice + format conversion + UDF call each time). For
high-cardinality keys where almost every group is a singleton — LSH
band buckets, content hashes, shingles — the per-group overhead
dominates the useful work by an order of magnitude (measured 6.2 s vs
~0.1 s of numpy for 40k MinHash band rows).

This module expresses the same exchange as raw Ray tasks, the pattern
proven by ``build._fused_shuffle_merge``: map tasks partition each
block's rows by a mixed hash of the key column into ``n_red`` reducer
shards (one radix argsort, then zero-copy slices — Ray's Arrow
serializer truncates slices on put, so each shard ships only its own
bytes); each reducer concatenates its shards and calls ONE vectorized
``reduce_fn`` over the whole shard. Every row with a given key value
lands in exactly one reducer, so ``reduce_fn`` sees all rows of each
of its keys together — it does its own (vectorized) grouping, e.g. a
lexsort + run detection, or one pandas groupby per shard.

Scale shape (100 TB): identical data movement to any hash shuffle —
each row crosses the exchange once; ``n_red`` defaults to 2x the
cluster's cores so each reducer holds rows/n_red (spillable). Map and
reduce tasks are pure and deterministic (fixed hash, stable sorts), so
lineage retries are safe and results are parallelism-invariant.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_TASKS = None


def _mix64(u: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 — decorrelates structured keys (sequential ids,
    band-tagged hashes) from the ``% n_red`` partition rule."""
    with np.errstate(over="ignore"):
        u = u ^ (u >> np.uint64(33))
        u = u * np.uint64(0xFF51AFD7ED558CCD)
        u = u ^ (u >> np.uint64(33))
        u = u * np.uint64(0xC4CEB9FE1A85EC53)
        u = u ^ (u >> np.uint64(33))
    return u


def _key_u64(tbl: pa.Table, key_col: str) -> np.ndarray:
    """uint64 ROUTING value per row of the key column.

    Any dtype works: integers view as uint64; temporal types cast to
    their int64 epoch representation; string/binary keys get a
    vectorized FNV-1a over their bytes. A hash collision between two
    distinct keys only co-locates them on one reducer — reduce_fn
    groups by the REAL key column, so results are unaffected.

    Null keys are rejected loudly: the routing value of a null is
    arbitrary (and pandas groupby silently drops NaN keys inside
    shard reducers), so a null-keyed row could vanish or land
    nondeterministically.
    """
    col = tbl[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise TypeError(
            f"hash_group_apply key column {key_col!r} contains nulls; "
            "filter or fill them before the exchange"
        )
    t = col.type
    if pa.types.is_dictionary(t):
        col = col.cast(t.value_type)
        t = col.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        from .pipelines.text import fnv1a_batch  # lazy: avoids cycle

        b = col.cast(pa.large_binary())
        buf_off, buf_data = b.buffers()[1], b.buffers()[2]
        offs = np.frombuffer(buf_off, dtype=np.int64,
                             count=len(b) + 1, offset=8 * b.offset)
        data = (np.frombuffer(buf_data, dtype=np.uint8)
                if buf_data is not None else np.zeros(0, np.uint8))
        return fnv1a_batch(data[offs[0]:offs[-1]], offs - offs[0])
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        col = col.cast(pa.int64())
    k = col.to_numpy(zero_copy_only=False)
    if k.dtype == np.uint64:
        return k
    if k.dtype.kind in "iu":
        return k.astype(np.int64, copy=False).view(np.uint64)
    if k.dtype.kind == "b":
        return k.astype(np.uint64)
    raise TypeError(
        f"hash_group_apply key column {key_col!r} has unsupported "
        f"routing dtype {k.dtype}"
    )


def _task_fns():
    global _TASKS
    if _TASKS is not None:
        return _TASKS

    @ray.remote
    def hp_map(key_col: str, n_red: int, map_fn, *blocks):
        # upstream pandas-block stages yield DataFrame blocks; the
        # exchange runs on Arrow
        blocks = [
            b
            if isinstance(b, pa.Table)
            else pa.Table.from_pandas(b, preserve_index=False)
            for b in blocks
        ]
        # a repartition wider than the row count yields COLUMN-LESS
        # empty blocks (no schema): they carry nothing and would crash
        # map_fn / the key lookup — drop them here. If nothing remains,
        # emit 0-column shards; hp_reduce filters those and reduce_fn's
        # empty-table branch supplies the output schema.
        blocks = [b for b in blocks if b.num_columns]
        if not blocks:
            return tuple(pa.table({}) for _ in range(n_red))
        if map_fn is not None:
            blocks = [map_fn(b) for b in blocks]
        live = [b for b in blocks if b.num_rows]
        if not live:
            empty = blocks[0].slice(0, 0)
            return tuple(empty for _ in range(n_red))
        t = pa.concat_tables(live).combine_chunks() if len(live) > 1 else live[0]
        pid = (_mix64(_key_u64(t, key_col)) % np.uint64(n_red)).astype(np.int64)
        order = np.argsort(pid, kind="stable")
        t = t.take(order)
        bounds = np.searchsorted(pid[order], np.arange(n_red + 1))
        # zero-copy slices: Ray truncates sliced tables on put
        return tuple(
            t.slice(int(s), int(e - s)) for s, e in zip(bounds[:-1], bounds[1:])
        )

    @ray.remote
    def hp_reduce(reduce_fn, *shards: pa.Table) -> pa.Table:
        live = [s for s in shards if s.num_columns]
        t = (
            pa.concat_tables(live).combine_chunks() if live else pa.table({})
        )
        return reduce_fn(t)

    _TASKS = (hp_map, hp_reduce)
    return _TASKS


def hash_group_exchange(
    ds: rd.Dataset,
    key_col: str,
    reduce_fn: Callable[[pa.Table], pa.Table],
    n_red: int | None = None,
    map_fn: Callable[[pa.Table], pa.Table] | None = None,
) -> list:
    """Run the exchange; return the reducers' output-table ObjectRefs.

    ``reduce_fn(table) -> table`` receives every row of each key
    assigned to that reducer (all rows of a key value together, keys
    in no particular order) and must handle the empty table.

    ``map_fn(block) -> table``, when given, runs INSIDE each map task
    before partitioning — fusing a per-block transform (e.g. text ->
    LSH band rows) into the exchange so its output never round-trips
    through the object store as a separate stage. ``key_col`` refers
    to the map_fn OUTPUT. When sizing reducers automatically, the
    input's bytes stand in for the map output's.
    """
    hp_map, hp_reduce = _task_fns()
    mat = ds.materialize()
    # drop 0-row blocks (metadata-only check) while rows exist
    # elsewhere — they carry nothing. When EVERY block is empty, keep
    # them: an empty-but-schema'd input must still flow through
    # map_fn/reduce_fn so the output dataset gets the REDUCER's
    # schema, not the input's (hp_map/hp_reduce drop the column-less
    # degenerates a too-wide repartition creates).
    all_refs, refs = [], []
    for b in mat.iter_internal_ref_bundles():
        for r, m in b.blocks:
            all_refs.append(r)
            if m.num_rows is None or m.num_rows > 0:
                refs.append(r)
    refs = refs or all_refs
    if not refs:
        return []
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if n_red is not None:
        # num_returns=1 makes Ray yield a BARE ObjectRef (the sl[p]
        # gather below would TypeError) and 0 would divide in the
        # routing mod — clamp; two near-empty reducers cost nothing
        n_red = max(2, int(n_red))
    if n_red is None:
        # scale reducers with data, capped at 2x the cluster's cores:
        # ~32 MB of rows per reducer keeps small inputs from paying
        # thousands of near-empty task launches while 100-TB inputs
        # still fan out to the full cluster
        n_red = int(
            min(
                max(4, 2 * ncpu),
                max(4, (mat.size_bytes() or 0) // (32 << 20) + 1),
            )
        )
    n_map = max(4, 2 * ncpu)
    groups = [g for g in (refs[i::n_map] for i in range(n_map)) if g]
    shard_lists = [
        hp_map.options(num_returns=n_red).remote(key_col, n_red, map_fn, *g)
        for g in groups
    ]
    return [
        hp_reduce.remote(reduce_fn, *[sl[p] for sl in shard_lists])
        for p in range(n_red)
    ]


def hash_group_apply(
    ds: rd.Dataset,
    key_col: str,
    reduce_fn: Callable[[pa.Table], pa.Table],
    n_red: int | None = None,
    map_fn: Callable[[pa.Table], pa.Table] | None = None,
) -> rd.Dataset:
    """Dataset-in, Dataset-out form of :func:`hash_group_exchange` —
    the drop-in replacement for ``groupby(key).map_groups(per_group)``
    with a whole-shard vectorized reducer."""
    refs = hash_group_exchange(ds, key_col, reduce_fn, n_red, map_fn)
    if not refs:
        # ZERO-BLOCK input (not merely 0-row — those flow through the
        # exchange): still emit the REDUCER's schema, not the input's,
        # by driving an empty input-schema table through the same
        # map_fn -> reduce_fn path locally. Falls back to the input
        # dataset only when no schema is recoverable at all.
        sch = ds.schema()
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if isinstance(base, pa.Schema):
            empty = base.empty_table()
            if map_fn is not None:
                empty = map_fn(empty)
            return rd.from_arrow(reduce_fn(empty))
        return ds
    return rd.from_arrow_refs(refs)


def exchange_routable(ds: rd.Dataset, key_col: str) -> bool:
    """True when ``key_col``'s dtype can be routed by ``_key_u64`` —
    integer, boolean, string/binary (vectorized FNV routing hash),
    temporal, or a dictionary over those. Callers keep a
    ``map_groups`` fallback only for the remainder (e.g. float keys)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if hasattr(base, "field"):
        try:
            t = base.field(key_col).type
        except KeyError:
            # match the pandas-block branch's contract: a missing key
            # column reads as not-routable, so callers fall back to
            # map_groups (which raises ITS clear error) instead of a
            # KeyError out of the predicate
            return False
        if pa.types.is_dictionary(t):
            t = t.value_type
        return (
            pa.types.is_integer(t)
            or pa.types.is_boolean(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
            or pa.types.is_time(t)
        )
    try:
        i = list(base.names).index(key_col)
        d = np.dtype(base.types[i])
        return (
            np.issubdtype(d, np.integer)
            or np.issubdtype(d, np.bool_)
            or np.issubdtype(d, np.str_)
            or np.issubdtype(d, np.datetime64)
            # pandas blocks surface strings as object dtype; a truly
            # unhashable object column fails loudly in _key_u64
            or d == np.dtype(object)
        )
    except (ValueError, TypeError):
        return False


def run_starts(*sorted_keys: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each equal-key run in
    already-sorted parallel key arrays."""
    n = sorted_keys[0].size
    starts = np.ones(n, dtype=bool)
    if n > 1:
        neq = np.zeros(n - 1, dtype=bool)
        for k in sorted_keys:
            neq |= k[1:] != k[:-1]
        starts[1:] = neq
    return starts


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no
    ``bitwise_count``)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1).astype(np.int64)


def sorted_lookup(
    haystack: np.ndarray, probes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(hit mask, clamped insert positions) of ``probes`` against an
    ASCENDING-sorted ``haystack`` — the clamped-searchsorted membership
    idiom, centralized (empty haystack and past-the-end probes are
    safe). ``positions[i]`` indexes the matching haystack element
    wherever ``hit[i]`` is True; it is meaningless where False."""
    if haystack.size == 0:
        return (
            np.zeros(probes.size, dtype=bool),
            np.zeros(probes.size, dtype=np.int64),
        )
    pos = np.minimum(np.searchsorted(haystack, probes), haystack.size - 1)
    return haystack[pos] == probes, pos


def sorted_isin(haystack: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """Membership of ``probes`` in an ASCENDING-sorted ``haystack``."""
    return sorted_lookup(haystack, probes)[0]
