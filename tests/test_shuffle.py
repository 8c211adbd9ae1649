"""Unit tests for the raw-task hash-partition exchange
(pisa_ray/shuffle.py) — the engine's groupby-replacement primitive.

Reducers are defined INSIDE the tests: functions at a test module's
top level pickle by reference (qualname) and Ray workers cannot import
``test_shuffle``; nested functions pickle by value — the same reason
the library's call sites use closures.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pisa_ray.shuffle import (
    hash_group_apply,
    hash_group_exchange,
    exchange_routable,
    popcount64,
    run_starts,
)


def _make_count_reduce():
    """Build the (k -> sum v) whole-shard reducer as a closure so
    cloudpickle ships it by value."""

    def count_reduce(t: pa.Table) -> pa.Table:
        from pisa_ray.shuffle import run_starts as rs

        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        starts = rs(ks)
        first = np.flatnonzero(starts)
        sums = np.add.reduceat(vs, first) if ks.size else np.empty(0, dtype=v.dtype)
        return pa.table(
            {
                "k": pa.array(ks[starts], type=pa.int64()),
                "s": pa.array(sums.astype(np.int64)),
            }
        )

    return count_reduce


def test_exchange_groups_all_rows_of_a_key_together():
    n = 10_000
    df = pd.DataFrame({"k": np.arange(n) % 137, "v": np.ones(n, dtype=np.int64)})
    for nparts in (1, 13):
        ds = rd.from_pandas(df).repartition(nparts)
        out = (
            hash_group_apply(ds, "k", _make_count_reduce())
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert len(out) == 137
        assert (out["s"].to_numpy() == np.bincount(df["k"] % 137)).all()


def test_exchange_empty_and_single_row():
    empty = rd.from_arrow(
        pa.table(
            {"k": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )
    )
    out = hash_group_apply(empty, "k", _make_count_reduce()).to_pandas()
    assert len(out) == 0
    one = rd.from_items([{"k": 5, "v": 3}])
    out = hash_group_apply(one, "k", _make_count_reduce()).to_pandas()
    assert out.to_dict("records") == [{"k": 5, "s": 3}]


def test_exchange_map_fn_fusion():
    ds = rd.from_pandas(pd.DataFrame({"x": np.arange(100, dtype=np.int64)}))

    def expand(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"k": pa.array(x % 7), "v": pa.array(np.ones(x.size, dtype=np.int64))}
        )

    refs = hash_group_exchange(ds, "k", _make_count_reduce(), map_fn=expand)
    import ray

    out = pa.concat_tables(ray.get(refs)).to_pandas().sort_values("k")
    assert (out["s"].to_numpy() == np.bincount(np.arange(100) % 7)).all()


def test_exchange_routable_detection():
    ds = rd.from_items([{"k": 1, "s": "a", "f": 1.5}])
    assert exchange_routable(ds, "k")
    assert exchange_routable(ds, "s")  # strings route via FNV hash
    assert not exchange_routable(ds, "f")  # float keys still fall back


def test_popcount64_matches_python():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**63, size=257, dtype=np.uint64)
    want = np.array([bin(int(v)).count("1") for v in x])
    assert (popcount64(x) == want).all()
    assert popcount64(np.empty(0, dtype=np.uint64)).size == 0


def test_run_starts():
    a = np.array([1, 1, 2, 2, 2, 3])
    b = np.array([0, 0, 0, 1, 1, 1])
    assert run_starts(a).tolist() == [True, False, True, False, False, True]
    assert run_starts(a, b).tolist() == [True, False, True, True, False, True]
    assert run_starts(np.empty(0, dtype=np.int64)).size == 0
