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


def test_exchange_n_red_one_is_clamped():
    """Explicit n_red=1 used to crash (Ray num_returns=1 yields a bare
    ObjectRef, not a list); the clamp keeps the gather shape valid."""
    from pisa_ray.shuffle import hash_group_apply

    ds = rd.from_items([{"k": i % 3, "v": i} for i in range(30)])

    def total(t):
        import pyarrow as pa

        ks = t["k"].to_numpy(zero_copy_only=False)
        vs = t["v"].to_numpy(zero_copy_only=False)
        u = np.unique(ks)
        s = np.array([vs[ks == x].sum() for x in u])
        return pa.table({"k": u, "s": s})

    out = (
        hash_group_apply(ds, "k", total, n_red=1)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [0, 1, 2]
    assert out["s"].tolist() == [135, 145, 155]


def test_exchange_routable_missing_column_returns_false():
    from pisa_ray.shuffle import exchange_routable

    ds = rd.from_items([{"k": 1}])
    assert not exchange_routable(ds, "no_such_col")


def test_hash_group_apply_empty_inputs_keep_reducer_schema():
    """Empty inputs — 0-row blocks, schema-less degenerates, AND the
    zero-block case the round-4 review flagged (it used to pass the
    INPUT dataset through) — must come out with the reducer's schema.
    Per the module contract, reduce_fn supplies its schema on an
    empty table."""
    import pyarrow as pa

    from pisa_ray.shuffle import hash_group_apply

    OUT = pa.schema([("key", pa.int64()), ("n", pa.int64())])

    def mapper(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT.empty_table()
        return pa.table(
            {"key": t["doc_id"], "n": pa.array([1] * t.num_rows, pa.int64())}
        )

    def reducer(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT.empty_table()
        return t

    # (a) 0-row / schema-degenerate blocks (filter drops everything)
    empty_blocks = rd.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    ).filter(lambda r: False).materialize()
    out = hash_group_apply(empty_blocks, "key", reducer, map_fn=mapper)
    assert out.schema().names == ["key", "n"]
    assert out.count() == 0
    # (b) genuinely zero-block dataset
    zero_blocks = rd.from_items([]).materialize()
    n_blocks = sum(1 for b in zero_blocks.iter_internal_ref_bundles()
                   for _ in b.blocks)
    out2 = hash_group_apply(zero_blocks, "key", reducer, map_fn=mapper)
    if n_blocks == 0 and out2.schema() is not None:
        assert out2.schema().names == ["key", "n"]
    assert out2.count() == 0


def test_manifest_concurrent_mark_and_save(tmp_path):
    """save() now locks (review finding): a bare save() racing
    threaded mark_partition must never publish truncated JSON or
    crash on a mutating dict."""
    import json
    import threading

    from pisa_ray.checkpoint import Manifest

    man = Manifest(str(tmp_path))
    stop = threading.Event()
    errs = []

    def marker(tid: int):
        try:
            for i in range(200):
                man.mark_partition("tokenize", f"t{tid}_{i}", rows=i)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    def saver():
        try:
            while not stop.is_set():
                man.save()
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=marker, args=(t,)) for t in range(4)]
    sv = threading.Thread(target=saver)
    sv.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    sv.join()
    assert not errs
    # the published file parses and holds every mark
    with open(man.path) as f:
        data = json.load(f)
    parts = data["stages"]["tokenize"]["partitions"]
    assert len(parts) == 800
