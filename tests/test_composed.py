"""Composed analytics pipelines: TPC-H-shaped queries built ONLY from
the repo's operators (broadcast/hash joins, the exchange, global_topk),
each value-checked against DuckDB running the equivalent SQL over the
same parquet. These are the 'a user of the reference could run every
pipeline they run today' demonstrations — multi-join + aggregate +
top-k plans, not single operators."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _make_revenue():
    # defined per-test as a closure: test modules aren't importable on
    # Ray workers, so kernels must serialize by value
    def _revenue(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        return batch.append_column("revenue", rev)

    return _revenue


def test_q3_shaped_segment_revenue_topk():
    """Q3 shape: segment-filtered customers -> their orders (semi-join)
    -> lineitem revenue per order (large x large hash join + grouped
    sum through the exchange) -> global top-10 without a global sort."""
    from pisa_ray.pipelines.relational import (
        broadcast_semi_join,
        global_topk,
        hash_join,
    )
    from pisa_ray.shuffle import hash_group_apply

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = cust["c_mktsegment"][0].as_py()
    keys = cust.filter(
        pa.compute.equal(cust["c_mktsegment"], seg)
    )["c_custkey"].to_pylist()

    orders = broadcast_semi_join(
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]),
        keys,
        "o_custkey",
    )
    li = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_make_revenue(), batch_format="pyarrow")

    joined = hash_join(
        li.select_columns(["l_orderkey", "revenue"]),
        orders.select_columns(["o_orderkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="semi",
    )

    def sum_rev(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("l_orderkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    per_order = hash_group_apply(joined, "l_orderkey", sum_rev)
    top = global_topk(per_order, ["revenue", "l_orderkey"], [False, True], 10)

    want = duckdb.sql(
        f"""
        SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM '{SF}/lineitem.parquet'
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM '{SF}/orders.parquet'
            WHERE o_custkey IN (
                SELECT c_custkey FROM '{SF}/customer.parquet'
                WHERE c_mktsegment = '{seg}')
        )
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    ).df()
    got = top.reset_index(drop=True)
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    np.testing.assert_allclose(got["revenue"], want["revenue"], rtol=1e-12)


def test_q10_shaped_returned_revenue_by_nation():
    """Q10 shape: returned lineitems -> orders (hash join) -> customer
    nation (broadcast joins) -> grouped revenue by nation name."""
    from pisa_ray.pipelines.relational import broadcast_inner_join, hash_join
    from pisa_ray.shuffle import hash_group_apply

    li = (
        rd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        .filter(expr="l_returnflag == 'R'")
        .map_batches(_make_revenue(), batch_format="pyarrow")
        .select_columns(["l_orderkey", "revenue"])
    )
    joined = hash_join(
        li,
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
        how="inner",
    )
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas().rename(columns={"c_custkey": "o_custkey"})
    nation = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().rename(columns={"n_nationkey": "c_nationkey"})
    with_nation = broadcast_inner_join(
        broadcast_inner_join(joined, cust, on="o_custkey"), nation, on="c_nationkey"
    )

    def sum_rev(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("n_name", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    got = (
        hash_group_apply(with_nation.select_columns(["n_name", "revenue"]), "n_name", sum_rev)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY n_name ORDER BY n_name
        """
    ).df()
    assert got["n_name"].tolist() == want["n_name"].tolist()
    np.testing.assert_allclose(got["revenue"], want["revenue"], rtol=1e-12)
