"""Replay the driver's correctness gate locally.

For every ``queries()`` entry with a matching ``oracle_sql()`` string,
run the Ray pipeline AND the DuckDB oracle over the same sf directory,
sort columns by name (the driver does), and compare row count, schema
and a value hash. Rows-only entries are run for row count + schema
stability only.

Usage:  python tools/selfcheck.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            h.update(s.astype(str).str.cat(sep="\x1f").encode())
        else:
            h.update(s.to_numpy().tobytes())
        h.update(str(s.dtype).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = _to_pandas(fn(sf_dir))
            if name in oracles:
                mine = _canon(mine)
        except Exception as ex:  # noqa: BLE001
            print(f"{name:24s} ENGINE ERROR: {ex}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only  rows={len(mine)}  {time.time()-t0:.1f}s")
            continue
        try:
            gold = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:  # noqa: BLE001
            print(f"{name:24s} ORACLE ERROR: {ex}")
            fails.append(name)
            continue
        rows_ok = len(mine) == len(gold)
        cols_ok = list(mine.columns) == list(gold.columns)
        hash_ok = rows_ok and cols_ok and _hash(mine) == _hash(gold)
        status = "OK" if hash_ok else "FAIL"
        print(
            f"{name:24s} {status}  rows={len(mine)}/{len(gold)} "
            f"cols_ok={cols_ok} hash_ok={hash_ok}  {time.time()-t0:.1f}s"
        )
        if not hash_ok:
            fails.append(name)
            if not rows_ok or not cols_ok:
                print(f"  mine cols: {list(mine.columns)} dtypes={list(mine.dtypes)}")
                print(f"  gold cols: {list(gold.columns)} dtypes={list(gold.dtypes)}")
            else:
                for col in mine.columns:
                    if _hash(mine[[col]]) != _hash(gold[[col]]):
                        print(f"  col {col}: dtypes {mine[col].dtype} vs {gold[col].dtype}")
                        neq = mine[col].ne(gold[col])
                        print(f"    {int(neq.sum())} differing values; first few:")
                        print(mine[neq][[col]].head(3))
                        print(gold[neq][[col]].head(3))
    print(f"\n{'ALL GREEN' if not fails else 'FAILS: ' + ', '.join(fails)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
