"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` through DuckDB on the same
sf dir, compare row count + columns + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
    else:
        df = pd.DataFrame(res)
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"[FAIL] {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            expect = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        ok = True
        if list(got.columns) != list(expect.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(expect.columns)}")
            ok = False
        elif len(got) != len(expect):
            print(f"[FAIL] {name}: rows {len(got)} vs {len(expect)}")
            ok = False
        else:
            eq = got.equals(expect)
            if not eq:
                diff_cols = [c for c in got.columns if not got[c].equals(expect[c])]
                print(f"[FAIL] {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    neq = got[c] != expect[c]
                    idx = neq[neq].index[:3]
                    for i in idx:
                        print(f"    row {i} {c}: got={got[c][i]!r} expect={expect[c][i]!r}")
                ok = False
        if ok:
            print(f"[ok] {name}: {len(got)} rows match")
        else:
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
