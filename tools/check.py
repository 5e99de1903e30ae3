#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir tables, sorts columns by name + rows, and compares exactly.
Dev-tool only (driver-side python libs); not part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(f"columns {list(g.columns)} != {list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            for c in g.columns:
                a, b = g[c], w[c]
                if str(a.dtype) != str(b.dtype):
                    print(f"  [{name}] dtype note {c}: spark={a.dtype} duck={b.dtype}")
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    raise AssertionError(
                        f"col {c} mismatch at row {i}: spark={a[i]!r} duck={b[i]!r} "
                        f"({int((~eq).sum())} rows differ)")
            print(f"  OK {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"  FAIL {name}: {e}")
    print(f"{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
