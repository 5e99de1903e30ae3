#!/usr/bin/env python3
"""Single-query DuckDB oracle check — the sf1 gating form.

Usage: python3 tools/check_one.py <sfDir> <verifyOutDir> <query>

check.py's one connection accumulates memory across the heavy
list-valued oracles and OOMs at sf1 (SURVEY §7, r11); this runs ONE
query in its own process with a DuckDB memory ceiling and a spill
directory, so the sf1 gate is a shell loop of independent processes.
Comparison logic matches check.py exactly.
Dev-tool only (driver-side python libs); not part of the shipped library.
"""
import json
import sys

import duckdb

sys.path.insert(0, "tools")
from check import TABLES, norm  # noqa: E402


def main() -> int:
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='target/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    want = con.execute(sql).df()
    g, w = norm(got), norm(want)
    assert list(g.columns) == list(w.columns), \
        f"columns {list(g.columns)} != {list(w.columns)}"
    assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
    for c in g.columns:
        a, b = g[c], w[c]
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            raise AssertionError(
                f"col {c} mismatch at row {i}: spark={a[i]!r} duck={b[i]!r} "
                f"({int((~eq).sum())} rows differ)")
    print(f"  OK {name} ({len(g)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
