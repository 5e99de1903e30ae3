#!/usr/bin/env python3
"""Single-query DuckDB gate (the check.py compare for ONE query).

Usage: python3 tools/check_one.py <sfDir> <verifyOutDir> <name>

One query per process (the sf1 discipline: a single connection
accumulating heavy list-valued oracles OOMs), memory-limited, with a
temp spill directory. Dev-tool only.
"""
import json
import sys

import duckdb

# TABLES/norm come from check.py (the script dir is on sys.path) so the
# single-query gate can never drift from the full gate's comparison —
# the per-process memory discipline lives HERE, not in a forked compare
from check import TABLES, norm


def main() -> int:
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    # 64GB: the sf1 recursive reach-closure oracles pin structures DuckDB
    # cannot spill (r15: the r14-form text OOM'd at 24GB too on a quiet
    # box — environment drift, not an oracle change); the box has 125G
    # and this dev tool runs one query per process by design
    con.execute("SET memory_limit='64GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    want = con.execute(sql).df()
    g, w = norm(got), norm(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
        return 1
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        return 1
    for c in g.columns:
        a, b = g[c], w[c]
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} duck={b[i]!r} "
                  f"({int((~eq).sum())} rows differ)")
            return 1
    print(f"OK {name} ({len(g)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
