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
    # asserted preconditions (r15 VERDICT #8): the environment discipline
    # that the r15 OOM drift was diagnosed by A/B to require must fail
    # LOUD here, not spuriously downstream.
    if len(sys.argv) != 4:
        print("usage: check_one.py <sfDir> <verifyOutDir> <name>  "
              "(ONE query per process — loop names in shell)")
        return 2
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    # one-query-per-process discipline: a comma list means a caller is
    # trying to batch queries through one connection — the exact shape
    # that accumulates heavy list-valued oracle state and OOMs at sf1
    assert "," not in name, (
        "check_one takes ONE query name per invocation; loop in shell "
        "(per-process memory discipline, r15 A/B)")
    con = duckdb.connect()
    # 64GB default: the sf1 recursive reach-closure oracles pin structures
    # DuckDB cannot spill (r15 A/B: the UNCHANGED r14 oracle text OOM'd at
    # the old 24GB cap on a quiet box — environment drift, not an oracle
    # change); the box has 125G and this tool runs one query per process.
    # NEVER co-run this gate with sf10 Spark jobs — three heavy jobs on
    # one box produced two spurious OOMs in r15 before serializing.
    # GRAFT_DUCK_MEM raises the cap and GRAFT_DUCK_THREADS lowers the
    # thread count for the r16 laddered-fit serving oracles: their
    # per-thread list-aggregate state is the memory MULTIPLIER — at the
    # default 32 threads the sf10 fit unroll OOMs even at 100GB solo,
    # while 12 threads complete in ~12 min at a ~36G peak (measured
    # r16 A/B). Use 100GB + 12 threads, SOLO on an idle box.
    import os
    req = os.environ.get("GRAFT_DUCK_MEM", "64GB")
    assert req.endswith("GB") and req[:-2].isdigit(), (
        f"GRAFT_DUCK_MEM must be '<int>GB', got {req!r}")
    con.execute(f"SET memory_limit='{req}'")
    thr = os.environ.get("GRAFT_DUCK_THREADS")
    if thr is not None:
        assert thr.isdigit() and int(thr) >= 1, (
            f"GRAFT_DUCK_THREADS must be a positive int, got {thr!r}")
        con.execute(f"SET threads={int(thr)}")
    # GRAFT_DUCK_NO_ORDER=1 disables preserve_insertion_order — THE fix
    # for the laddered-fit oracles (r16 A/B): order preservation forces
    # full pipeline materialization and DuckDB's buffer ACCOUNTING (not
    # RSS — the box showed 43G used at the 100GB-limit abort) overruns
    # any cap; with it off the sf10 fit unroll completes in ~14 min.
    # Always safe here: the compare sorts rows (norm), so row order can
    # never change a verdict.
    if os.environ.get("GRAFT_DUCK_NO_ORDER") == "1":
        con.execute("SET preserve_insertion_order=false")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    eff = con.execute("SELECT current_setting('memory_limit')").fetchone()[0]
    # Parse the echoed value NUMERICALLY (r16 ADVICE): DuckDB's string
    # rendering (unit choice, rounding, spacing) is a display detail that
    # drifts across versions — exact string equality would spuriously
    # fail every gate on a formatting change even though the limit took.
    units = {"KIB": 2**10, "MIB": 2**20, "GIB": 2**30, "TIB": 2**40,
             "KB": 10**3, "MB": 10**6, "GB": 10**9, "TB": 10**12, "B": 1}
    parts = eff.strip().upper().split()
    val, unit = (parts[0], parts[1]) if len(parts) == 2 else (
        eff.strip().upper().rstrip("KMGTIB"),
        eff.strip().upper().lstrip("0123456789. "))
    eff_bytes = float(val) * units[unit]
    want_bytes = int(req[:-2]) * 10**9
    assert abs(eff_bytes - want_bytes) <= 0.01 * want_bytes, (
        f"memory_limit did not take (got {eff!r} ≈ {eff_bytes:.0f} B, "
        f"want ~{want_bytes} B) — DuckDB env drift; re-verify the r15 "
        "A/B sizing before trusting any sf1+ gate")
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
