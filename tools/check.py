#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run
graft.Verify via sbt, then compare each query's parquet dump against the
DuckDB oracle SQL on the same test tables. Dev-only (driver-side python)."""
import json, math, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"): return v.isoformat()
    return v

n_pass = n_fail = 0
for name in sorted(oracle):
    qdir = f"{out_dir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        theirs = con.sql(oracle[name])
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    mc, tc = sorted(mine.columns), sorted(theirs.columns)
    if [c.lower() for c in mc] != [c.lower() for c in tc]:
        print(f"FAIL {name}: columns {mc} vs {tc}"); n_fail += 1; continue
    mrows = [tuple(canon(v) for v in r) for r in mine.select(", ".join(f'"{c}"' for c in mc)).fetchall()]
    trows = [tuple(canon(v) for v in r) for r in theirs.select(", ".join(f'"{c}"' for c in tc)).fetchall()]
    if mrows == trows:
        print(f"PASS {name} ({len(mrows)} rows)"); n_pass += 1
    elif sorted(map(repr, mrows)) == sorted(map(repr, trows)):
        print(f"ORDER-ONLY-DIFF {name} ({len(mrows)} rows)"); n_fail += 1
    else:
        print(f"FAIL {name}: rows differ (mine={len(mrows)}, oracle={len(trows)})")
        onlym = [r for r in mrows if r not in trows][:3]
        onlyt = [r for r in trows if r not in mrows][:3]
        for r in onlym: print(f"   mine only: {r}")
        for r in onlyt: print(f" oracle only: {r}")
        n_fail += 1

# rows-only queries
import pathlib
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = pathlib.Path(qdir).name
    if name in oracle: continue
    try:
        n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    except Exception as e:
        print(f"ROWS {name}: unreadable: {e}")

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
