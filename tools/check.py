#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against the DuckDB oracle from oracle_sql.json,
with sfDir tables registered as views. Usage: check.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()]
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(got)} rows "
              f"{'OK' if len(got) > 0 else 'EMPTY!'}")
        if len(got) == 0:
            fails += 1
        continue
    try:
        exp_rel = con.sql(oracle[name])
        exp = exp_rel.fetchall()
        exp_cols = exp_rel.columns
    except Exception as e:
        print(f"  [FAIL] {name}: oracle SQL error: {e}")
        fails += 1
        continue
    # driver sorts columns by name before hashing values
    def norm(rows, cs):
        order = sorted(range(len(cs)), key=lambda i: cs[i])
        return [tuple(r[i] for i in order) for r in rows], sorted(cs)
    g, gc = norm(got, cols)
    e, ec = norm(exp, exp_cols)
    if gc != ec:
        print(f"  [FAIL] {name}: columns {gc} vs oracle {ec}")
        fails += 1
    elif g != e:
        print(f"  [FAIL] {name}: {len(g)} vs {len(e)} rows; first diff:")
        for i, (a, b) in enumerate(zip(g, e)):
            if a != b:
                print(f"      row {i}: got {a!r}\n           exp {b!r}")
                break
        else:
            print(f"      row-count mismatch only; got[-1]={g[-1] if g else None!r} exp[-1]={e[-1] if e else None!r}")
        fails += 1
    else:
        print(f"  [ok] {name}: {len(g)} rows match")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
