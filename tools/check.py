#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the fixture parquet and compare with the Spark results that
graft.Verify wrote. Usage:
    python3 tools/check.py [sfDir] [verifyOutDir]
"""
import sys, os, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(round(val, 9))
    if isinstance(val, bool):
        return str(bool(val))
    if hasattr(val, "isoformat"):
        return val.isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

n_pass = n_fail = 0
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        scols = [d[0] for d in sdf.description]
        srows = sdf.fetchall()
        ddf = con.execute(sql)
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
    except Exception as e:
        n_fail += 1
        fails.append((name, f"EXEC ERROR: {e}"))
        continue
    sc, sr = canon_rows(scols, srows)
    dc, dr = canon_rows(dcols, drows)
    if sc != dc:
        n_fail += 1
        fails.append((name, f"SCHEMA spark={sc} duck={dc}"))
    elif sr != dr:
        n_fail += 1
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr + [None]*len(dr), dr + [None]*len(sr))) if a != b)
        fails.append((name, f"ROWS spark_n={len(sr)} duck_n={len(dr)} first_diff@{diff[0]}:\n    spark={diff[1]}\n    duck ={diff[2]}"))
    else:
        n_pass += 1
        print(f"PASS {name} ({len(sr)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
sys.exit(1 if n_fail else 0)
