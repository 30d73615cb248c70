#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the fixture parquet and compare with the Spark results that
graft.Verify wrote.

This mirrors the DRIVER's compare path (CORRECTNESS_r*.json): both
result sets are loaded into pandas, columns sorted by name, rows sorted
with DataFrame.sort_values over ALL columns, then cell-wise hashed.
Crucially that means:
  * array/map/struct-typed result columns make sort_values raise
    `TypeError: unhashable type: 'numpy.ndarray'` — reported here as an
    `err`, exactly like the driver. Queries must serialize non-scalar
    columns to strings on both sides.
  * dtype differences survive into the hash (int64 `2` vs float64 `2.0`
    hash differently), so e.g. DuckDB's sum→HUGEINT widening is caught
    locally instead of only at the gate.

Usage:
    python3 tools/check.py [sfDir] [verifyOutDir]
"""
import sys, os, json, math, hashlib
import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
ONLY = set(sys.argv[3:])  # optional: restrict to named queries
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon_cell(v):
    """Dtype-preserving canonical string for one cell (int 2 != float 2.0)."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # NaN canonicalizes to NULL deliberately: both result sets
            # reach the comparison through pandas float columns (ours
            # via duckdb .df(), the driver's likewise), where SQL NULL
            # in a DOUBLE column *is* np.nan — the distinction is
            # unobservable at the driver, so distinguishing it locally
            # would only create false-red local runs.
            return "NULL"
        return repr(round(f, 9))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if v is pd.NaT:
        return "NULL"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def frame_digest(df):
    """Sort columns by name, sort rows via sort_values on all columns
    (raises on unhashable/array cells, like the driver), hash cells."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for c in cols:
        for v in df[c].tolist():
            h.update(canon_cell(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return cols, h.hexdigest(), len(df)


n_pass = n_fail = 0
fails = []
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    sql = oracle[name]
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
        ddf = con.execute(sql).df()
        scols, shash, srows = frame_digest(sdf)
        dcols, dhash, drows = frame_digest(ddf)
    except Exception as e:
        n_fail += 1
        fails.append((name, f"ERR {type(e).__name__}: {e}"))
        continue
    if scols != dcols:
        n_fail += 1
        fails.append((name, f"SCHEMA spark={scols} duck={dcols}"))
    elif srows != drows:
        n_fail += 1
        fails.append((name, f"ROWS spark_n={srows} duck_n={drows}"))
    elif shash != dhash:
        # Re-derive a first-differing-row hint for debugging.
        hint = ""
        try:
            s2 = sdf[sorted(sdf.columns)].sort_values(
                by=sorted(sdf.columns), kind="mergesort").reset_index(drop=True)
            d2 = ddf[sorted(ddf.columns)].sort_values(
                by=sorted(ddf.columns), kind="mergesort").reset_index(drop=True)
            for i in range(len(s2)):
                a = tuple(canon_cell(v) for v in s2.iloc[i].tolist())
                b = tuple(canon_cell(v) for v in d2.iloc[i].tolist())
                if a != b:
                    hint = f" first_diff@{i}:\n    spark={a}\n    duck ={b}"
                    break
            if not hint:
                hint = (f" (cells equal after canon → dtype-only diff:"
                        f" spark={list(s2.dtypes)} duck={list(d2.dtypes)})")
        except Exception:
            pass
        n_fail += 1
        fails.append((name, f"HASH spark={shash} duck={dhash}{hint}"))
    else:
        n_pass += 1
        print(f"PASS {name} ({srows} rows)")

# Rows-only queries (dumped without an oracle). The declared allowlist
# is EMPTY since r16 — every gate entry is hash-checked — so ANY entry
# landing here is a regression (e.g. a dynOracle thunk that failed and
# degraded its entry): fail loudly instead of granting the weaker check.
ALLOWED_ROWS_ONLY: set[str] = set()
for name in sorted(os.listdir(OUT)):
    if name in oracle or not os.path.isdir(os.path.join(OUT, name)):
        continue
    if ONLY and name not in ONLY:
        continue
    if name not in ALLOWED_ROWS_ONLY:
        n_fail += 1
        fails.append((name, "entry has NO oracle SQL but the rows-only "
                            "allowlist is empty — dynOracle degraded?"))
        continue
    try:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}/*.parquet')").fetchone()[0]
        if n > 0:
            print(f"ROWS-ONLY {name} ({n} rows)")
        else:
            n_fail += 1
            fails.append((name, "ROWS-ONLY query produced 0 rows"))
    except Exception as e:
        n_fail += 1
        fails.append((name, f"ROWS-ONLY ERR: {e}"))

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
sys.exit(1 if n_fail else 0)
