#!/usr/bin/env python3
"""Dev-time rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by `graft.Verify`, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same base
tables, then compares: row count, column names (sorted), and a hash of
the value matrix with columns sorted by name and rows sorted by all
columns — mirroring what the driver does per TESTDATA.md/BASELINE.json.
Uses only driver-side tooling (duckdb/pyarrow); the Scala library has no
dependency on this.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pat

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(str(r[i]) for i in order) for r in rows]
    mat.sort()
    h = hashlib.md5()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()

fails = []
for name in sorted(oracle):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        fails.append((name, "NO_SPARK_OUTPUT", "", ""))
        continue
    tbl = pq.read_table(files[0])
    # Schema lint (round-6): DECIMAL output columns hash differently at
    # the driver than locally (physical representation, not value — the
    # expr_decimal_* r4/r5 lesson), and float32/timestamp outputs violate
    # R2/R4. Local green must predict driver green, so ban them here.
    banned = [f"{f.name}:{f.type}" for f in tbl.schema
              if pat.is_decimal(f.type) or pat.is_float32(f.type)
              or pat.is_timestamp(f.type)]
    if banned:
        fails.append((name, f"BANNED_OUTPUT_TYPE {banned}", "", ""))
        continue
    s_cols = sorted(tbl.column_names)
    s_rows = [tuple(row[c] for c in tbl.column_names) for row in tbl.to_pylist()]
    s_rows = [tuple(r) for r in s_rows]
    s_hash = canon(s_rows, tbl.column_names)
    try:
        res = con.execute(oracle[name])
        d_cols_raw = [d[0] for d in res.description]
        d_rows = res.fetchall()
    except Exception as e:
        fails.append((name, f"ORACLE_ERROR: {e}", "", ""))
        continue
    if sorted(d_cols_raw) != s_cols:
        fails.append((name, f"COLS spark={s_cols} duck={sorted(d_cols_raw)}", "", ""))
        continue
    d_hash = canon(d_rows, d_cols_raw)
    if len(d_rows) != len(s_rows):
        fails.append((name, f"ROWS spark={len(s_rows)} duck={len(d_rows)}", "", ""))
    elif d_hash != s_hash:
        fails.append((name, "HASH_MISMATCH", s_hash, d_hash))

print(f"{len(oracle)-len(fails)}/{len(oracle)} PASS")
for f in fails:
    print("FAIL", *f)
sys.exit(1 if fails else 0)
