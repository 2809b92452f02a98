#!/usr/bin/env python3
"""Measure the DuckDB baseline for the extended (non-core) battery.

Usage: python3 tools/bench2_baseline.py <sfDir> <verifyOutDir> [bench2.json]

The query SET comes from bench2.json (written by `graft.Bench2`) and the
SQL from <verifyOutDir>/oracle_sql.json (written by `graft.Verify`), so
the two sides can never drift. Protocol mirrors BASELINE.md exactly:
DuckDB `SET threads=4`, warm pass, then best-of-3 taken across
INTERLEAVED full passes. Writes BASELINE2.json and prints the markdown
per-query table for BASELINE2.md. Driver-side tooling only (duckdb).
"""
import sys, os, json, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
bench2 = json.load(open(sys.argv[3] if len(sys.argv) > 3 else "bench2.json"))
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
names = sorted(bench2["queries"])

con = duckdb.connect()
con.execute("SET threads=4")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

rows = {}
for n in names:  # warm pass (untimed), also records row counts
    rows[n] = len(con.execute(oracle[n]).fetchall())
best = {n: float("inf") for n in names}
for _ in range(3):
    for n in names:
        t0 = time.perf_counter()
        con.execute(oracle[n]).fetchall()
        best[n] = min(best[n], time.perf_counter() - t0)

total = sum(best.values())
json.dump({"metric": "total", "value": total, "unit": "sec",
           "queries": best, "rows": rows, "sf": sf_dir},
          open("BASELINE2.json", "w"), indent=1)
print(f"TOTAL {total:.3f} s over {len(names)} queries (sf={sf_dir})")
print("\n| query | s | rows |\n|---|---|---|")
for n in names:
    print(f"| `{n}` | {best[n]:.3f} | {rows[n]} |")
