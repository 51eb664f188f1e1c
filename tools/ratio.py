#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB timing ratios — the local replica of the
judge's baseline audit. Reads a bench JSON (Spark per-query seconds),
times each oracle SQL in DuckDB over the same sf dir (best of 2 runs,
matching Bench's steady-state policy), and prints the >threshold
queries sorted by ratio. Streaming queries are reported separately:
their per-trigger fixed cost has no DuckDB analogue.

Usage: python3 tools/ratio.py <sfdir> <oracle_sql.json> <bench.json>
           [threshold=2.0]
  oracle_sql.json comes from a graft.Verify run at the SAME sf dir
  (the ANN oracles are data-dependent).
"""
import os, sys, json, time
import duckdb

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
bench_path = sys.argv[3]
threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0

oracle = json.load(open(oracle_path))
bench = json.load(open(bench_path))
spark_t = bench["queries"]
streaming = set(bench.get("streaming", []))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # Spark-written tables (ScaleGen's sf1 docs/embeddings) are
    # directories of part files; harness tables are single files.
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

rows = []
for name in sorted(oracle):
    if name not in spark_t or not isinstance(spark_t[name], (int, float)):
        continue
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            best = None
            break
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    if best is None:
        continue
    rows.append((name, spark_t[name], best, spark_t[name] / max(best, 1e-9)))

tot_s = sum(r[1] for r in rows)
tot_d = sum(r[2] for r in rows)
bat_s = sum(r[1] for r in rows if r[0] not in streaming)
bat_d = sum(r[2] for r in rows if r[0] not in streaming)
print(f"== totals: spark {tot_s:.1f}s vs duckdb {tot_d:.1f}s "
      f"(ratio {tot_s / tot_d:.2f}x) over {len(rows)} oracled queries")
print(f"== batch-only: spark {bat_s:.1f}s vs duckdb {bat_d:.1f}s "
      f"(ratio {bat_s / bat_d:.2f}x)")
print(f"== queries over {threshold}x (batch, then streaming):")
for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
    if r > threshold and name not in streaming:
        print(f"  {r:6.1f}x  spark {s:7.3f}s  duck {d:7.3f}s  {name}")
for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
    if r > threshold and name in streaming:
        print(f"  {r:6.1f}x  spark {s:7.3f}s  duck {d:7.3f}s  {name} [streaming]")
