#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB timing ratios — the local replica of the
judge's baseline audit. Reads a bench JSON (Spark per-query seconds),
times each oracle SQL in DuckDB over the same sf dir (best of 2 runs,
matching Bench's steady-state policy), and prints the >threshold
queries sorted by ratio. Streaming queries are reported separately:
their per-trigger fixed cost has no DuckDB analogue.

Each oracle runs in its OWN subprocess with a wall-clock timeout and a
DuckDB memory limit (spill to RATIO_TMP, default .ratio_tmp/): a
pathological oracle (e.g. an exact-replay CTE chain that needs >RAM and
>disk at sf1) gets recorded as TIMEOUT/ERR and the audit continues,
instead of the whole run dying to the OOM killer with its buffered
output. Results stream to stdout line-by-line as they finish.

Usage: python3 tools/ratio.py <sfdir> <oracle_sql.json> <bench.json>
           [threshold=2.0] [timeout_sec=600]
  oracle_sql.json comes from a graft.Verify run at the SAME sf dir
  (the ANN oracles are data-dependent).
Env: RATIO_MEMLIMIT (default "24GB"), RATIO_TMP (spill dir).
"""
import os, sys, json, time, shutil
import multiprocessing as mp

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
bench_path = sys.argv[3]
threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
timeout = float(sys.argv[5]) if len(sys.argv) > 5 else 600.0
memlimit = os.environ.get("RATIO_MEMLIMIT", "24GB")
tmpdir = os.environ.get("RATIO_TMP", ".ratio_tmp")

oracle = json.load(open(oracle_path))
bench = json.load(open(bench_path))
spark_t = bench["queries"]
streaming = set(bench.get("streaming", []))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_path(t):
    # Spark-written tables (ScaleGen's sf1 docs/embeddings) are
    # directories of part files; harness tables are single files.
    p = f"{sfdir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def run_one(sql, q):
    """Child process: time one oracle (best of 2) and put secs or an
    error string on the queue."""
    try:
        import duckdb
        con = duckdb.connect()
        con.sql(f"SET memory_limit='{memlimit}'")
        con.sql(f"SET temp_directory='{tmpdir}'")
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(t)}'")
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        q.put(("ok", best))
    except Exception as e:
        q.put(("err", f"{type(e).__name__}: {e}"))


rows, failed = [], []
ctx = mp.get_context("fork")
os.makedirs(tmpdir, exist_ok=True)
for name in sorted(oracle):
    if name not in spark_t or not isinstance(spark_t[name], (int, float)):
        continue
    q = ctx.Queue()
    proc = ctx.Process(target=run_one, args=(oracle[name], q))
    t0 = time.monotonic()
    proc.start()
    proc.join(timeout)
    if proc.is_alive():
        proc.kill()
        proc.join()
        failed.append((name, f"TIMEOUT after {timeout:.0f}s"))
        print(f"TIMEOUT {name}: exceeded {timeout:.0f}s wall clock", flush=True)
        continue
    try:
        # short timeout (not get_nowait): the multiprocessing Queue
        # feeder thread may still be flushing the child's result right
        # after join() returns — get_nowait can racily raise Empty and
        # misclassify a completed oracle as DIED
        status, val = q.get(timeout=5)
    except Exception:
        # child died without reporting (OOM-killed, disk full on spill)
        failed.append((name, f"child died (exit {proc.exitcode}) "
                             f"after {time.monotonic() - t0:.0f}s"))
        print(f"DIED {name}: child exit {proc.exitcode} "
              f"(OOM-killed or spill-disk full)", flush=True)
        continue
    if status == "err":
        failed.append((name, val))
        print(f"ERR  {name}: {val}", flush=True)
        continue
    rows.append((name, spark_t[name], val, spark_t[name] / max(val, 1e-9)))
    print(f"ok   {name}: spark {spark_t[name]:7.3f}s duck {val:7.3f}s",
          flush=True)
shutil.rmtree(tmpdir, ignore_errors=True)

tot_s = sum(r[1] for r in rows)
tot_d = sum(r[2] for r in rows)
bat_s = sum(r[1] for r in rows if r[0] not in streaming)
bat_d = sum(r[2] for r in rows if r[0] not in streaming)
print(f"== totals: spark {tot_s:.1f}s vs duckdb {tot_d:.1f}s "
      f"(ratio {tot_s / tot_d:.2f}x) over {len(rows)} oracled queries")
print(f"== batch-only: spark {bat_s:.1f}s vs duckdb {bat_d:.1f}s "
      f"(ratio {bat_s / bat_d:.2f}x)")
if failed:
    print(f"== not counted ({len(failed)} oracle-side failures):")
    for name, why in failed:
        print(f"  {name}: {why}")
print(f"== queries over {threshold}x (batch, then streaming):")
for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
    if r > threshold and name not in streaming:
        print(f"  {r:6.1f}x  spark {s:7.3f}s  duck {d:7.3f}s  {name}")
for name, s, d, r in sorted(rows, key=lambda x: -x[3]):
    if r > threshold and name in streaming:
        print(f"  {r:6.1f}x  spark {s:7.3f}s  duck {d:7.3f}s  {name} [streaming]")
