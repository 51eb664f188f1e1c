#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfdir> <outdir>"), then this script compares
each dumped parquet against DuckDB executing the oracle SQL.
Usage: python3 tools/check.py [sfdir] [outdir]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.dataset as pads

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# CHECK_SKIP: comma-separated query names whose oracles are known not to
# complete on single-node DuckDB at this sf (e.g. exact-replay CTEs that
# need >RAM+spill at sf1-docs) — reported, not compared.
skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('CHECK_MEMLIMIT', '24GB')}'")
con.sql("SET temp_directory='.check_tmp'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # harness tables are single files; Spark-written (ScaleGen) tables
    # are directories of part files
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def load_spark(name):
    return pads.dataset(f"{outdir}/{name}").to_table().to_pandas()

n_pass = n_fail = 0
skipped = []
for name in sorted(oracle):
    if name in skip:
        skipped.append(name)
        continue
    try:
        sdf = load_spark(name)
    except Exception as e:
        print(f"FAIL {name}: spark output missing ({e})")
        n_fail += 1
        continue
    try:
        ddf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        n_fail += 1
        continue
    if sdf.shape != ddf.shape:
        print(f"FAIL {name}: shape spark={sdf.shape} duck={ddf.shape}")
        n_fail += 1
        continue
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                af, bf = a.astype(float), b.astype(float)
                neq = ~((af == bf) | (af.isna() & bf.isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}: {neq.sum()} diffs, first@{i}: {af[i]!r} vs {bf[i]!r}")
            else:
                astr, bstr = a.astype(str), b.astype(str)
                neq = astr != bstr
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}: {neq.sum()} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
        except Exception as e:
            bad.append(f"{c}: compare error {e} (dtypes {a.dtype} vs {b.dtype})")
    # dtype report (informational — driver may hash types too)
    dt = [f"{c}:{sdf[c].dtype}/{ddf[c].dtype}" for c in sdf.columns
          if str(sdf[c].dtype) != str(ddf[c].dtype)]
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        n_fail += 1
    else:
        note = f" [dtype-diff: {', '.join(dt)}]" if dt else ""
        print(f"PASS {name} rows={len(sdf)}{note}")
        n_pass += 1

missing = [n for n in os.listdir(outdir)
           if os.path.isdir(f"{outdir}/{n}") and n not in oracle]
if missing:
    print(f"rows-only (no oracle): {sorted(missing)}")
if skipped:
    print(f"skipped (CHECK_SKIP, oracle infeasible here): {sorted(skipped)}")
print(f"== {n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
