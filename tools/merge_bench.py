#!/usr/bin/env python3
"""Merge grouped graft.Bench JSON outputs (tools/run_sf10.sh parts) into
one bench-format line, preserving per-query times/errors and recomputing
the totals and the streaming split."""
import glob
import json
import sys


def main():
    parts_dir = sys.argv[1] if len(sys.argv) > 1 else "bench/sf10_parts"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "bench/bench_sf10docs.json"
    queries, errors, retimed, streaming, sf = {}, {}, {}, set(), None
    for f in sorted(glob.glob(f"{parts_dir}/*.json")):
        d = json.load(open(f))
        sf = d.get("sf", sf)
        for k, v in d.get("queries", {}).items():
            queries[k] = v
        errors.update(d.get("errors", {}))
        retimed.update(d.get("retimed", {}))
        streaming.update(d.get("streaming", []))
    total = sum(v for v in queries.values() if isinstance(v, (int, float)))
    tot_stream = sum(
        v for k, v in queries.items()
        if k in streaming and isinstance(v, (int, float)))
    out = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "errors": errors, "n_err": len(errors), "retimed": retimed,
        "streaming": sorted(streaming),
        "total_streaming": tot_stream, "total_batch": total - tot_stream,
        "sf": sf, "note": "merged grouped run (tools/run_sf10.sh)",
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print(f"merged {len(queries)} timed + {len(errors)} err -> {out_path}")
    print(f"total={total:.1f}s batch={total - tot_stream:.1f}s "
          f"streaming={tot_stream:.1f}s")


if __name__ == "__main__":
    main()
