#!/usr/bin/env python3
"""Fold standalone re-time JSONs into a merged bench JSON.

The STABILITY round-15 rule: at decade scales the in-registry 3x
retime guard is inactive (its baseline is committed at sf0.1), so any
suspicious per-query time gets a standalone quiet-box re-time. This
overlay keeps the better (min) time and records BOTH measurements in
the `retimed` map so the original grouped number stays visible.

Usage: tools/apply_retimes.py <bench.json> <retime.json ...>
"""
import json
import sys


def main():
    bench_path = sys.argv[1]
    d = json.load(open(bench_path))
    retimed = d.setdefault("retimed", {})
    for p in sys.argv[2:]:
        r = json.load(open(p))
        for q, v in r.get("queries", {}).items():
            old = d["queries"].get(q)
            if not isinstance(v, (int, float)) or not isinstance(old, (int, float)):
                continue
            if v < old:
                retimed[q] = {"first": old, "retry": v}
                d["queries"][q] = v
    qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
    snames = set(d.get("streaming", []))
    d["value"] = sum(qs.values())
    d["total_streaming"] = sum(v for k, v in qs.items() if k in snames)
    d["total_batch"] = d["value"] - d["total_streaming"]
    json.dump(d, open(bench_path, "w"))
    print("applied %d re-times -> %s  total %.1f" %
          (len(retimed), bench_path, d["value"]))


if __name__ == "__main__":
    main()
