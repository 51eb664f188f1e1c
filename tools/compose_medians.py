#!/usr/bin/env python3
"""Compose bench/bench_latest.json from per-query medians of N full runs."""
import json, sys, statistics

runs = [json.load(open(p)) for p in sys.argv[1:]]
# q183 exists only in the 183-query runs; median over available samples
names = sorted({k for r in runs for k in r["queries"]})
med = {}
for n in names:
    vals = [r["queries"][n] for r in runs
            if isinstance(r["queries"].get(n), (int, float))]
    if not vals:
        print("WARNING: no numeric sample for %s in any run; skipped" % n,
              file=sys.stderr)
        continue
    med[n] = statistics.median(vals)
# union of source-run errors: a composed baseline must not launder a
# failing run into a zero-error JSON
errors = {}
for r in runs:
    errors.update(r.get("errors", {}))
base = runs[-1]
streaming = base.get("streaming", [])
snames = set(x.strip('"') for x in streaming)
total = sum(med.values())
tot_s = sum(v for k, v in med.items() if k in snames)
out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": med, "errors": errors, "n_err": len(errors), "retimed": {},
    "streaming": streaming,
    "total_streaming": tot_s, "total_batch": total - tot_s,
    "sf": base["sf"],
    "note": "per-query medians of %d full-registry runs (see bench/STABILITY.md)" % len(runs),
}
json.dump(out, open("bench/bench_latest.json", "w"))
print("total %.1f batch %.1f stream %.1f over %d queries" %
      (total, total - tot_s, tot_s, len(med)))
for r in runs:
    print("run: total %.1f batch %.1f" % (r["value"], r["total_batch"]))
