#!/usr/bin/env python3
"""Adjudicate per-query scale growth between two bench JSONs (e.g.
sf1-docs vs sf10-docs, a 10x data decade): print queries whose time
grew beyond the expected near-linear envelope so each can be matched
against its declared contract (ARCHITECTURE 'One more decade').

Usage: tools/growth.py bench_sf1docs.json bench_sf10docs.json [factor]
`factor` is the data-size ratio between the two runs (default 10).
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    missing_small = sorted(set(big["queries"]) - set(small["queries"]))
    missing_big = sorted(set(small["queries"]) - set(big["queries"]))
    rows = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            continue
        # growth normalized by the data ratio: 1.0 = perfectly linear,
        # <1 = sublinear; constant-time queries show ~1/factor. The
        # +0.4 s floor on the small side keeps fixed per-job overhead
        # (~0.1-0.3 s/query on this box) from labeling a tiny query
        # "super-linear" over noise.
        rows.append((b / (max(a, 0.4) * factor), a, b, q))
    rows.sort(reverse=True)
    print(f"{'norm_growth':>11} {'t_small':>8} {'t_big':>8}  query"
          f"   (factor={factor:g}; norm 1.0 = linear)")
    for g, a, b, q in rows:
        flag = " <-- SUPER-LINEAR" if g > 1.0 else ""
        print(f"{g:11.2f} {a:8.2f} {b:8.2f}  {q}{flag}")
    if missing_small or missing_big:
        print(f"\nonly in big: {missing_small}\nonly in small: {missing_big}")
    errs = {**small.get("errors", {}), **big.get("errors", {})}
    if errs:
        print(f"\nerrors: {json.dumps(errs)[:2000]}")


if __name__ == "__main__":
    main()
