#!/usr/bin/env python3
"""Soak audit: compare a 10x (sf1) bench record against the sf0.1
record and flag super-linear gates.

Usage: python3 tools/soak_audit.py <bench_sf1.json> <bench_sf01.json>
       [growth_threshold]

Prints a markdown table (gate, sf0.1 s, sf1 s, growth) sorted by
growth, and a FLAGGED section for gates past the threshold
(default 15x — linear on 10x data plus constant-overhead headroom).
Strictly a dev tool — not part of the engine.
"""
import json, sys


def times(path):
    d = json.load(open(path))
    g = d.get("gates")
    if g:
        return {k: v["s"] for k, v in g.items()}
    return d["queries"]


def main():
    sf1 = times(sys.argv[1])
    sf01 = times(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    rows = []
    for k in sorted(sf1):
        if k in sf01 and sf01[k] > 0:
            rows.append((k, sf01[k], sf1[k], sf1[k] / sf01[k]))
    rows.sort(key=lambda r: -r[3])
    print("| gate | sf0.1 s | sf1 s | growth |")
    print("|---|---|---|---|")
    for k, a, b, g in rows:
        print(f"| {k} | {a:.2f} | {b:.2f} | {g:.1f}x |")
    flagged = [r for r in rows if r[3] > thresh]
    print(f"\n{len(flagged)} gate(s) past {thresh:.0f}x:")
    for k, a, b, g in flagged:
        print(f"  FLAG {k}: {a:.2f}s -> {b:.2f}s ({g:.1f}x)")
    tot1 = sum(sf1[k] for k, *_ in [(r[0],) for r in rows])
    tot0 = sum(r[1] for r in rows)
    print(f"\ncomparable totals: sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
          f"({tot1/tot0:.1f}x on 10x data)")


if __name__ == "__main__":
    main()
