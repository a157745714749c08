#!/usr/bin/env python3
"""Diff two Bench JSON outputs: per-query deltas, sorted by |delta|.

Usage: python3 tools/bench_diff.py <run1.json> <run2.json> [--md]

Dev-side tool for the committed noise-floor table: run the bench twice
back-to-back (same JVM config), diff, and treat the observed deltas as
the floor below which round-over-round drifts are not actionable.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    md = "--md" in sys.argv
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(qa):
        if k in qb:
            rows.append((k, qa[k], qb[k], qb[k] - qa[k]))
    rows.sort(key=lambda r: -abs(r[3]))
    if md:
        print("| query | run1 s | run2 s | delta s |")
        print("|---|---|---|---|")
        for k, x, y, d in rows:
            print(f"| {k} | {x:.3f} | {y:.3f} | {d:+.3f} |")
    else:
        for k, x, y, d in rows:
            print(f"{k:28s} {x:8.3f} {y:8.3f} {d:+8.3f}")
    deltas = sorted(abs(r[3]) for r in rows)
    n = len(deltas)
    print(f"\ntotal: run1 {a['value']:.1f}s run2 {b['value']:.1f}s | "
          f"|delta| p50 {deltas[n // 2]:.3f}s p90 {deltas[9 * n // 10]:.3f}s "
          f"max {deltas[-1]:.3f}s")


if __name__ == "__main__":
    main()
