#!/usr/bin/env python3
"""Compare two bench JSON files: flag queries whose median moved more
than a threshold (default 1.5x) in either direction, plus adds/removals.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        # Fail loudly: a wrapper-format BENCH_rNN.json (keys n/rc/cpus/
        # sf/tail) has no per-query timings; silently comparing its
        # metadata scalars as timings is worse than an error.
        sys.exit(f"{path}: no 'queries' key — not a per-query bench record "
                 f"(top-level keys: {', '.join(sorted(d))})")
    return {k: v for k, v in d["queries"].items()
            if isinstance(v, (int, float))}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    both = sorted(set(old) & set(new))
    slower, faster = [], []
    for q in both:
        o, n = old[q], new[q]
        if o <= 0 or n <= 0:
            print(f"ERRORED  {q}: old={o} new={n}")
            continue
        # ignore sub-0.5s-both pairs: pure jitter territory
        if max(o, n) < 0.5:
            continue
        if n > o * thr:
            slower.append((n / o, q, o, n))
        elif o > n * thr:
            faster.append((o / n, q, o, n))
    for r, q, o, n in sorted(slower, reverse=True):
        print(f"SLOWER {r:5.2f}x  {q}: {o:.2f} -> {n:.2f} s")
    for r, q, o, n in sorted(faster, reverse=True):
        print(f"faster {r:5.2f}x  {q}: {o:.2f} -> {n:.2f} s")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    to = sum(v for v in old.values() if v > 0)
    tn = sum(v for v in new.values() if v > 0)
    print(f"total: {to:.1f} -> {tn:.1f} s over {len(old)} -> {len(new)} queries; "
          f"{len(slower)} slower, {len(faster)} faster beyond {thr}x")


if __name__ == "__main__":
    main()
