#!/usr/bin/env python3
"""Min-of-3 movers analysis between two idle bench triplicates.

Usage: python3 tools/movers.py <oldPrefix> <newPrefix>
e.g.   python3 tools/movers.py bench_records/r14_finale bench_records/r14_finalf

Reads <prefix>{1,2,3}.json (graft.Bench output lines), takes min-of-3 per
timing entry, prints shared-entry sums, every >1.5x mover in either
direction, and the new-only entries' total.
"""
import json, sys

def min3(prefix):
    runs = []
    for i in (1, 2, 3):
        with open(f"{prefix}{i}.json") as f:
            runs.append(json.load(f)["queries"])
    keys = set(runs[0]) & set(runs[1]) & set(runs[2])
    return {k: min(r[k] for r in runs) for k in keys}

def main(old_prefix, new_prefix):
    old, new = min3(old_prefix), min3(new_prefix)
    shared = sorted(set(old) & set(new))
    new_only = sorted(set(new) - set(old))
    so, sn = sum(old[k] for k in shared), sum(new[k] for k in shared)
    print(f"shared entries: {len(shared)}  sum {so:.1f} -> {sn:.1f} s "
          f"({(sn - so) / so * 100:+.1f}%)")
    movers = [(k, old[k], new[k]) for k in shared
              if max(old[k], new[k]) > 1.5 * min(old[k], new[k])
              and max(old[k], new[k]) > 0.2]
    for k, o, n in sorted(movers, key=lambda t: t[2] / t[1], reverse=True):
        print(f"  MOVER {k}: {o:.2f} -> {n:.2f} s ({n / o:.2f}x)")
    if not movers:
        print("  zero >1.5x movers")
    print(f"new-only entries: {len(new_only)}  "
          f"sum {sum(new[k] for k in new_only):.1f} s")
    for k in new_only:
        print(f"  NEW {k}: {new[k]:.2f} s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
