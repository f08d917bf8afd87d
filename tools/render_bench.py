#!/usr/bin/env python3
"""Render the BASELINE.md measured-numbers section from a recorded bench
JSON (one line emitted by graft.Bench, or a driver BENCH_r*.json). Keeps
published prose mechanically tied to a recorded run instead of memory.

Usage: python3 tools/render_bench.py <bench.json>
"""
import json, sys

def main(path):
    with open(path) as f:
        txt = f.read()
    # driver files may wrap the line; find the JSON object
    b = json.loads(txt[txt.index('{'):])
    qs = b["queries"]
    total = sum(qs.values())
    mx = max(qs.items(), key=lambda kv: kv[1])
    print(f"Recorded run: {len(qs)} queries, total {total:.1f} s, "
          f"slowest {mx[0]} at {mx[1]:.2f} s (sf dir {b.get('sf','?')}).")
    print()
    print("| Query | sec |")
    print("|---|---|")
    for k, v in sorted(qs.items()):
        print(f"| {k} | {v:.2f} |")
    if b.get("errors"):
        print(f"\nERRORS: {b['errors']}")

if __name__ == "__main__":
    main(sys.argv[1])
