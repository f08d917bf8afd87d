#!/usr/bin/env python3
"""Render the BASELINE.md measured-numbers section from a recorded bench
JSON (one line emitted by graft.Bench, or a driver BENCH_r*.json). Keeps
published prose mechanically tied to a recorded run instead of memory.

Usage: python3 tools/render_bench.py <bench.json>
"""
import json, sys

def load_bench(txt):
    """Return the bench record ({"metric", "queries", ...}) from either a
    bare graft.Bench line or a driver BENCH_r*.json wrapper (keys n/rc/cpus/
    sf/tail/parsed, with the bench line JSON-escaped inside 'tail')."""
    b = json.loads(txt[txt.index('{'):])
    if "queries" in b:
        return b
    if b.get("parsed"):
        return b["parsed"]
    # Scan 'tail' line-by-line and json.loads each candidate: a regex over
    # the whole tail can cut off at an interior '}' (space-formatted
    # queries object, '} ' inside a string value) and crash on valid input.
    for line in b.get("tail", "").splitlines():
        start = line.find('{"metric"')
        if start < 0:
            continue
        try:
            rec = json.loads(line[start:])
        except ValueError:
            continue
        if isinstance(rec, dict) and "queries" in rec:
            return rec
    raise SystemExit("no bench line found (no 'queries', 'parsed', or "
                     "embedded metric line in 'tail')")

def main(path):
    with open(path) as f:
        txt = f.read()
    b = load_bench(txt)
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
