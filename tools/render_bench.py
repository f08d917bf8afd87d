#!/usr/bin/env python3
"""Render the BASELINE.md measured-numbers section from a recorded bench
JSON (one line emitted by graft.Bench, or a driver BENCH_r*.json). Keeps
published prose mechanically tied to a recorded run instead of memory.

Usage: python3 tools/render_bench.py <bench.json>
"""
import json, re, sys

def load_bench(txt):
    """Return the bench record ({"metric", "queries", ...}) from either a
    bare graft.Bench line or a driver BENCH_r*.json wrapper (keys n/rc/cpus/
    sf/tail/parsed, with the bench line JSON-escaped inside 'tail')."""
    b = json.loads(txt[txt.index('{'):])
    if "queries" in b:
        return b
    if b.get("parsed"):
        return b["parsed"]
    m = re.search(r'\{"metric":.*?"queries":.*?\}(?=\s|$)', b.get("tail", ""))
    if not m:
        raise SystemExit("no bench line found (no 'queries', 'parsed', or "
                         "embedded metric line in 'tail')")
    return json.loads(m.group(0))

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
