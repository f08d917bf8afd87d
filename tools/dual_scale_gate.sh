#!/usr/bin/env bash
# Dual-scale oracle gate — the standing pre-commit check for any
# RESULT-AFFECTING change (new query, changed default, adaptive knob).
#
# The driver's own gate runs sf0.01 only; round 9 proved that is not
# enough: an adaptive default that is floor-stable at sf0.01 diverged
# from its oracle twin only at sf0.1 (p23, 348 vs 465 rows). This script
# runs graft.Verify AND the DuckDB compare at BOTH scale factors in one
# command, failing on the first red scale.
#
# Usage: tools/dual_scale_gate.sh [outRoot]      (default /tmp/dualgate)
# Takes ~25-30 min end to end (sf0.1 Verify dominates); run it before
# committing result-affecting changes, record the tail of the output in
# bench_records/ when it gates a round.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT_ROOT="${1:-/tmp/dualgate}"
CPUS="${SPARK_GRAFT_CPUS:-8}"
overall=0

for SF in sf0.01 sf0.1; do
  SF_DIR="/root/testdata/$SF"
  OUT_DIR="$OUT_ROOT/$SF"
  rm -rf "$OUT_DIR"
  echo "== $SF: graft.Verify -> $OUT_DIR =="
  # Verify exits non-zero when ANY query fails (round-11 loud-failure
  # contract) — still run the oracle compare so the gate shows which
  # queries stayed green instead of hiding everything behind one failure
  if ! SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
    "runMain graft.Verify $SF_DIR $OUT_DIR" >"$OUT_ROOT.$SF.verify.log" 2>&1; then
    echo "FAIL $SF: Verify reported failures (see $OUT_ROOT.$SF.verify.log and $OUT_DIR/errors.json)"
    overall=1
    [ -f "$OUT_DIR/oracle_sql.json" ] || continue  # harness died before dumping
  fi
  # Contract drift that breaks no query leaves Verify rc=0 with the drift
  # only in errors.json — surface ANY non-empty errors.json here so the
  # gate cannot be green over buried drift (round-11 advice).
  if [ -f "$OUT_DIR/errors.json" ] && [ "$(cat "$OUT_DIR/errors.json")" != "{}" ]; then
    echo "FAIL $SF: errors.json is non-empty:"
    cat "$OUT_DIR/errors.json"; echo
    overall=1
  fi
  echo "== $SF: DuckDB oracle compare =="
  if python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR"; then
    echo "== $SF GREEN =="
  else
    echo "== $SF RED =="
    overall=1
  fi
done

if [ "$overall" -eq 0 ]; then
  echo "== DUAL-SCALE GATE GREEN (sf0.01 + sf0.1) =="
else
  echo "== DUAL-SCALE GATE RED =="
fi
exit "$overall"
