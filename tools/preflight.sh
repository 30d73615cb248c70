#!/usr/bin/env bash
# Mechanical snapshot gate. Run before ANY end-of-round commit and
# before any commit touching src/ that claims "done". Exits non-zero
# on the first red step; the final line is PREFLIGHT OK only if every
# step passed. Usage: tools/preflight.sh [--fast]
#   --fast : compile + test only (inner-loop guard)
set -euo pipefail
cd "$(dirname "$0")/.."

# Default to sf0.01 — the driver's gate scale. sf0.001 misses
# data-dependent divergences (ns-timestamp, cardinality traps) that
# only surface at the gate's fixture; use SF_DIR to override for a
# faster inner loop.
SF=${SF_DIR:-/root/testdata/sf0.01}
OUT=target/preflight_out

echo "== preflight: compile =="
sbt -batch compile

if [[ "${1:-}" != "--fast" ]]; then
  echo "== preflight: verify dump ($SF) =="
  sbt -batch "runMain graft.Verify $SF $OUT"
  echo "== preflight: duckdb gate =="
  python3 tools/check.py "$SF" "$OUT"
  echo "== preflight: codegen no-fallback sweep (sf0.001) =="
  # every probe + declared query under codegen.fallback=false AND
  # factoryMode=CODEGEN_ONLY: a silent codegen->interpreted fallback
  # (fast-path loss invisible to the correctness gates) goes red here
  sbt -batch "runMain graft.NoFallback"
fi

echo "== preflight: tests =="
sbt -batch test

# Informational (never red): per-query bench deltas vs the rolling
# median band, so round-over-round noise claims are mechanical —
# OUT-OF-BAND lines here either have a code-change explanation or
# they don't. Runs on the newest history entry (bench_history/ full
# lines written by graft.Bench, else the driver's BENCH_rN tails).
echo "== preflight: bench band (informational) =="
python3 tools/bench_band.py || true

echo "PREFLIGHT OK"
