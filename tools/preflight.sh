#!/usr/bin/env bash
# Mechanical snapshot gate. Run before ANY end-of-round commit and
# before any commit touching src/ that claims "done". Exits non-zero
# on the first red step; the final line is PREFLIGHT OK only if every
# step passed. Usage: tools/preflight.sh [--fast | --sf01 [query...]]
#   --fast : compile + test only (inner-loop guard)
#   --sf01 : rotating SCALE rung (r17 verdict task 6) — verify the
#            named queries (default: a 30-entry geo/LSH/CC/ANN rung)
#            at sf0.1 through the full DuckDB gate, so
#            scale-independence stays a measured property; record the
#            result as a STRESS.md row. Rotate the list each round.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--sf01" ]]; then
  shift
  QUERIES=("$@")
  if [[ ${#QUERIES[@]} -eq 0 ]]; then
    QUERIES=(scalar_h3_geo join_geo_h3_block join_geo_s2_block
      scalar_geo_s2 scalar_geo_s2_neighbors scalar_h3_bits
      scalar_geo_encode scalar_ch_hashes pipe_minhash_lsh
      pipe_dedup_components pipe_dedup_components_star
      pipe_dedup_canonical pipe_ngram_jaccard pipe_curation_e2e
      pipe_ann_ivf pipe_ann_ivf_mp pipe_ann_lsh pipe_sim_topk
      pipe_decontaminate pipe_simhash pipe_semdedup udf_executable cb43_q32
      cb43_q33 cb43_q34 tpch_q2_mincost tpch_q17_small_qty
      funnel_window funnel_topk rel_limit_by window_rank)
  fi
  echo "== preflight --sf01: verify ${#QUERIES[@]} queries at sf0.1 =="
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 target/sf01_out ${QUERIES[*]}"
  python3 tools/check.py /root/testdata/sf0.1 target/sf01_out "${QUERIES[@]}"
  echo "PREFLIGHT SF01 OK"
  exit 0
fi

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
