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
    # r19 rotation — DISJOINT from the r18 slice (which covered the
    # geo/LSH/CC/ANN families); this round: the text-pipeline tail,
    # aggregate/window/funnel families, joins, TPC-H heavies and the
    # new parameterized semdedup geometry. Rotate again next round.
    QUERIES=(pipe_semdedup_b24 pipe_bm25 pipe_unigram_logprob
      pipe_lang_id pipe_gopher_rules pipe_quality_classifier
      pipe_embed_neardup pipe_ann_hamming pipe_intradoc_dedup
      pipe_stratified_sample agg_quantiles agg_topk_exact
      agg_retention agg_histogram agg_corr_matrix funnel_sequence_timed
      funnel_next_node window_frames window_moving window_nn_derivative
      join_asof join_star_revenue join_skew_salted mt_projection
      rel_sample_hash setop_intersect_all scalar_vector_dist
      tpch_q9_profit tpch_q21_waiting cb43_q13)
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
