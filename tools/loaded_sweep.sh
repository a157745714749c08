#!/bin/bash
# One full sf0.1 bench sweep under a deliberate background CPU load
# (16 spinner processes), writing BENCH_OUT to $1. Emulates the
# driver's co-tenant environment for pin calibration (VERDICT r14
# ask #1b). Dev-side tool; not part of the engine.
set -u
OUT="$1"
SPIN_PIDS=()
for i in $(seq 16); do
  (while :; do :; done) &
  SPIN_PIDS+=($!)
done
trap 'kill "${SPIN_PIDS[@]}" 2>/dev/null' EXIT
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -3
