#!/bin/bash
# The 100x full-suite scale gate (round-8 verdict item 2): derive
# /tmp/sf10 (two key-offset decades above the bench scale, ScaleUp
# applied twice), run the FULL Verify + DuckDB oracle compare there,
# then a single-sweep bench (GRAFT_BENCH_SWEEPS=1 — three sweeps at
# this scale is hours of pure repetition; the artifact records the
# sweep count). The DuckDB side runs under GRAFT_ORACLE_TIMEOUT so the
# known single-node-oracle bottleneck (BASELINE.md round-5/8 notes)
# surfaces as [TIME] lines instead of hanging the gate: a timeout is
# "oracle infeasible at this scale", not an engine failure — the
# engine-side output sizes still print, and every oracle that CAN
# finish still hash-gates.
#
# Usage: tools/sf10gate.sh [--bench-only|--verify-only]
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-}"

if [ ! -f /tmp/sf1/lineitem.parquet ]; then
  echo "[sf10gate] deriving /tmp/sf1 from /root/testdata/sf0.1"
  sbt -batch "Test/runMain graft.ScaleUp" >/dev/null
fi
if [ ! -f /tmp/sf10/lineitem.parquet ]; then
  echo "[sf10gate] deriving /tmp/sf10 from /tmp/sf1"
  sbt -batch "Test/runMain graft.ScaleUp /tmp/sf1 /tmp/sf10" >/dev/null
fi

if [ "$mode" != "--bench-only" ]; then
  echo "[sf10gate] correctness: Verify + DuckDB compare at sf10"
  sbt -batch "runMain graft.Verify /tmp/sf10 /tmp/verify_sf10" 2>&1 | tail -2
  GRAFT_ORACLE_TIMEOUT="${GRAFT_ORACLE_TIMEOUT:-900}" \
    python3 tools/check.py /tmp/sf10 /tmp/verify_sf10 | tail -8
fi

if [ "$mode" != "--verify-only" ]; then
  echo "[sf10gate] bench at sf10 (1 sweep) -> BENCH_FULL_SF10.json"
  SPARK_GRAFT_SF_DIR=/tmp/sf10 GRAFT_BENCH_OUT=BENCH_FULL_SF10.json \
    GRAFT_BENCH_SWEEPS="${GRAFT_BENCH_SWEEPS:-1}" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1
fi
