#!/bin/bash
# Round-9 sequential artifact pipeline (one sbt lock, one job):
#   1. final sf0.1 bench on HEAD (BENCH_FULL.json gains dsir_train_build
#      + the io_mb accounting)
#   2. sf10 derive + Verify + DuckDB compare (per-oracle timeout)
#   3. sf10 single-sweep bench -> BENCH_FULL_SF10.json
# Progress streams to the log; each phase stamps start/end.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== phase 1: sf0.1 bench $(date +%T) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1

echo "=== phase 2: sf10 verify $(date +%T) ==="
SPARK_DRIVER_MEM=64g GRAFT_ORACLE_TIMEOUT=900 GRAFT_ORACLE_MEM=80GB \
  bash tools/sf10gate.sh --verify-only

echo "=== phase 3: sf10 bench $(date +%T) ==="
SPARK_DRIVER_MEM=64g bash tools/sf10gate.sh --bench-only

echo "=== done $(date +%T) ==="
