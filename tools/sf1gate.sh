#!/bin/bash
# The 10x scale gate (round-5 verdict item 5, now on CI cadence): derive
# the sf1 dataset from the driver's sf0.1 testdata (deterministic
# key-offset replication, graft.ScaleUp), run the FULL Verify + DuckDB
# oracle compare at sf1, then the bench suite with its artifact kept
# separate (BENCH_FULL_SF1.json). Run after any material dedup/ANN
# change — the quadratic regressions this suite can develop only show up
# a decade above the default bench scale (the round-5 sf1 run is what
# surfaced the dedup_embedding 42.9x point).
#
# Usage: tools/sf1gate.sh [--bench-only|--verify-only]
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-}"

if [ ! -f /tmp/sf1/lineitem.parquet ]; then
  echo "[sf1gate] deriving /tmp/sf1 from /root/testdata/sf0.1"
  sbt -batch "Test/runMain graft.ScaleUp" >/dev/null
fi

if [ "$mode" != "--bench-only" ]; then
  echo "[sf1gate] correctness: Verify + DuckDB compare at sf1"
  sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1" 2>&1 | tail -2
  python3 tools/check.py /tmp/sf1 /tmp/verify_sf1 | tail -5
fi

if [ "$mode" != "--verify-only" ]; then
  echo "[sf1gate] bench at sf1 -> BENCH_FULL_SF1.json"
  SPARK_GRAFT_SF_DIR=/tmp/sf1 GRAFT_BENCH_OUT=BENCH_FULL_SF1.json \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1
fi
