#!/bin/bash
# sf1 gate off a frozen jar snapshot — same no-sbt-lock approach as
# sf10gate_java.sh (round-10: refresh the sf1 artifacts at the current
# registry; round-9 verdict item 4). Runs Verify at 16 threads so it
# can share the host with the concurrently-running sf10 gate, then the
# DuckDB compare (bounded memory: the sf10 gate's oracle may overlap),
# then the default 3-sweep bench. Each phase commits its artifact.
set -uo pipefail
cd "$(dirname "$0")/.."

JAR="${GRAFT_JAR:-/tmp/graft_snapshot_sf1.jar}"
SFDIR="${1:-/tmp/sf1}"
OUTDIR="${2:-/tmp/verify_sf1}"
MEM="${SPARK_DRIVER_MEM:-32g}"
# single versioned default (ADVICE r11): tools/ROUND is bumped once
# per round so a bare invocation can never overwrite a prior round's
# artifacts under a stale name
ROUND="${GRAFT_ROUND:-$(cat "$(dirname "$0")/ROUND" 2>/dev/null || echo rXX)}"

JVM_FLAGS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JVM_FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
JVM_FLAGS+=(--add-modules jdk.incubator.vector
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "-Xmx$MEM")
if [ -f /tmp/log4j2-quiet.properties ]; then
  JVM_FLAGS+=("-Dlog4j2.configurationFile=/tmp/log4j2-quiet.properties")
fi

# a recall floor violation must reach the exit status (ADVICE r11) —
# but only after the bench phase has run and committed its artifact
RECALL_FAILED=0
run_main() { java "${JVM_FLAGS[@]}" -cp "$JAR:/opt/spark/jars/*" "$@"; }

echo "=== sf1gate_java: verify $(date +%T) ==="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  run_main graft.Verify "$SFDIR" "$OUTDIR" 2>&1 | tail -2

if [ ! -f "$OUTDIR/oracle_sql.json" ]; then
  echo "=== sf1gate_java: ABORT — Verify did not complete ($(date +%T)) ==="
  exit 1
fi

echo "=== sf1gate_java: oracle compare $(date +%T) ==="
GRAFT_ORACLE_TIMEOUT="${GRAFT_ORACLE_TIMEOUT:-900}" \
GRAFT_ORACLE_MEM="${GRAFT_ORACLE_MEM:-40GB}" \
  python3 tools/check.py "$SFDIR" "$OUTDIR" > /tmp/check_sf1.log
tail -4 /tmp/check_sf1.log
python3 tools/sf1json.py /tmp/check_sf1.log "CORRECTNESS_SF1_${ROUND}.json"
git add "CORRECTNESS_SF1_${ROUND}.json" && git commit -q \
  -m "Refresh the sf1 full-suite correctness gate (${ROUND} registry)" \
  -- "CORRECTNESS_SF1_${ROUND}.json" || true

echo "=== sf1gate_java: ANN recall gate $(date +%T) ==="
# round-10 verdict #8: the rows-only ANN recall floors, asserted AT THE
# GATE SCALE (the unit suite only pins them at sf0.01); exits non-zero
# on a floor violation, which the log surfaces without killing the
# bench phase
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  run_main graft.RecallGate "$SFDIR" 2>&1 | grep '"metric"' \
  | tail -1 > "RECALL_SF1_${ROUND}.json" \
  || { echo "RECALL GATE FAILED"; RECALL_FAILED=1; }
cat "RECALL_SF1_${ROUND}.json"
git add "RECALL_SF1_${ROUND}.json" && git commit -q \
  -m "Assert the ANN recall floors at sf1 (${ROUND})" \
  -- "RECALL_SF1_${ROUND}.json" || true

echo "=== sf1gate_java: bench (3 sweeps) $(date +%T) ==="
SPARK_GRAFT_SF_DIR="$SFDIR" GRAFT_BENCH_OUT=BENCH_FULL_SF1.json \
GRAFT_BENCH_SWEEPS="${GRAFT_BENCH_SWEEPS:-3}" \
  run_main graft.Bench 2>&1 | grep '"metric"' | tail -1
git add BENCH_FULL_SF1.json && git commit -q \
  -m "Refresh the sf1 bench artifact (${ROUND} registry)" \
  -- BENCH_FULL_SF1.json || true

echo "=== sf1gate_java: done $(date +%T) ==="
exit $RECALL_FAILED
