#!/bin/bash
# sf10 gate off a frozen jar snapshot (no sbt lock): the round-9
# pipeline ran the gate under `sbt -batch`, which serializes every
# other sbt invocation behind a multi-hour job. This variant runs the
# same graft.Verify / graft.Bench mains with plain
# `java -cp <snapshot-jar>:/opt/spark/jars/*` so code iteration can
# continue concurrently. JVM flags mirror build.sbt's javaOptions.
# Each phase commits its artifact on completion (round-9 verdict
# item 2: per-phase artifact commits).
#
# Usage: GRAFT_JAR=/tmp/graft_snapshot.jar tools/sf10gate_java.sh
set -uo pipefail
cd "$(dirname "$0")/.."

JAR="${GRAFT_JAR:-/tmp/graft_snapshot.jar}"
SFDIR="${1:-/tmp/sf10}"
OUTDIR="${2:-/tmp/verify_sf10}"
MEM="${SPARK_DRIVER_MEM:-64g}"
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
run_main() {  # run_main <mainClass> [args...]
  java "${JVM_FLAGS[@]}" -cp "$JAR:/opt/spark/jars/*" "$@"
}

echo "=== sf10gate_java: verify $(date +%T) ==="
# SPARK_GRAFT_CPUS: Verify defaults to local[4] (right for the driver's
# sf0.01 run, hopeless at sf10 — the round-9 gate stalled on exactly
# this); the gate runs the full 32.
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  run_main graft.Verify "$SFDIR" "$OUTDIR" 2>&1 | tail -2

# phase guard: a killed/failed Verify leaves no oracle_sql.json — do
# not let the chain "compare" 5 stray dirs and commit an empty artifact
if [ ! -f "$OUTDIR/oracle_sql.json" ]; then
  echo "=== sf10gate_java: ABORT — Verify did not complete ($(date +%T)) ==="
  exit 1
fi

echo "=== sf10gate_java: oracle compare $(date +%T) ==="
GRAFT_ORACLE_TIMEOUT="${GRAFT_ORACLE_TIMEOUT:-600}" \
GRAFT_ORACLE_MEM="${GRAFT_ORACLE_MEM:-80GB}" \
  python3 tools/check.py "$SFDIR" "$OUTDIR" > /tmp/check_sf10.log
tail -6 /tmp/check_sf10.log
python3 tools/sf1json.py /tmp/check_sf10.log "CORRECTNESS_SF10_${ROUND}.json"
# pathspec commit: immune to whatever happens to be staged concurrently
git add "CORRECTNESS_SF10_${ROUND}.json" && git commit -q \
  -m "Record the sf10 full-suite correctness gate" \
  -- "CORRECTNESS_SF10_${ROUND}.json" || true

echo "=== sf10gate_java: ANN recall gate $(date +%T) ==="
# round-10 verdict #8: recall floors asserted at the gate scale; all
# collects are bounded (query sets / the 200-node anchor sample)
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  run_main graft.RecallGate "$SFDIR" 2>&1 | grep '"metric"' \
  | tail -1 > "RECALL_SF10_${ROUND}.json" \
  || { echo "RECALL GATE FAILED"; RECALL_FAILED=1; }
cat "RECALL_SF10_${ROUND}.json"
git add "RECALL_SF10_${ROUND}.json" && git commit -q \
  -m "Assert the ANN recall floors at sf10 (${ROUND})" \
  -- "RECALL_SF10_${ROUND}.json" || true

echo "=== sf10gate_java: bench (1 sweep) $(date +%T) ==="
SPARK_GRAFT_SF_DIR="$SFDIR" GRAFT_BENCH_OUT=BENCH_FULL_SF10.json \
GRAFT_BENCH_SWEEPS="${GRAFT_BENCH_SWEEPS:-1}" \
  run_main graft.Bench 2>&1 | grep '"metric"' | tail -1
git add BENCH_FULL_SF10.json && git commit -q \
  -m "Record the sf10 single-sweep bench" -- BENCH_FULL_SF10.json || true

echo "=== sf10gate_java: done $(date +%T) ==="
exit $RECALL_FAILED
