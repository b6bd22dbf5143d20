#!/usr/bin/env bash
# Round-15 sf10 sweep of the families not covered by the round-14
# relational+dedup sweep. Runs per-family Verify chunks from a classes
# SNAPSHOT (so interactive sbt recompiles can't swap .class files under
# the JVM), then oracle-checks each chunk, logging incrementally.
set -uo pipefail
cd /root/repo
OUT=.data/verify_sf10_r15
SF=.data/sf10
LOG=.data/sf10_r15_sweep.log
mkdir -p "$OUT"
echo "== sweep start $(date -u +%H:%M:%S)" | tee -a "$LOG"
for chunk in c1_stream c2_match_state c3_text c4_graph c5_misc c6_sim; do
  names=$(python3 -c "import json;print(' '.join(json.load(open('.data/sf10_chunks.json'))['$chunk']))")
  echo "== $chunk verify start $(date -u +%H:%M:%S)" | tee -a "$LOG"
  GRAFT_CLASSES=.data/classes_r15 SPARK_GRAFT_CPUS=24 SPARK_LOCAL_DIRS=/tmp/spark_sf10 \
    timeout 14400 tools/run_main.sh -mem 40g graft.Verify "$SF" "$OUT" $names \
    > ".data/sf10_r15_${chunk}.out" 2>&1
  rc=$?
  echo "== $chunk verify done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
  grep "\[verify\]" ".data/sf10_r15_${chunk}.out" | tee -a "$LOG" || true
  echo "== $chunk oracle start $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 10800 python3 tools/oracle_check.py "$OUT" "$SF" $names \
    >> "$LOG" 2>&1
  echo "== $chunk oracle done rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
done
echo "== sweep complete $(date -u +%H:%M:%S)" | tee -a "$LOG"
