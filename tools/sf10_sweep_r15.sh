#!/usr/bin/env bash
# Round-15 sf10 sweep of the families not covered by the round-14
# relational+dedup sweep (252 gates: stream/cep, match/state/changelog,
# text, graph, sim/dedup-rest, misc). Two pipelined phases:
#   verify:  per-family graft.Verify chunks from a classes SNAPSHOT
#            (so interactive sbt recompiles can't swap .class files
#            under the JVM), sequential, each dropping a done-flag;
#   oracle:  a follower (run with ORACLE_FOLLOW=1) waits on each flag
#            and DuckDB-checks that chunk while the NEXT chunk's
#            verify runs — overlapping the JVM and DuckDB halves.
# Chunk order banks the cheap families first, then the stateful long
# poles; the two hot-key flood gates run LAST in their own chunk (their
# correlated LIMIT-1 oracles are the likeliest DuckDB blow-up).
set -uo pipefail
cd /root/repo
OUT=.data/verify_sf10_r15
SF=.data/sf10
CHUNKS="${SWEEP_CHUNKS:-c3_text c4_graph c2_match_state c1a_stream c1b_stream c1c_cep c6_sim c5_misc c7_flood}"

if [[ "${ORACLE_FOLLOW:-}" == "1" ]]; then
  LOG=.data/sf10_r15_oracle.log
  for chunk in $CHUNKS; do
    names=$(python3 -c "import json;print(' '.join(json.load(open('.data/sf10_chunks.json'))['$chunk']))")
    while [[ ! -f "$OUT/.done_$chunk" ]]; do sleep 20; done
    echo "== $chunk oracle start $(date -u +%H:%M:%S)" | tee -a "$LOG"
    timeout 7200 python3 tools/oracle_check.py "$OUT" "$SF" $names \
      >> "$LOG" 2>&1
    echo "== $chunk oracle done rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
  done
  echo "== oracle follower complete $(date -u +%H:%M:%S)" | tee -a "$LOG"
  exit 0
fi

LOG=.data/sf10_r15_sweep.log
mkdir -p "$OUT" /tmp/spark_sf10
echo "== sweep start $(date -u +%H:%M:%S)" | tee -a "$LOG"
for chunk in $CHUNKS; do
  names=$(python3 -c "import json;print(' '.join(json.load(open('.data/sf10_chunks.json'))['$chunk']))")
  echo "== $chunk verify start $(date -u +%H:%M:%S)" | tee -a "$LOG"
  GRAFT_CLASSES="${SWEEP_CLASSES:-.data/classes_r15b}" SPARK_GRAFT_CPUS=24 SPARK_LOCAL_DIRS=/tmp/spark_sf10 \
    timeout 7200 tools/run_main.sh -mem 40g graft.Verify "$SF" "$OUT" $names \
    > ".data/sf10_r15_${chunk}.out" 2>&1
  rc=$?
  echo "== $chunk verify done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
  grep "\[verify\].*failed" ".data/sf10_r15_${chunk}.out" | tee -a "$LOG" || true
  touch "$OUT/.done_$chunk"
done
echo "== sweep verify complete $(date -u +%H:%M:%S)" | tee -a "$LOG"
