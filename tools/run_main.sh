#!/usr/bin/env bash
# Run a graft main class directly against the sbt-compiled classes and
# the image's Spark jars, without holding the sbt build lock — lets a
# long Verify/Bench run coexist with interactive `sbt compile`.
# Usage: tools/run_main.sh [-mem 24g] <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-16g}"
if [[ "${1:-}" == "-mem" ]]; then MEM="$2"; shift 2; fi
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
# GRAFT_CLASSES overrides the classes dir — point it at a SNAPSHOT copy
# for long background runs (recompiling swaps .class files under a
# running JVM otherwise).
CLASSES="${GRAFT_CLASSES:-target/scala-2.13/classes}"
exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
