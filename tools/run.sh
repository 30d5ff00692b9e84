#!/bin/bash
# Run a graft main class directly (faster than sbt): tools/run.sh graft.Verify args...
set -e
# Bench appends a BENCH_HISTORY row keyed by round; an unset round label
# forces inferRound's ambiguous-window heuristics. Make the label explicit
# for every bench launched through this script so the guard is unreachable.
if [ "$1" = "graft.Bench" ] && [ -z "$SPARK_GRAFT_ROUND" ]; then
  echo "tools/run.sh: set SPARK_GRAFT_ROUND=rNN for graft.Bench runs" >&2
  exit 2
fi
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: extra -D system properties (e.g. the scale-dial
# overrides -Dgraft.band.minRows=0 / -Dgraft.cc.maxDriverEdges=...)
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$@"
