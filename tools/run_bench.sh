#!/bin/bash
# Run graft.Bench directly (no sbt) for clean JSON capture.
# Usage: run_bench.sh [sfDir] [query ...] — sets SPARK_GRAFT_SF_DIR;
# optional query names restrict the run (iteration aid).
set -eu
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
[ $# -gt 0 ] && shift
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" \
exec java $ADDOPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dlog4j2.configurationFile=file:log4j2.properties \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
