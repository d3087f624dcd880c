#!/bin/bash
# Run a graft main class with plain java (no sbt lock), mirroring
# build.sbt's forked-run JVM options. Usage:
#   tools/run_main.sh [-Xmx...] graft.bench.ScaleBench args...
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="-Xmx24g"
if [[ "${1:-}" == -Xmx* ]]; then XMX="$1"; shift; fi
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS "$XMX" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
