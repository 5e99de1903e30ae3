#!/bin/bash
# Dev runner: launch a graft main directly (no sbt lock / startup).
# Usage: tools/run_main.sh <MainClass> [args...]
# Mirrors build.sbt's fork options (add-opens, UTC, SPARK_DRIVER_MEM).
# NOTE: does not compile — run `sbt -batch compile` first.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
