#!/usr/bin/env bash
# Run a graft main from the ALREADY-COMPILED classes (no sbt, no
# recompile): long background legs (Verify boards, Bench sweeps, QTime)
# must not pick up in-progress working-tree edits the way a chained
# `sbt runMain` does. Compile first (`sbt compile`), then:
#
#   tools/run_main.sh graft.Bench
#   SPARK_GRAFT_CPUS=8 tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#
# JVM flags mirror build.sbt's forked `run` settings.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
HEAP="${SPARK_DRIVER_MEM:-16g}"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  --add-modules jdk.incubator.vector \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"$HEAP" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
