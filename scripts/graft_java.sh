#!/bin/bash
# Run a graft main class with plain `java` (no sbt lock): lets long scale
# runs (GenData sf10, Verify sf1 gates) proceed in the background while
# sbt compiles/tests in the foreground. Mirrors build.sbt's forked-JVM
# options (JDK-17 add-opens for Spark 4.x outside spark-submit, UTC, no UI).
#
# Usage: scripts/graft_java.sh <mainClass> [args...]
# Env:   GRAFT_XMX (default 16g)
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -cp "$CP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${GRAFT_XMX:-16g}" "$@"
