#!/bin/bash
# Run a graft main class outside sbt (same JVM flags as build.sbt).
# Usage: run_graft.sh [-Xmx..] <mainClass> [args...]
set -e
XMX="${GRAFT_XMX:-16g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_GC_OPTS: extra GC flags (e.g. "-XX:MaxGCPauseMillis=50") — the soak
# runs use this to bound STW pauses on the serve path
exec java -Xmx$XMX ${GRAFT_GC_OPTS:-} $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
