#!/bin/bash
# Standalone Verify dump + oracle audit without holding the sbt lock:
#   tools/run_verify.sh <sfDir> <outDir> [namePrefixes]
# Mirrors build.sbt's forked-run JVM flags (JDK17 add-opens, UTC, 32g).
set -u
SF="$1"; OUT="$2"; ONLY="${3:-}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" $ONLY
