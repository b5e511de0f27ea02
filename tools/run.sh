#!/bin/bash
# Fast runner: java directly against compiled classes + vendored Spark jars,
# skipping sbt's per-invocation overhead. Usage: tools/run.sh graft.Verify args...
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# SPARK_GRAFT_JAVA_OPTS (optional): extra -D flags, e.g. an isolated
# -Dspark.sql.warehouse.dir/-Djava.io.tmpdir so a dev run can't trample
# the tables of a concurrently running Verify/Bench of the same queries.
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-24g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$@"
