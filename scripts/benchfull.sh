#!/bin/bash
# Full Bench (serial + forked concurrent) in a fresh JVM — the driver's
# invocation shape without sbt. Args: extra env as K=V.
cd /root/repo
for kv in "$@"; do export "$kv"; done
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=1g -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
