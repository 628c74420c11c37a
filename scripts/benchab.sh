#!/bin/bash
# Head-to-head A/B of serial queries between two classpaths (r15 vs HEAD),
# interleaved to cancel floor drift. $1=queries csv, $2=iters, rest env.
Q=$1; IT=$2; shift 2
for kv in "$@"; do export "$kv"; done
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { # $1=label $2=classes
  SPARK_GRAFT_SECTION=serial SPARK_GRAFT_QUERIES=$Q SPARK_GRAFT_ITERS=$IT \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_LOAD_WAIT_SECS=120 \
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=1g \
    -cp "$2:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep '"metric":"summary"' | sed "s/^/[$1] /"
}
cd /root/repo
run r15 "/tmp/r15src/target/scala-2.13/classes:/tmp/r15src/src/main/resources"
run head target/scala-2.13/classes
run r15b "/tmp/r15src/target/scala-2.13/classes:/tmp/r15src/src/main/resources"
run headb target/scala-2.13/classes
