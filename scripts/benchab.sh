#!/bin/bash
# Head-to-head A/B of serial queries between two classpaths (a baseline
# checkout vs HEAD), interleaved to cancel floor drift.
# $1=queries csv, $2=iters, rest env. BASE_SRC picks the baseline
# worktree (default /tmp/r15src; r19 used /tmp/r17src).
Q=$1; IT=$2; shift 2
BASE_SRC=${BASE_SRC:-/tmp/r15src}
for kv in "$@"; do export "$kv"; done
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { # $1=label $2=classes
  SPARK_GRAFT_SECTION=serial SPARK_GRAFT_QUERIES=$Q SPARK_GRAFT_ITERS=$IT \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_LOAD_WAIT_SECS=120 \
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=1g \
    -cp "$2:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep '"metric":"summary"' | sed "s/^/[$1] /"
}
cd /root/repo
run base "$BASE_SRC/target/scala-2.13/classes:$BASE_SRC/src/main/resources"
run head "target/scala-2.13/classes:src/main/resources"
run baseb "$BASE_SRC/target/scala-2.13/classes:$BASE_SRC/src/main/resources"
run headb "target/scala-2.13/classes:src/main/resources"
