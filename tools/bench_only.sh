#!/bin/bash
# Run graft.Bench directly (no sbt startup) on a given tree's compiled
# classes, for same-window A/B of specific queries.
#   tools/bench_only.sh <treeDir> <onlyPrefixes> <outFile>
set -e
TREE="$1"; ONLY="$2"; OUT="$3"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_ONLY="$ONLY" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
SPARK_GRAFT_CANONICAL_FILE="${SPARK_GRAFT_CANONICAL_FILE:-$TREE/tools/bench_canonical.json}" \
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$TREE/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null
