#!/bin/bash
# Multi-JVM executor scaling: run ScalingBench with both levels on
# local-cluster masters — separate 4-core executor JVMs per level, the
# literal N->4N-executor shape of the north rule (2 executors -> 8
# executors, fixed executor size), vs the default single-JVM local[N]
# thread pair. Requires SPARK_HOME (executor JVMs are forked through the
# standalone worker launch path).
# Usage: cluster_scaling.sh [nEvents] [trials]
set -e
N=${1:-16000000}
TRIALS=${2:-3}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# Shim SPARK_HOME in /tmp: LocalSparkCluster's workers hardcode their
# work dir (executor logs) to $SPARK_HOME/work — a symlinked jars/conf
# layout keeps that scratch out of the real /opt/spark install. The
# launcher needs SPARK_SCALA_VERSION to skip its build-dir probe.
export SPARK_HOME=/tmp/spark-home-shim
mkdir -p $SPARK_HOME/work
ln -sfn /opt/spark/jars $SPARK_HOME/jars
ln -sfn /opt/spark/conf $SPARK_HOME/conf
ln -sf /opt/spark/RELEASE $SPARK_HOME/RELEASE
export SPARK_SCALA_VERSION=2.13
export SPARK_LOCAL_IP=127.0.0.1
export GRAFT_MASTER_SMALL='local-cluster[2,4,6144]'
export GRAFT_MASTER_BIG='local-cluster[8,4,6144]'
# Forked executor JVMs need the engine classes and the Java 17 module
# opens; memory sized under the 6144MB worker grant.
export GRAFT_EXTRA_CONF="spark.executor.extraClassPath=/root/repo/target/scala-2.13/classes;spark.executor.extraJavaOptions=${ADD_OPENS};spark.executor.memory=5g"
export GRAFT_BENCH_TRIALS=$TRIALS
exec java $ADD_OPENS -Xmx12g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScalingBench "$N" 8 32
