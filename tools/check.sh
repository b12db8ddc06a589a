#!/bin/bash
# One-command CI: compile, tests, correctness gate (both scales), bench.
set -e
cd /root/repo
sbt -batch test
./tools/gate.sh /root/testdata/sf0.01
./tools/gate.sh /root/testdata/sf0.001
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens=java.base/%s=ALL-UNNAMED " $p; done)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Xmx24g -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench
# staleness gate (VERDICT r8 #1): BASELINE must cover the shipped query
# set with a Spark column from the CURRENT BENCH_DETAIL — regenerate with
# `python3 tools/baseline.py` after a bench run if this trips
python3 tools/baseline.py --check
