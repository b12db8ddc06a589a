#!/bin/bash
# Regenerate PLANS.md from the live headline-query plans.
set -e
cd /root/repo
sbt -batch -error compile
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens=java.base/%s=ALL-UNNAMED " $p; done)
java $ADD_OPENS -Xmx8g -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.PlanDump "${1:-/root/testdata/sf0.01}" /root/repo/PLANS.md
