#!/bin/bash
# Build, run Verify at sf0.01, and run the local DuckDB gate.
# Usage: tools/gate.sh [sfDir] [query ...]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
shift || true
# unique per invocation: concurrent gate runs must not clobber each
# other's dump dir mid-compare
OUT=$(mktemp -d /tmp/verify_out.XXXXXX)
trap 'rm -rf "$OUT"' EXIT
sbt -batch -error compile
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" "$@"
python3 tools/local_gate.py "$SF" "$OUT" "$@"
