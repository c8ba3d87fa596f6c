#!/usr/bin/env bash
# The full pre-commit gate, in one shot — run this before ANY milestone
# or end-of-round snapshot commit (round 5 shipped red because a kernel
# rename was committed without compiling its callers; this script makes
# that impossible to repeat cheaply).
#
#   tools/gate.sh            # compile + tests + correctness vs DuckDB + bench
#   tools/gate.sh --fast     # skip the bench (correctness only)
#
# Exits non-zero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OUT=$(mktemp -d /tmp/graft-gate.XXXXXX)

echo "== 1/4 compile + scalatest =="
sbt -batch test

echo "== 2/4 correctness dump (sf0.01) =="
java $ADDOPENS -Dspark.ui.enabled=false -Xmx8g -cp "$CP" \
  graft.Verify /root/testdata/sf0.01 "$OUT" 2>/dev/null

echo "== 3/4 DuckDB oracle compare (exact mode) =="
GRAFT_EXACT=1 python3 tools/check_correctness.py /root/testdata/sf0.01 "$OUT"

if [[ "${1:-}" != "--fast" ]]; then
  echo "== 4/4 bench (sf0.1, local[32]) =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java $ADDOPENS -Dspark.ui.enabled=false -Xmx16g -cp "$CP" graft.Bench 2>/dev/null | tail -1
fi
echo "== gate green =="
