#!/usr/bin/env bash
# Full local gate: compile, unit/property/streaming tests, driver-shaped
# correctness (Verify + DuckDB compare), smoke, and a bench sample.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== dictionary lint"
sbt -batch "runMain graft.tools.DictLint"

echo "== compile + test"
sbt -batch test

echo "== correctness vs DuckDB oracle (sf0.01)"
rm -rf /tmp/graft_ci_vout
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_ci_vout"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/graft_ci_vout

echo "== smoke (flagship entry + streaming)"
sbt -batch "runMain graft.Smoke" | grep "\[smoke\]"

echo "== bench (sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" | grep '"metric"'
echo "CI OK"
