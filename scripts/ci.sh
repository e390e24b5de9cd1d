#!/usr/bin/env bash
# Full local gate: compile, unit/property/streaming tests, driver-shaped
# correctness (Verify + DuckDB compare), smoke, and a bench sample.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== repo-root hygiene lint"
# VERDICT r15 #2: a C-locale JVM turns non-ASCII argv into literal '?'s,
# and an out-path arg mix-up in the dump tools then creates a zero-byte
# junk file named e.g. 45 '?' characters at the repo root. The tools now
# refuse such paths (graft.tools.OutPath); this lint rejects any tracked
# repo-root file that is zero-byte or non-ASCII-named so a regression can
# never be committed again.
python3 - <<'PYEOF'
import os, subprocess, sys
bad = []
for f in subprocess.run(["git","ls-files","-z"],capture_output=True).stdout.split(b"\0"):
    if not f or b"/" in f:
        continue  # root-level files only
    if any(b > 126 or b < 32 for b in f) or b"?" in f:
        bad.append((f, "non-ASCII or '?' in name"))
    elif os.path.exists(f) and os.path.getsize(f) == 0:
        bad.append((f, "zero-byte"))
if bad:
    for f, why in bad:
        print(f"[ci.sh] repo-root hygiene: {f!r}: {why}", file=sys.stderr)
    sys.exit(1)
print("[ci.sh] repo-root hygiene: clean")
PYEOF

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
