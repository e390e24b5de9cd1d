#!/bin/bash
# Connection-model training sweep (JaCostTrain Scaladoc step 4).
#
# Sweeps the MAP prior strength κ from most-data-weighted upward and keeps
# the FIRST (lowest-κ = most corpus influence) model whose full-corpus
# replay is clean: train under the hand prior, reload, re-verify all
# 955+98 reviewed sentences under the trained model. A κ that flips any
# pinned segmentation is rejected and the resource removed before the next
# attempt (training must always count paths verified under a clean model).
set -e
cd "$(dirname "$0")/.."
RES=src/main/resources/graft/ja/conn_trained.tsv
# sbt copyResources does NOT delete removed files from target/classes, so a
# stale model would silently stay on the runtime classpath — purge both.
STALE=target/scala-2.13/classes/graft/ja/conn_trained.tsv
for K in 2 4 8 16 32 64 128; do
  rm -f "$RES" "$STALE"
  sbt -batch "runMain graft.ja.JaCostTrain --kappa $K" 2>&1 | grep costtrain
  if sbt -batch "runMain graft.ja.JaCostTrain --verify-only" 2>&1 | grep -q "1053/1053"; then
    echo "[cost_train.sh] kappa=$K: replay clean, model kept"
    exit 0
  fi
  echo "[cost_train.sh] kappa=$K: replay regressed, rejected"
done
rm -f "$RES" "$STALE"
echo "[cost_train.sh] no kappa kept the replay clean — hand prior retained"
exit 1
