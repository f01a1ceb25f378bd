#!/bin/bash
# Round-5 training-throughput sweep (VERDICT r4 #3): finish the r4c decoder
# BWD_MB sweep and the all-stage canvas-backward MINC sweep, END-TO-END via
# bench_train.py (img/s is the decision metric, not component profiles).
#
# ADVICE r4 fixes vs r4c_measure.sh: every leg tees its FULL log to
# $OUTDIR/<leg>.log (a crash is distinguishable from a measurement), the
# exit status is printed per leg, and LC2IS_CANVAS_ROLL is pinned explicitly
# so the measurement configuration is self-documenting.
set -u
cd /root/repo
OUTDIR="${OUTDIR:-/tmp/r5_train_sweep}"
mkdir -p "$OUTDIR"

run_leg () {
  local name="$1"; shift
  echo "=== $name ($*) ==="
  timeout 1500 env LC2IS_CANVAS_ROLL=1 "$@" python bench_train.py \
    > "$OUTDIR/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc"
  tail -1 "$OUTDIR/$name.log"
}

run_leg baseline
run_leg bwd_mb8                 LC2IS_ATTNBLOCK_BWD_MB=8
run_leg bwd_mb16                LC2IS_ATTNBLOCK_BWD_MB=16
run_leg canvas_minc192          LC2IS_CANVAS_TRAIN_MINC=192
run_leg canvas_minc96           LC2IS_CANVAS_TRAIN_MINC=96
