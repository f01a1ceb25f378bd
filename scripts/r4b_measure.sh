#!/bin/bash
# Round-4 batch B: pending legs (serialized — one chip, one big compile per
# process; see CLAUDE.md).  Ordered so decision-driving A/Bs land first.
set -x
cd /root/repo

echo "=== swin profile default (repro 26.8) ==="
timeout 900 python scripts/profile_components.py swin 2>&1 | tail -1

echo "=== swin profile CANVAS_ROLL=1 (A/B) ==="
timeout 900 env LC2IS_CANVAS_ROLL=1 python scripts/profile_components.py swin 2>&1 | tail -1

echo "=== bench_train baseline ==="
timeout 2400 python bench_train.py 2>&1 | tail -1

echo "=== bench_train CANVAS_TRAIN_MINC=96 ==="
timeout 2400 env LC2IS_CANVAS_TRAIN_MINC=96 python bench_train.py 2>&1 | tail -1

echo "=== bench_train CANVAS_TRAIN_MINC=192 ==="
timeout 2400 env LC2IS_CANVAS_TRAIN_MINC=192 python bench_train.py 2>&1 | tail -1

echo "=== bench_train CANVAS_TRAIN_MINC=96 + ROLL ==="
timeout 2400 env LC2IS_CANVAS_TRAIN_MINC=96 LC2IS_CANVAS_ROLL=1 python bench_train.py 2>&1 | tail -1

echo "=== headline bench re-run (tunnel was degraded last time) ==="
timeout 1800 python bench.py 2>&1 | tail -1

echo "=== swin+grad profile default ==="
timeout 1200 python scripts/profile_components.py swin+grad 2>&1 | tail -1

echo "=== swin+grad CANVAS_TRAIN_MINC=96 ==="
timeout 1200 env LC2IS_CANVAS_TRAIN_MINC=96 python scripts/profile_components.py swin+grad 2>&1 | tail -1
