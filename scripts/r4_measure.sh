#!/bin/bash
# Round-4 TPU measurement batch (serialized — one chip, remote-compile relay
# dislikes concurrent big compiles).  Each leg in its own process.
set -x
cd /root/repo

echo "=== headline bench (merge-conv default) ==="
timeout 1800 python bench.py 2>&1 | tail -1

echo "=== swin profile (merge-conv default) ==="
timeout 900 python scripts/profile_components.py swin 2>&1 | tail -1

echo "=== swin profile MERGE_CONV=0 (A/B) ==="
timeout 900 env LC2IS_MERGE_CONV=0 python scripts/profile_components.py swin 2>&1 | tail -1

echo "=== optstep profile baseline ==="
timeout 900 python scripts/profile_components.py optstep 2>&1 | tail -1

echo "=== optstep profile FUSED_OPT=1 ==="
timeout 900 env LC2IS_FUSED_OPT=1 python scripts/profile_components.py optstep 2>&1 | tail -1

echo "=== bench_train baseline ==="
timeout 2400 python bench_train.py 2>&1 | tail -1

echo "=== bench_train FUSED_OPT=1 ==="
timeout 2400 env LC2IS_FUSED_OPT=1 python bench_train.py 2>&1 | tail -1

echo "=== bench_train CANVAS_TRAIN_MINC=192 ==="
timeout 2400 env LC2IS_CANVAS_TRAIN_MINC=192 python bench_train.py 2>&1 | tail -1

echo "=== bench_train CANVAS_TRAIN_MINC=96 ==="
timeout 2400 env LC2IS_CANVAS_TRAIN_MINC=96 python bench_train.py 2>&1 | tail -1

echo "=== bench_sliding (text cache) ==="
timeout 2400 python bench_sliding.py 2>&1 | tail -1
