#!/bin/bash
# Round-4 batch C: decoder-backward tile sweep (VERDICT r3 #2: "sweep
# LC2IS_ATTNBLOCK_BWD_MB on the 48.3 ms decoder backward") + best-config
# train confirmation.  Serialized — one chip, one big compile per process.
set -x
cd /root/repo

echo "=== profile_train decoder BWD_MB=3 (default) ==="
timeout 1200 python scripts/profile_train.py decoder 2>&1 | tail -1

echo "=== profile_train decoder BWD_MB=8 ==="
timeout 1200 env LC2IS_ATTNBLOCK_BWD_MB=8 python scripts/profile_train.py decoder 2>&1 | tail -1

echo "=== profile_train decoder BWD_MB=16 ==="
timeout 1200 env LC2IS_ATTNBLOCK_BWD_MB=16 python scripts/profile_train.py decoder 2>&1 | tail -1

echo "=== profile_train decoder BWD_MB=32 ==="
timeout 1200 env LC2IS_ATTNBLOCK_BWD_MB=32 python scripts/profile_train.py decoder 2>&1 | tail -1
