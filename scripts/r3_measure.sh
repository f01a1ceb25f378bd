#!/bin/bash
# Round-3 TPU measurement queue: run each probe in its own process (the
# axon remote-compile relay rejects several large payloads per process —
# CLAUDE.md) and append one JSON line each to /tmp/r3_measure.jsonl.
# Usage: bash scripts/r3_measure.sh [quick|full]
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3_measure.jsonl
MODE=${1:-quick}

run() { # label, command...
  local label=$1; shift
  echo "=== $label ===" >&2
  local line
  line=$(timeout 1200 "$@" 2>/dev/null | tail -1)
  echo "{\"probe\": \"$label\", \"result\": ${line:-null}}" >> "$OUT"
  echo "$label -> $line" >&2
}

# 1. headline bench (space-to-depth convs landed since last measurement)
run bench python bench.py
# 2. per-component profile
run prof_swin    python scripts/profile_components.py swin
run prof_decoder python scripts/profile_components.py decoder
# 3. fast-gelu A/B on the swin forward
run prof_swin_fastgelu env LC2IS_FAST_GELU=1 python scripts/profile_components.py swin
# 4. window-block VMEM budget sweep (stage-3 attn case)
for mb in 6 12 24; do
  run "winblock_${mb}mb" env LC2IS_WINBLOCK_MB=$mb python scripts/probe_stage3.py attn
done
# 5. training bench (Pallas backwards landed since 48.1)
run bench_train python bench_train.py

if [ "$MODE" = full ]; then
  run prof_text    python scripts/profile_components.py text
  run prof_head    python scripts/profile_components.py head
  run prof_srlayer python scripts/profile_components.py srlayer
  run prof_full    python scripts/profile_components.py full
  run bench_fastgelu env LC2IS_FAST_GELU=1 python bench.py
  run fastgelu_agreement python scripts/fastgelu_agreement.py
  run bench_sliding python bench_sliding.py
fi
echo "done -> $OUT" >&2
