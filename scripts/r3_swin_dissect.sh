#!/bin/bash
# Stage-by-stage swin cost in SEQUENCE (micro per-block probes overstate
# weight-streaming; differences of these in-context runs attribute time to
# stages): swin_embed (patch embed only), swin_stage12 (s1+s2),
# swin_shallow3 (s3 depth 2), swin (full).  One process per probe
# (axon relay payload limit — CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3_swin_dissect.jsonl

run() {
  local label=$1; shift
  echo "=== $label ===" >&2
  local line
  line=$(timeout 1200 "$@" 2>/dev/null | tail -1)
  echo "{\"probe\": \"$label\", \"result\": ${line:-null}}" >> "$OUT"
  echo "$label -> $line" >&2
}

run swin_embed    python scripts/profile_components.py swin_embed
run swin_stage12  python scripts/profile_components.py swin_stage12
run swin_shallow3 python scripts/profile_components.py swin_shallow3
run swin_full     python scripts/profile_components.py swin
echo "done -> $OUT" >&2
