#!/usr/bin/env bash
# mIoU-parity acceptance run (VERDICT r1 item 10 / BASELINE.md north star).
#
# The moment an ADE20K mount and a reference checkpoint exist, this produces
# the parity number against the reference protocol (evaluate.sh:20-23: img
# 512, label 128, batch 16, seed 1024, fp32):
#
#   ADE20K_DIR=/path/to/ADEChallengeData2016 \
#   REF_CHECKPOINT=/path/to/step-400.pt \
#   [LC2IS_BPE_PATH=/path/to/bpe_simple_vocab_16e6.txt.gz] \
#   [MODEL=base_with_text] [DATA_SIZE=64] \
#   scripts/parity_eval.sh
#
# Emits eval_mIOU_label (reference compute_mIOU), eval_mIOU_gt (reference
# compute_gt_mIOU, original-size) and eval_mIOU_dataset. Compare
# eval_mIOU_label/_gt against the reference's own evaluate.py output on the
# same checkpoint; tolerance target is <0.5 mIoU points.
set -euo pipefail

: "${ADE20K_DIR:?set ADE20K_DIR to the ADEChallengeData2016 root}"
: "${REF_CHECKPOINT:?set REF_CHECKPOINT to a reference .pt (or lc2is npz) checkpoint}"
MODEL="${MODEL:-base_with_text}"
DATA_SIZE="${DATA_SIZE:-64}"
SPLIT="${SPLIT:-validation}"

python -m lc2is_tpu.cli.evaluate \
    --name parity-eval \
    --checkpoint "$REF_CHECKPOINT" \
    --seed 1024 \
    --data_name ade20k --data_root "$ADE20K_DIR" --data_size "$DATA_SIZE" --split "$SPLIT" \
    --model "$MODEL" \
    --patch_size 16 --img_size 512 --label_size 128 --batch_size 16 \
    --dropout 0 --fp16 False \
    --gt_metrics --gt_bucket 128 \
    --logger csv
