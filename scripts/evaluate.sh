#!/usr/bin/env bash
# Eval launcher — canonical eval config (mirrors reference evaluate.sh:1-23:
# ckpt step-400, seed 1024, 64-image subset, img 512 / label 128 / batch 16).

NAME="overfit-eval"
CHECKPOINT="./experience/overfit/checkpoints/step-400.pt"
OUT_DIR="./experience/"
SEED=1024

DATA_NAME="ade20k"
DATA_SIZE=64

MODEL="base_with_text"
PATCH_SIZE=16
IMG_SIZE=512
LABEL_SIZE=128
BATCH_SIZE=16
DROPOUT=0
FP16=False

python -m lc2is_tpu.cli.evaluate --name $NAME --checkpoint $CHECKPOINT --out_dir $OUT_DIR --seed $SEED \
    --data_name $DATA_NAME --data_size $DATA_SIZE \
    --model $MODEL \
    --patch_size $PATCH_SIZE --img_size $IMG_SIZE --label_size $LABEL_SIZE \
    --batch_size $BATCH_SIZE --dropout $DROPOUT --fp16 $FP16
