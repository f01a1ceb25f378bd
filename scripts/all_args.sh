#!/usr/bin/env bash
# Train launcher — full arg surface (mirrors the reference all_args.sh:1-36,
# which invoked the missing default.py; lc2is_tpu.cli.train is that driver).

# Base arguments
NAME="default-name"
OUT_DIR="./experience/"
SEED=1024

# Data arguments
DATA_NAME="ade20k"   # or "synthetic" for the no-download path
DATA_SIZE=100

# Training arguments
MODEL="prompt_aux_cross_a"
PATCH_SIZE=16
IMG_SIZE=512
LABEL_SIZE=128
BATCH_SIZE=16
LR=1e-5
DROPOUT=0
WEIGHT_DECAY=0
FP16=False
MAX_EPOCH=5
MAX_STEPS=100
LOG_STEP=100
EVAL_STEP=100
SAVE_STEP=100

# Logging arguments
LOGGER="csv"

python -m lc2is_tpu.cli.train --name $NAME --out_dir $OUT_DIR --seed $SEED \
    --data_name $DATA_NAME --data_size $DATA_SIZE \
    --model $MODEL \
    --patch_size $PATCH_SIZE --img_size $IMG_SIZE --label_size $LABEL_SIZE \
    --batch_size $BATCH_SIZE --lr $LR --dropout $DROPOUT --weight_decay $WEIGHT_DECAY --fp16 $FP16 \
    --max_epoch $MAX_EPOCH --max_steps $MAX_STEPS \
    --log_step $LOG_STEP --eval_step $EVAL_STEP --save_step $SAVE_STEP \
    --logger $LOGGER
