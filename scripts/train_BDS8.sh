#!/usr/bin/env bash
# BDS8 synthetic-rig training recipe (mirrors the reference's
# scripts/train_BDS8.sh: N=5 views, interval 1.33, batch 3, lr 5e-6,
# 3-of-7 light sampling).
set -euo pipefail

BDS8_TRAINING=${BDS8_TRAINING:-"./data/BDS8"}
LOGDIR=${LOGDIR:-"./outputs/bds8_training"}
mkdir -p "$LOGDIR"

python train.py \
    --mode=train \
    --dataset=blender \
    --trainpath="$BDS8_TRAINING" \
    --trainlist=lists/BDS8/train200.txt \
    --testlist=lists/BDS8/val200.txt \
    --epochs=16 \
    --lr=0.000005 \
    --lrepochs="10,12,14:2" \
    --batch_size=3 \
    --numdepth=192 \
    --interval_scale=1.33 \
    --Nlights="3:7" \
    --NtrainViews=5 \
    --NtestViews=5 \
    --logdir="$LOGDIR" \
    --dtype=bfloat16 \
    --pallas_sweep \
    --pallas_grad \
    --flat_features \
    --flat_costreg \
    "$@" 2>&1 | tee "$LOGDIR/train.log"
# the paired Pallas sweep (--pallas_sweep --pallas_grad) needs no depth
# chunking or remat; fall back with:
#   scripts/train_BDS8.sh --dtype=bfloat16 --depth_chunk=48 --remat
