#!/usr/bin/env bash
# DTU training recipe (hyperparameters mirror the reference's
# scripts/train_DTU.sh: N=3 views, 192 depths, interval 1.06, batch 4,
# 18 epochs, lr 1e-3 divided by 1.2 at epochs 2..15).
set -euo pipefail

DTU_TRAINING=${DTU_TRAINING:-"./data/dtu_training"}
LOGDIR=${LOGDIR:-"./outputs/dtu_training"}
mkdir -p "$LOGDIR"

python train.py \
    --mode=train \
    --dataset=dtu_yao \
    --trainpath="$DTU_TRAINING" \
    --trainlist=lists/dtu/train.txt \
    --testlist=lists/dtu/val.txt \
    --epochs=18 \
    --lr=0.001 \
    --lrepochs="2,3,4,5,6,7,8,9,10,11,12,13,14,15:1.2" \
    --batch_size=4 \
    --numdepth=192 \
    --interval_scale=1.06 \
    --NtrainViews=3 \
    --NtestViews=5 \
    --logdir="$LOGDIR" \
    --dtype=bfloat16 \
    --pallas_sweep \
    --pallas_grad \
    --flat_features \
    --flat_costreg \
    "$@" 2>&1 | tee "$LOGDIR/train.log"
# the paired Pallas sweep (--pallas_sweep --pallas_grad) needs no depth
# chunking or remat: warped footprints never hit HBM and the custom-VJP
# residuals are small. Fall back with:
#   scripts/train_DTU.sh --dtype=bfloat16 --depth_chunk=48 --remat
