#!/usr/bin/env bash
# DTU evaluation recipe (mirrors the reference's scripts/eval_DTU.sh knobs:
# 5 generation views, 10 filter views, photomask 0.75, geomask 3,
# condmask 1px / 0.25%).
set -euo pipefail

DTU_TESTING=${DTU_TESTING:-"./data/dtu_testing"}
CKPT=${CKPT:?"set CKPT to an orbax ckpt dir or a PyTorch .ckpt file"}
OUTDIR=${OUTDIR:-"./outputs/dtu_eval"}
mkdir -p "$OUTDIR"

python eval.py \
    --dataset=dataloader_eval \
    --dataset_name=dtu \
    --testpath="$DTU_TESTING" \
    --testlist=lists/dtu/test.txt \
    --loadckpt="$CKPT" \
    --outdir="$OUTDIR" \
    --numdepth=192 \
    --interval_scale=1.06 \
    --NviewGen=5 \
    --NviewFilter=10 \
    --photomask=0.75 \
    --geomask=3 \
    --condmask_pixel=1.0 \
    --condmask_depth=0.0025 \
    --save_ply \
    --dtype=bfloat16 \
    --pallas_sweep \
    --use_pallas \
    --flat_features \
    --flat_costreg \
    "$@" 2>&1 | tee "$OUTDIR/eval.log"
# the last five flags are the benched TPU fast path (bf16 + fused Pallas
# sweep/regression + flat conv layouts); drop them for a bit-parity f32 run
