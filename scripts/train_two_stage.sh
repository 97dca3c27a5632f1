#!/bin/bash
# Two-stage training recipe (the reference train.sh protocol):
#   stage 1 — descriptor-only (no attention, no orientation regression),
#             rotation-free augmentations, 2 epochs;
#   stage 2 — full model, restore stage-1 weights EXCLUDING the detection
#             scope, add full-circle Rotate1D, ~70 epochs (saturates ~60).
set -e

DATA_DIR=${1:-data/oxford}

python -m feat3dnet_tpu.cli.train \
    --data_dir "$DATA_DIR" \
    --log_dir ./ckpt_stage1 \
    --augmentation Jitter RotateSmall Shift \
    --noattention --noregress \
    --num_epochs 2

python -m feat3dnet_tpu.cli.train \
    --data_dir "$DATA_DIR" \
    --log_dir ./ckpt \
    --augmentation Jitter RotateSmall Shift Rotate1D \
    --checkpoint ./ckpt_stage1 \
    --restore_exclude detection \
    --num_epochs 70
