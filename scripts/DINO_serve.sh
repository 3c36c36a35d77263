#!/usr/bin/env bash
# Launch the dynamic-batching detection server on a trained checkpoint.
# (No reference equivalent — the reference ships single-image inference
# scripts only; see datr_tpu/serve.py.)
set -e

CONFIG=${CONFIG:-configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py}
CKPT=${CKPT:-runs/c2f/checkpoint_best_regular}
PORT=${PORT:-8080}
BATCH=${BATCH:-2}

python -m datr_tpu.serve -c "$CONFIG" --ckpt "$CKPT" \
    --port "$PORT" --batch_size "$BATCH" "$@"
