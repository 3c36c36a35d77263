#!/usr/bin/env bash
# evaluation (reference: scripts/DINO_eval.sh)
python -m datr_tpu.main \
  -c configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/eval}" \
  --resume "${CKPT:-runs/c2f/checkpoint}" --eval "$@"
