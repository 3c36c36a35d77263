#!/usr/bin/env bash
# burn-in DA training, Cityscapes -> Foggy (reference: scripts/DINO_train.sh)
python -m datr_tpu.main \
  -c configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/c2f}" "$@"
