#!/usr/bin/env bash
# evaluate the --use_ema ModelEma track of a checkpoint
# (reference: scripts/DINO_eval_ema.sh + inference_ema_model.py)
python -m datr_tpu.main \
  -c "${CONFIG:-configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py}" \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/eval_ema}" \
  --resume "${CKPT:?set CKPT=path/to/checkpoint}" --eval --ema "$@"
