#!/usr/bin/env bash
# self-training stage (reference: scripts/DINO_train_self_training.sh +
# main_teacher.py): resume from the burn-in checkpoint, start at burn_epochs.
python -m datr_tpu.main \
  -c configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/c2f_st}" \
  --pretrain_model_path "${BURNIN_CKPT:-runs/c2f/best_ema_teacher}" \
  --options burn_epochs=0 epochs=10 "$@"
