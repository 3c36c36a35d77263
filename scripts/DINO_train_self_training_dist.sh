#!/usr/bin/env bash
# Multi-host self-training stage (reference:
# scripts/DINO_train_self_training_dist.sh + main_teacher.py). Same SPMD
# launch pattern as DINO_train_dist.sh; the self-training stage is the
# burn_epochs=0 override resuming from the burn-in teacher.
export JAX_COORDINATOR_ADDRESS="${COORDINATOR:-}"
export JAX_NUM_PROCESSES="${NUM_PROCS:-1}"
export JAX_PROCESS_ID="${PROC_ID:-0}"
python -m datr_tpu.main \
  -c configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F_self_training.py \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/c2f_st}" \
  --pretrain_model_path "${BURNIN_CKPT:-runs/c2f/best_ema_teacher}" "$@"
