#!/usr/bin/env bash
# Multi-host burn-in DA training (reference: scripts/DINO_train_dist.sh,
# torch.distributed.launch over 4 GPUs). Under JAX SPMD one process drives
# all local chips; multi-host pods launch this same script once per host
# with the coordinator address set — jax.distributed.initialize picks up
# the topology and main.py shards data by jax.process_index()
# (data/loader.py) and merges eval across processes (engine.py).
#
#   COORDINATOR=host0:1234 NUM_PROCS=4 PROC_ID=$i scripts/DINO_train_dist.sh
export JAX_COORDINATOR_ADDRESS="${COORDINATOR:-}"
export JAX_NUM_PROCESSES="${NUM_PROCS:-1}"
export JAX_PROCESS_ID="${PROC_ID:-0}"
python -m datr_tpu.main \
  -c configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py \
  --data_root "${DATA_ROOT:-data}" --output_dir "${OUTPUT_DIR:-runs/c2f}" "$@"
