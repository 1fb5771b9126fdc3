#!/usr/bin/env bash
# TPU train launcher — the equivalent of the reference's train.slurm
# (1 node / 1 GPU SLURM job on Idun).  On TPU VMs, run this on every host
# of the slice; jax.distributed discovers peers from the TPU metadata.
#
# Env:
#   DATASET_SQLITE_PATH  — override dataset discovery
#   GEO_TPU_CKPT_DIR     — checkpoint dir (default ./checkpoints)
#   WANDB_API_KEY        — optional W&B logging
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=${JAX_PLATFORMS:-}
python -m geoguessr_ai_tpu.train.coordinator "$@"
