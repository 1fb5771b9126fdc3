#!/usr/bin/env bash
# Object-store train launcher — the equivalent of the reference's
# train_data_from_s3.slurm (14-day 1-GPU job running
# main_coordinator_idun_s3.py).  Streams the training snapshot straight
# from the object store (no local SQLite) via coordinator.main_streaming.
#
# Env:
#   GEO_TPU_S3_*       — object-store endpoint/credentials (data/s3.py)
#   GEO_TPU_CKPT_DIR   — checkpoint dir (default ./checkpoints)
#   WANDB_API_KEY      — optional W&B logging
set -euo pipefail
cd "$(dirname "$0")/.."

python -c "from geoguessr_ai_tpu.train.coordinator import main_streaming; main_streaming()" "$@"
