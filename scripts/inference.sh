#!/usr/bin/env bash
# TPU inference launcher — the equivalent of the reference's
# inference.slurm (1-GPU SLURM job running `python inference.py`).
# On a TPU VM there is no scheduler preamble: the chip is already
# attached; just run the entry point.
#
# Usage: inference.sh <img1.jpg> [img2.jpg img3.jpg img4.jpg] [flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

python inference.py "$@"
