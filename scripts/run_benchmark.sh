#!/usr/bin/env bash
# TPU benchmark launcher — the equivalent of the reference's
# run_benchmarking.slurm (1-GPU job running `python run_benchmark.py`).
#
# Usage: run_benchmark.sh --sqlite-path data.sqlite [--num-samples N] \
#            [--checkpoint DIR] [flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

python run_benchmark.py "$@"
