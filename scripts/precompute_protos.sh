#!/usr/bin/env bash
# Prototype-bank precompute launcher — the equivalent of the reference's
# pre_compute_protos.slurm (5-day 1-GPU job running
# `python -m models.proto_refiner`).  Builds the fixed-shape prototype /
# member bank artifact the vectorized on-device refiner gathers from.
#
# Usage: precompute_protos.sh --embeddings emb.sqlite \
#            [--geocell-dir data/geocells/finished_geocells] \
#            [--out data/geocells/prototype_bank.npz] [--max-protos 8]
set -euo pipefail
cd "$(dirname "$0")/.."

python tools/build_prototype_bank.py "$@"
