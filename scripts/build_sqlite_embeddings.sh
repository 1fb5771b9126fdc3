#!/usr/bin/env bash
# Embedding-dataset build launcher — the equivalent of the reference's
# build_sqlite_clip.slurm / build_sqlite_tinyvit.slurm heredoc configs
# (num_workers=256, embed_batch_size=512).
#
# Usage: build_sqlite_embeddings.sh <src.sqlite> <out.sqlite> [tinyvit|clip]
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${1:?src sqlite}
OUT=${2:?out sqlite}
BACKBONE=${3:-tinyvit}

python - "$SRC" "$OUT" "$BACKBONE" <<'PY'
import sys

from geoguessr_ai_tpu.config import BackboneConfig, EmbedBuildConfig
from geoguessr_ai_tpu.data.embed_builder import build_embedding_sqlite

src, out, backbone = sys.argv[1:4]
bb = BackboneConfig.tinyvit() if backbone == "tinyvit" else BackboneConfig.clip()
build_embedding_sqlite(
    src, out, EmbedBuildConfig(batch_size=512, fetch_threads=64, backbone=bb)
)
PY
