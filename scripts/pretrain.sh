#!/usr/bin/env bash
# CLIP contrastive pretrain launcher — the equivalent of the reference's
# pretrain.slurm (pretrain_idun.py on one GPU; here one TPU slice).
set -euo pipefail
cd "$(dirname "$0")/.."

python - "$@" <<'PY'
import sys

from geoguessr_ai_tpu.data.sqlite_dataset import load_sqlite_dataset
from geoguessr_ai_tpu.geocells.manager import GeocellManager
from geoguessr_ai_tpu.train.captions import enrich_dataframe
from geoguessr_ai_tpu.train.coordinator import discover_sqlite
from geoguessr_ai_tpu.train.pretrain_clip import hash_tokenizer, pretrain
from geoguessr_ai_tpu import config as C

sqlite_path = sys.argv[1] if len(sys.argv) > 1 else discover_sqlite()
df = load_sqlite_dataset(sqlite_path)
try:
    mgr = GeocellManager(C.GEOCELL_DIR + "/finished_geocells")
except Exception:
    mgr = None
df = enrich_dataframe(df, geocell_manager=mgr)
# Swap hash_tokenizer for a real CLIP BPE tokenizer when vocab assets exist.
pretrain(df, hash_tokenizer())
PY
