#!/usr/bin/env bash
# CLIP contrastive pretrain launcher — the equivalent of the reference's
# pretrain.slurm (pretrain_idun.py on one GPU; here one TPU slice).
set -euo pipefail
cd "$(dirname "$0")/.."

python - "$@" <<'PY'
import os
import sys

from geoguessr_ai_tpu.data.sqlite_dataset import load_sqlite_dataset
from geoguessr_ai_tpu.geocells.manager import GeocellManager
from geoguessr_ai_tpu.train.captions import enrich_dataframe
from geoguessr_ai_tpu.train.coordinator import discover_sqlite
from geoguessr_ai_tpu.train.clip_bpe import default_tokenize_fn
from geoguessr_ai_tpu.train.pretrain_clip import pretrain
from geoguessr_ai_tpu import config as C

sqlite_path = sys.argv[1] if len(sys.argv) > 1 else discover_sqlite()
df = load_sqlite_dataset(sqlite_path)
try:
    mgr = GeocellManager(C.GEOCELL_DIR + "/finished_geocells")
except Exception:
    mgr = None
# self-provision the Köppen raster from the object store when configured
# (reference downloads it before enrichment, backend/s3bucket.py:1399)
store = None
if os.environ.get("GEO_TPU_STORE_URL"):
    from geoguessr_ai_tpu.data.s3 import ObjectStore

    store = ObjectStore()
df = enrich_dataframe(df, geocell_manager=mgr, store=store)
# CLIP BPE from the vendored assets (drop a real OpenAI vocab into
# data/clip_bpe/ or set CLIP_BPE_DIR for real-checkpoint interop);
# hash fallback only if the assets are missing.
pretrain(df, default_tokenize_fn())
PY
