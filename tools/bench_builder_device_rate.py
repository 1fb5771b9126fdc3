#!/usr/bin/env python
"""Device-limited embed-builder rate: run the predecoded builder twice in
one process (first run pays the remote compile; second run measures
predecode + device embed + SQLite write), with phase timestamps."""
import json, os, sys, tempfile, time
import numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.config import EmbedBuildConfig
from geoguessr_ai_tpu.data.embed_builder import Embedder, build_embedding_sqlite
from geoguessr_ai_tpu.data.sqlite_dataset import create_sqlite_from_records

blob = open("/root/repo/tests/fixtures/heading=000.jpg", "rb").read()
N = 2048
cfg = EmbedBuildConfig(batch_size=512, fetch_threads=8)
emb = Embedder(cfg.backbone)
with tempfile.TemporaryDirectory() as td:
    raw = os.path.join(td, "raw.sqlite")
    create_sqlite_from_records(raw, [
        {"location_id": f"l{i}", "lat": 1.0, "lon": 2.0, "heading": 0, "image": blob}
        for i in range(N)
    ])
    build_embedding_sqlite(raw, os.path.join(td, "w.sqlite"), cfg, embedder=emb, predecoded=True)  # warm
    events = []
    t0 = time.perf_counter()
    build_embedding_sqlite(raw, os.path.join(td, "e.sqlite"), cfg, embedder=emb,
                           predecoded=True,
                           log_fn=lambda r: events.append((time.perf_counter()-t0, dict(r))))
    wall = time.perf_counter() - t0
    t_pre = next(t for t, r in events if r["phase"] == "predecode_done")
    embed_s = wall - t_pre
    out = {
        "rows": N, "wall_s": round(wall, 1),
        "predecode_s": round(t_pre, 1),
        "predecode_img_per_s_1core": round(N / t_pre, 1),
        "embed_phase_s": round(embed_s, 1),
        "device_embed_img_per_s": round(N / embed_s, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    json.dump(out, open("/tmp/builder_rate.json", "w"), indent=1)
