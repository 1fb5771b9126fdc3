"""FastAPI serving app — actually wired to the inference engine.

The reference's API is a stub with dummy routes and a broken import
(backend/api.py:39-91, main.py:3); here the same route surface is
implemented against ServingEngine:

  GET  /                      — service info
  GET  /health                — liveness
  POST /submit_image/         — upload 1-4 images, returns submission id
  GET  /prediction/{id}       — prediction for a submission
  GET  /predicition/{id}      — [sic] alias kept for reference-client compat
  GET  /model/{id}            — model metadata
  GET  /image/{id}            — echo a submitted image

FastAPI is an optional dependency; ``create_app()`` raises a clear error
without it, and ``geoguessr_ai_tpu.serving`` imports fine regardless.
"""

from __future__ import annotations

import itertools
import threading
from typing import Dict, List, Optional


def create_app(engine=None, backbone: str = "tinyvit",
               checkpoint: Optional[str] = None):
    try:
        from fastapi import FastAPI, File, HTTPException, UploadFile
        from fastapi.responses import Response
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fastapi is not installed; pip install 'geoguessr-ai-tpu[serving]'"
        ) from e

    app = FastAPI(title="geoguessr-ai-tpu", version="0.1.0")
    state: Dict = {
        "engine": engine,
        "submissions": {},
        "counter": itertools.count(1),
        # RLock: get_batcher() constructs the engine while already
        # holding the lock
        "lock": threading.RLock(),
    }

    def get_engine():
        # same check-then-set discipline as the batcher: two concurrent
        # first requests must not each build (and compile) an engine
        with state["lock"]:
            if state["engine"] is None:
                from geoguessr_ai_tpu.serving.engine import ServingEngine

                state["engine"] = ServingEngine(
                    backbone=backbone, checkpoint=checkpoint
                )
        return state["engine"]

    def get_batcher():
        # check-then-set under the lock: two concurrent first requests must
        # not each build a MicroBatcher (duplicate threads + split queues
        # that never coalesce).
        with state["lock"]:
            if state.get("batcher") is None:
                from geoguessr_ai_tpu.serving.engine import MicroBatcher

                batcher = MicroBatcher(get_engine())
                # Precompile every bucket size in the background so cold
                # buckets don't pay a 4-15 min jit compile inside a
                # request (requests queue behind the warmup compiles but
                # predict()'s default timeout covers them).
                threading.Thread(
                    target=batcher.warmup, daemon=True
                ).start()
                state["batcher"] = batcher
        return state["batcher"]

    # exposed for tests (batcher-singleton + warmup behavior)
    app.state.get_batcher = get_batcher

    @app.get("/")
    def root():
        return {
            "service": "geoguessr-ai-tpu",
            "model": backbone,
            "endpoints": [
                "/health",
                "/submit_image/",
                "/prediction/{id}",
                "/model/{id}",
                "/image/{id}",
            ],
        }

    @app.get("/health")
    def health():
        return {"status": "ok"}

    @app.get("/model/{model_id}")
    def model_info(model_id: str):
        eng = get_engine()
        return {
            "model_id": model_id,
            "backbone": backbone,
            "num_cells": eng.table.num_cells,
            "image_size": eng.image_size,
        }

    @app.post("/submit_image/")
    async def submit_image(files: List[UploadFile] = File(...)):
        if len(files) not in (1, 4):
            raise HTTPException(400, "submit exactly 1 or 4 images")
        blobs = [await f.read() for f in files]
        with state["lock"]:
            sid = next(state["counter"])
            state["submissions"][sid] = {
                "blobs": blobs,
                "result": None,
                # per-submission lock: concurrent polls for the same id
                # must not each run a device predict
                "lock": threading.Lock(),
            }
            # Bound memory: evict oldest completed submissions beyond
            # 1000.  In-flight/unfetched ones (result None) are spared so
            # a slow poller doesn't 404 — unless the map hits the hard
            # cap (2000), where oldest-regardless keeps memory bounded.
            subs = state["submissions"]
            if len(subs) > 1000:
                for old_sid in [
                    s for s, sub in subs.items()
                    if sub["result"] is not None
                ][: len(subs) - 1000]:
                    subs.pop(old_sid)
            while len(subs) > 2000:
                subs.pop(next(iter(subs)))
        return {"submission_id": sid, "num_images": len(blobs)}

    def _predict(sid: int):
        sub = state["submissions"].get(sid)
        if sub is None:
            raise HTTPException(404, f"submission {sid} not found")
        # Serialize per submission (NOT under the global lock — device
        # predicts from different submissions must still coalesce in the
        # batcher): the second concurrent poll blocks, then reuses the
        # cached result instead of running a duplicate device predict.
        with sub["lock"]:
            if sub["result"] is None:
                import numpy as np

                from geoguessr_ai_tpu.data.pipeline import decode_jpeg

                eng = get_engine()
                views = np.zeros(
                    (4, eng.image_size, eng.image_size, 3), np.uint8
                )
                try:
                    for v, blob in enumerate(sub["blobs"][:4]):
                        views[v] = decode_jpeg(blob, eng.image_size)
                except Exception as e:
                    raise HTTPException(400, f"undecodable image: {e}")
                if len(sub["blobs"]) == 1:
                    views[1:] = views[0]
                # concurrent requests coalesce into one device batch
                r = get_batcher().predict(views)
                # keep one image for /image/{id}
                sub["blobs"] = sub["blobs"][:1]
                sub["result"] = {
                    "lat": r.lat,
                    "lon": r.lon,
                    "top": [
                        {
                            "geocell_index": i,
                            "prob": p,
                            "country": c,
                            "admin1": a,
                        }
                        for i, p, c, a in zip(
                            r.top_ids,
                            r.top_probs,
                            r.top_countries,
                            r.top_admin1,
                        )
                    ],
                }
        return sub["result"]

    @app.get("/prediction/{sid}")
    def prediction(sid: int):
        return _predict(sid)

    # Reference route name typo preserved for client compatibility
    # (backend/api.py:84 "/predicition/{id}").
    @app.get("/predicition/{sid}")
    def predicition(sid: int):
        return _predict(sid)

    @app.get("/image/{sid}")
    def image(sid: int):
        sub = state["submissions"].get(sid)
        if sub is None:
            raise HTTPException(404, f"submission {sid} not found")
        return Response(content=sub["blobs"][0], media_type="image/jpeg")

    return app


def main():  # pragma: no cover
    import uvicorn

    uvicorn.run(create_app(), host="0.0.0.0", port=8000)


if __name__ == "__main__":  # pragma: no cover
    main()
