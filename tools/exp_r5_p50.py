#!/usr/bin/env python
"""Round-5 p50 guess-latency breakdown + dispatch/fetch optimization.

The tracked p50 single-panorama latency (bench.py measure_p50_latency,
239-254 ms across sessions) hides a relay-shaped inefficiency in
ServingEngine.predict_batch (serving/engine.py):

* fused_preprocess runs EAGERLY — at B=1 each jnp op is its own device
  dispatch through the axon relay (~30 ms dispatch floor each);
* the four result arrays (lnglat, top_vals, top_idx, emb) are fetched
  with four separate np.asarray calls — four device->host round trips.

This script measures the component costs (decode / upload / preprocess
/ serve / fetch) and then A/Bs a "packed" serve: ONE jitted program
taking the uint8 views (preprocess inside) and returning ONE f32 array
per row ([lnglat(2) | top_vals(5) | top_idx(5) | emb(576)]) so the
request does exactly one dispatch and one fetch.  A third variant adds
the production embed config (fused-block stages 1+3) to see whether
the big-batch kernel choices transfer to B=1.

Everything is one process / one launch (relay compiles queue serially).
Writes data/out/P50_BREAKDOWN.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(**kw):
    print(json.dumps(kw), flush=True)


def p50(fn, n=15):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(float(np.percentile(ts, 50)), 1), round(
        float(np.percentile(ts, 90)), 1
    )


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.data.pipeline import decode_jpeg
    from geoguessr_ai_tpu.models.super_guessr import decode_predictions
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture_dir = os.path.join(repo, "tests", "fixtures")
    files = sorted(
        f for f in os.listdir(fixture_dir) if f.startswith("heading=")
    )[:4]
    blobs = [
        open(os.path.join(fixture_dir, f), "rb").read() for f in files
    ]

    log(stage="engine_build")
    engine = ServingEngine(backbone="tinyvit")
    S = engine.image_size
    device = jax.devices()[0]
    out = {"platform": device.platform}

    def decode_views():
        views = np.zeros((1, 4, S, S, 3), np.uint8)
        for v, blob in enumerate(blobs):
            views[0, v] = decode_jpeg(blob, S)
        return views

    views = decode_views()

    # ---- baseline full path (exactly bench.measure_p50_latency) ----
    log(stage="baseline_fullpath")
    out["full_ms"] = p50(lambda: engine.predict_batch(decode_views()))
    log(full=out["full_ms"])

    # ---- components ----
    out["decode_ms"] = p50(decode_views)

    def upload():
        d = jax.device_put(views, device)
        np.asarray(d[0, 0, 0, 0:1, 0])  # honest barrier

    out["upload_ms"] = p50(upload)

    dviews = jax.device_put(views, device)

    def preprocess_eager():
        mean, std = engine.norm
        px = fused_preprocess(
            jnp.asarray(views), tuple(mean), tuple(std), S
        )
        np.asarray(px[0, 0, 0, 0:1, 0])

    out["preprocess_eager_ms"] = p50(preprocess_eager)

    mean, std = engine.norm
    pixels = fused_preprocess(
        jnp.asarray(views), tuple(mean), tuple(std), S
    )

    def serve_only():
        r = engine._serve(
            engine.variables, pixels, engine.centroids, None
        )
        np.asarray(r[0][0, 0:1])

    out["serve_only_ms"] = p50(serve_only)

    res = engine._serve(engine.variables, pixels, engine.centroids, None)

    def fetch_four():
        for a in res:
            np.asarray(a)

    out["fetch4_ms"] = p50(fetch_four)
    log(**{k: v for k, v in out.items() if k != "platform"})

    # ---- packed one-dispatch/one-fetch variants ----
    k = engine.num_candidates
    table_centroids = engine.centroids

    def make_packed(model):
        def _packed(variables, views_u8, centroids):
            px = fused_preprocess(
                views_u8, tuple(mean), tuple(std), S
            )
            emb, logits = model.apply(variables, pixel_values=px)
            probs, preds, lnglat, topk = decode_predictions(
                logits, centroids, k
            )
            return jnp.concatenate(
                [
                    lnglat.astype(jnp.float32),
                    topk.values.astype(jnp.float32),
                    topk.indices.astype(jnp.float32),
                    emb.astype(jnp.float32),
                ],
                axis=-1,
            )

        return jax.jit(_packed)

    variants = {"packed_default": make_packed(engine.model)}

    # production embed config at B=1 pano (fused 1+3 like bench.py)
    import dataclasses

    from geoguessr_ai_tpu.models import SuperGuessr, TinyViT
    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig

    prod_tv = TinyViTConfig.tiny_vit_21m_512(
        fused_block_stages=(1, 3), pallas_attention_stages=()
    )
    prod_model = SuperGuessr(
        num_cells=engine.table.num_cells,
        backbone=TinyViT(prod_tv),
        panorama=True,
        embed_dim=576,
    )
    variants["packed_fused13"] = make_packed(prod_model)

    gate_ref = None
    for name, packed in variants.items():
        log(stage="compile", variant=name)
        try:
            r = packed(engine.variables, dviews, table_centroids)
            row = np.asarray(r[0])
        except Exception as e:  # noqa: BLE001
            log(variant=name, error=str(e)[:300])
            continue
        if gate_ref is None:
            gate_ref = row
            agree = True
        else:
            agree = bool(
                np.allclose(row[:2], gate_ref[:2], atol=1e-3)
                and np.allclose(
                    row[2 : 2 + k], gate_ref[2 : 2 + k], atol=1e-3
                )
            )

        def full_packed(p=packed):
            v = decode_views()
            r = p(engine.variables, jax.device_put(v, device),
                  table_centroids)
            np.asarray(r)

        out[f"{name}_full_ms"] = p50(full_packed)
        log(variant=name, full_ms=out[f"{name}_full_ms"], agree=agree)

    with open(
        os.path.join(repo, "data", "out", "P50_BREAKDOWN.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    log(done=True)


if __name__ == "__main__":
    main()
