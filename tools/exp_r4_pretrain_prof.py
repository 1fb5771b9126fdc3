#!/usr/bin/env python
"""Per-fusion profile of the CLIP pretrain step at B=64 — the measured
6 img/s (10.7 s/step) is ~65x below the CLIP embed forward's per-image
rate at the same resolution, so something in the step is pathological.
Reuses exp_r4_profile's trace/categorize helper."""
import importlib.util
import json
import os
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        "exp_r4_profile",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp_r4_profile.py"),
    )
    prof = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prof)

    import geoguessr_ai_tpu.train.pretrain_clip as pc
    from geoguessr_ai_tpu.config import PretrainConfig
    from geoguessr_ai_tpu.models.clip_text import CLIPModel, CLIPTextConfig
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig

    B = 64
    vision = CLIPVisionConfig.vit_l_14_336()
    text = CLIPTextConfig.vit_l_text()
    model = CLIPModel(vision, text)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1, 336, 336, 3), jnp.bfloat16),
            input_ids=jnp.zeros((1, text.max_length), jnp.int32),
        )["params"]
    mask = pc.trainable_mask(params)
    cfg = PretrainConfig()
    tx, _ = pc.make_pretrain_optimizer(cfg, 1000)
    params = jax.device_put(params, tpu)
    opt_state = jax.jit(tx.init)(params)
    batch = {
        "pixel_values": jax.device_put(
            jnp.asarray(rng.normal(0, 1, (B, 336, 336, 3)), jnp.bfloat16),
            tpu,
        ),
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(0, 49000, (B, text.max_length)),
                        jnp.int32),
            tpu,
        ),
    }
    # NOT donated so the profile loop can reuse the same inputs.
    step = jax.jit(lambda p, o, b: pc.pretrain_step(p, o, b, model, tx, mask))
    t0 = time.time()
    p2, o2, loss = step(params, opt_state, batch)
    np.asarray(loss)
    log(probe="compile", s=round(time.time() - t0, 1))
    t0 = time.perf_counter()
    for _ in range(3):
        _, _, loss = step(params, opt_state, batch)
    np.asarray(loss)
    log(probe="confirm", ms=round((time.perf_counter() - t0) / 3 * 1e3, 1))
    prof._profile(step, (params, opt_state, batch), "pretrain",
                  lambda o: np.asarray(o[2]))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
