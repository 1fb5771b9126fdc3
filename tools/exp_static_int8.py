#!/usr/bin/env python
"""Round-3 experiment: static-calibrated int8 TinyViT embed throughput.

Measures e2e img/s at production shapes for quant_mode="static" vs bf16
(VERDICT round-2 #1: the one lever above bf16 physics — v5e int8 MXU is
2x the bf16 rate).  Calibration runs on host CPU (f32, fixture
panorama); the TPU programs then contain NO data-dependent quant reduce.

Emits JSON lines to stdout; run under nohup (remote compiles 4-15 min
each, queued serially).
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def sync_fetch(out):
    return np.asarray(out[0, 0:1])


def timed(fwd, args, iters=10):
    sync_fetch(fwd(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    sync_fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import TINYVIT_NORM_MEAN, TINYVIT_NORM_STD
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    log(phase="start", tpu=str(tpu))

    cfg = TinyViTConfig.tiny_vit_21m_512()
    model = TinyViT(cfg)

    fixtures = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(__file__), "..", "tests", "fixtures",
                "heading=*.jpg",
            )
        )
    )
    views = np.stack(
        [decode_jpeg(open(p, "rb").read(), cfg.image_size) for p in fixtures]
    )  # (4, 512, 512, 3) u8
    mean = np.asarray(TINYVIT_NORM_MEAN, np.float32)
    std = np.asarray(TINYVIT_NORM_STD, np.float32)
    xn = (views.astype(np.float32) / 255.0 - mean) / std  # (4, H, W, 3)

    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16),
        )
        # calibrate f32 on CPU (abs-max of bf16 inference ~= f32 abs-max)
        t0 = time.time()
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        cal_fn = jax.jit(
            lambda v, x: model_cal.apply(v, x, mutable=["act_stats"])
        )
        stats = calibrate_act_stats(
            cal_fn, variables, [jnp.asarray(xn)]
        )
        stats = jax.tree.map(lambda a: np.asarray(a), stats)
        log(phase="calibrated", secs=round(time.time() - t0, 1),
            n_sites=len(jax.tree_util.tree_leaves(stats)))

    variables = jax.device_put(variables, tpu)
    act_scales = jax.device_put(
        jax.tree.map(jnp.asarray, stats), tpu
    )

    model_q = TinyViT(dataclasses.replace(cfg, quant_mode="static"))
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    fwd_q = jax.jit(
        lambda v, s, x: model_q.apply({**v, "act_scales": s}, x)
    )

    for B in (320, 448):
        xb = np.zeros((B, cfg.image_size, cfg.image_size, 3), np.float32)
        xb[: len(xn)] = xn
        xb = jax.device_put(jnp.asarray(xb, jnp.bfloat16), tpu)

        try:
            dt_q = timed(fwd_q, (variables, act_scales, xb))
            log(phase="int8_static", B=B, ms=round(dt_q * 1e3, 2),
                img_s=round(B / dt_q, 1))
        except Exception as e:
            log(phase="int8_static_fail", B=B, err=str(e)[:300])
            continue

        if B == 320:
            emb_q = np.asarray(fwd_q(variables, act_scales, xb)[:4], np.float32)
            dt = timed(fwd, (variables, xb))
            log(phase="bf16", B=B, ms=round(dt * 1e3, 2),
                img_s=round(B / dt, 1))
            emb = np.asarray(fwd(variables, xb)[:4], np.float32)
            cos = (emb * emb_q).sum(-1) / (
                np.linalg.norm(emb, axis=-1) * np.linalg.norm(emb_q, axis=-1)
            )
            log(phase="parity", min_cosine=float(cos.min()),
                cosines=[round(float(c), 6) for c in cos])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
