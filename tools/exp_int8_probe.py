#!/usr/bin/env python
"""Bisect the terminal-side compile failure of full-int8 TinyViT programs.

Round-2 AND the first round-3 static attempt both saw tpu_compile_helper
exit 1 (fast) on full-24-layer int8 programs while bf16 equivalents and
small int8 towers compile.  This probes which construct kills it:
site subsets (conv / qkv+proj / fc1+fc2), stage subsets, and the
Pallas-kernel interaction.  Any succeeding config is also timed + parity
checked, so partial int8 wins land directly.

Run under nohup; JSON lines to stdout.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


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
    )
    mean = np.asarray(TINYVIT_NORM_MEAN, np.float32)
    std = np.asarray(TINYVIT_NORM_STD, np.float32)
    xn = (views.astype(np.float32) / 255.0 - mean) / std

    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16),
        )
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        cal_fn = jax.jit(
            lambda v, x: model_cal.apply(v, x, mutable=["act_stats"])
        )
        stats = calibrate_act_stats(cal_fn, variables, [jnp.asarray(xn)])
        stats = jax.tree.map(np.asarray, stats)
    log(phase="calibrated", n_sites=len(jax.tree_util.tree_leaves(stats)))

    variables = jax.device_put(variables, tpu)
    act_scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)

    B = 320
    xb = np.zeros((B, cfg.image_size, cfg.image_size, 3), np.float32)
    xb[: len(xn)] = xn
    xb = jax.device_put(jnp.asarray(xb, jnp.bfloat16), tpu)

    emb_ref = None  # filled by the bf16 run below

    PROBES = [
        ("bf16_base", dict()),  # reference timing + parity embeddings
        ("int8_nopallas", dict(quant_mode="static",
                               pallas_attention_stages=())),
        ("int8_mlp_only", dict(quant_mode="static",
                               quant_sites=("fc1", "fc2"))),
        ("int8_attn_only", dict(quant_mode="static",
                                quant_sites=("qkv", "proj"))),
        ("int8_conv_only", dict(quant_mode="static",
                                quant_sites=("conv",))),
        ("int8_stages23", dict(quant_mode="static",
                               quant_stages=(2, 3))),
    ]

    for name, over in PROBES:
        c = dataclasses.replace(cfg, **over)
        m = TinyViT(c)
        if over.get("quant_mode") == "static":
            fwd = jax.jit(
                lambda v, s, x, _m=m: _m.apply({**v, "act_scales": s}, x)
            )
            args = (variables, act_scales, xb)
        else:
            fwd = jax.jit(lambda v, x, _m=m: _m.apply(v, x))
            args = (variables, xb)
        try:
            t0 = time.time()
            np.asarray(fwd(*args)[0, 0:1])
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(*args)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / 10
            rec = dict(phase="ok", probe=name, compile_s=round(compile_s, 1),
                       ms=round(dt * 1e3, 2), img_s=round(B / dt, 1))
            emb = np.asarray(fwd(*args)[:4], np.float32)
            if name == "bf16_base":
                emb_ref = emb
            elif emb_ref is not None:
                cos = (emb * emb_ref).sum(-1) / (
                    np.linalg.norm(emb, axis=-1)
                    * np.linalg.norm(emb_ref, axis=-1)
                )
                rec["min_cosine"] = round(float(cos.min()), 6)
            log(**rec)
        except Exception as e:
            log(phase="fail", probe=name, err=str(e)[:200])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
