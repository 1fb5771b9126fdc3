#!/usr/bin/env python
"""Round-5 production profile: per-fusion breakdown of the CURRENT
embed path (fused 1+3 + noproj stage-2 + static-int8 fc1/fc2 + int8
activation storage at dw/stem = PROD_QUANT_SITES, B=512 — the
1047.5 img/s program) to re-rank the remaining gap vs the 1585 img/s
structural roofline (tools/roofline.py).

The round-4b profile this replaces was taken at the 981 img/s config
(fc1/fc2 only); the int8-storage sites moved ~30 ms and the remaining
~165 ms above the structural floor needs a fresh category table before
spending more kernel effort (VERDICT r4 #8 discipline).

Reuses exp_r4_profile's trace/aggregate/categorize machinery.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_r4_profile import _profile, log  # noqa: E402


def run_embed():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.tinyvit import PROD_QUANT_SITES
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    C.enable_compilation_cache()

    cfg = TinyViTConfig.tiny_vit_21m_512()
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    base = TinyViT(cfg)
    with jax.default_device(cpu):
        v = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        stats = calibrate_act_stats(
            jax.jit(lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"])),
            v,
            [jnp.asarray(rng.normal(0, 1, (2, 512, 512, 3)), jnp.float32)],
        )
    model = TinyViT(
        dataclasses.replace(
            cfg,
            fused_block_stages=(1, 3),
            pallas_attention_stages=(),
            quant_mode="static",
            quant_sites=PROD_QUANT_SITES,
        )
    )
    v = jax.device_put(v, tpu)
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)
    x = jax.device_put(jnp.zeros((512, 512, 512, 3), jnp.bfloat16), tpu)
    fwd = jax.jit(lambda v, s, x: model.apply({**v, "act_scales": s}, x))
    out = fwd(v, scales, x)
    np.asarray(out[0, 0:1])
    t0 = time.perf_counter()
    for _ in range(5):
        out = fwd(v, scales, x)
    np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / 5
    log(probe="embed_r5_confirm", ms=round(dt * 1e3, 1),
        img_s=round(512 / dt, 1), panos_s=round(128 / dt, 1))
    _profile(fwd, (v, scales, x), "embed_r5",
             lambda o: np.asarray(o[0, 0:1]))


if __name__ == "__main__":
    run_embed()
