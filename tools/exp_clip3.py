#!/usr/bin/env python
"""Round-3 CLIP attention v2 (VERDICT #6): out-proj fused into the
kernel, hb8 retry.  Baseline: 393.5 img/s @ B=320 with the hb4 kernel
(~76% MFU).  Target >=420 or a documented negative."""
import dataclasses
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    base = CLIPVisionConfig.vit_l_14_336()
    model = CLIPVisionTower(base)
    with jax.default_device(cpu):
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, base.image_size, base.image_size, 3), jnp.bfloat16),
        )
    v = jax.device_put(v, tpu)
    B = 320
    x = jax.device_put(
        jnp.zeros((B, base.image_size, base.image_size, 3), jnp.bfloat16),
        tpu,
    )

    ref_emb = None
    CASES = [
        ("hb4_base", dict()),
        ("hb4_fuse_proj", dict(pallas_fuse_proj=True)),
        ("hb8_fuse_proj", dict(pallas_fuse_proj=True, pallas_head_block=8)),
        ("hb8_plain", dict(pallas_head_block=8)),
    ]
    for name, over in CASES:
        cfg = dataclasses.replace(base, **over)
        m = CLIPVisionTower(cfg)
        fwd = jax.jit(lambda vv, xx, _m=m: _m.apply(vv, xx).pooler_output)
        try:
            t0 = time.time()
            np.asarray(fwd(v, x)[0, 0:1])
            cs = time.time() - t0
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(v, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / iters
            rec = dict(case=name, compile_s=round(cs, 1),
                       ms=round(dt * 1e3, 1), img_s=round(B / dt, 1))
            emb = np.asarray(fwd(v, x)[:8], np.float32)
            if ref_emb is None:
                ref_emb = emb
            else:
                cos = (emb * ref_emb).sum(-1) / (
                    np.linalg.norm(emb, axis=-1)
                    * np.linalg.norm(ref_emb, axis=-1)
                )
                rec["min_cosine"] = round(float(cos.min()), 6)
            log(**rec)
        except Exception as e:
            log(case=name + "_fail", err=str(e)[:200])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
