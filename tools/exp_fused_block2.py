#!/usr/bin/env python
"""Fused-block round 2: stage-3 with VMEM-auto-sized WB (the stage-3
crash was the (WB*H, N, N) f32 score stack at 18.9 MB), the int8-mlp
combo at B=448, and a REAL parity check (round 1 used zero inputs, so
cosines were 0/0).  Baseline now: 801.5 img/s (fused stage 1 + qkv
stage 3)."""
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

    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    base = TinyViTConfig.tiny_vit_21m_512()  # now fused (1,) + qkv (3,)
    model = TinyViT(base)
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        v = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
        model_cal = TinyViT(
            dataclasses.replace(base, dtype=jnp.float32,
                                quant_mode="calibrate")
        )
        stats = calibrate_act_stats(
            jax.jit(
                lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"])
            ),
            v,
            [jnp.asarray(rng.normal(0, 1, (2, 512, 512, 3)), jnp.float32)],
        )
    v = jax.device_put(v, tpu)
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)

    # REAL image-like inputs so parity cosines are meaningful
    def make_x(B):
        return jax.device_put(
            jnp.asarray(
                rng.normal(0, 1, (B, 512, 512, 3)), jnp.bfloat16
            ),
            tpu,
        )

    xs = {320: make_x(320), 448: make_x(448)}
    ref_emb = None
    CASES = [
        ("fb1_qkv3_default", 320, dict()),
        ("fb13_auto", 320, dict(fused_block_stages=(1, 3),
                                pallas_attention_stages=())),
        ("fb1_qkv3_int8mlp_448", 448,
         dict(quant_mode="static", quant_sites=("fc1", "fc2"))),
        ("fb1_qkv3_b448", 448, dict()),
    ]
    for name, B, over in CASES:
        cfg = dataclasses.replace(base, **over)
        m = TinyViT(cfg)
        if over.get("quant_mode") == "static":
            fwd = jax.jit(
                lambda vv, xx, _m=m: _m.apply(
                    {**vv, "act_scales": scales}, xx
                )
            )
        else:
            fwd = jax.jit(lambda vv, xx, _m=m: _m.apply(vv, xx))
        x = xs[B]
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
            rec = dict(case=name, B=B, compile_s=round(cs, 1),
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
