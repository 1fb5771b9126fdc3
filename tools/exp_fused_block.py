#!/usr/bin/env python
"""Round-3 fully-fused block kernel e2e (the VERDICT #1 fallback lever).

fused_block_attention puts LN + qkv GEMM + attention + out-proj in one
pallas_call for stages 1/3 (N=256: whole-window cells, no q-tiling) —
removing the qkv HBM round-trip (1.5 GB/block at stage 1), the ~4 ms
boundary layout copies, and the f32 LN round-trip that the round-3
profile located.  Sweeps WB (windows per cell) and combines with the
int8-MLP win.  Baseline: 742 img/s @ B=320 (qkv kernel at stages 1+3) /
756.9 with int8-mlp @ 448."""
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

    import geoguessr_ai_tpu.ops.window_attention as wa
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    base = TinyViTConfig.tiny_vit_21m_512()
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

    xs = {}
    for B in (320, 448):
        xs[B] = jax.device_put(
            jnp.zeros((B, 512, 512, 3), jnp.bfloat16), tpu
        )

    ref_emb = None
    CASES = [
        ("base_742", 320, dict(), None),
        ("fb13_wb4", 320, dict(fused_block_stages=(1, 3),
                               pallas_attention_stages=()), 4),
        ("fb13_wb8", 320, dict(fused_block_stages=(1, 3),
                               pallas_attention_stages=()), 8),
        ("fb1_qkv3", 320, dict(fused_block_stages=(1,),
                               pallas_attention_stages=(3,)), 4),
        ("fb13_int8mlp_b448", 448,
         dict(fused_block_stages=(1, 3), pallas_attention_stages=(),
              quant_mode="static", quant_sites=("fc1", "fc2")), 4),
    ]
    for name, B, over, wb in CASES:
        if wb is not None:
            wa.FUSED_BLOCK_WB = wb
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
