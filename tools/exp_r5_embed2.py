#!/usr/bin/env python
"""Round-5 second embed ladder: the two fusion-map levers.

tools/exp_r5_mapfusions.py named the remaining elementwise/copy blocks
of the 1047.5 img/s program (data/out/embed_r5_hlo.txt):

* the stage-1/2/3 local_conv reads the attention-residual tensor
  UNQUANTIZED (stage-1: multiply_reduce_fusion 8.64 ms/block) — the
  proven int8-storage mechanism at a new site: "localdw";
* nn.LayerNorm(dtype=f32) at the MLP input materializes a full f32
  LAYOUT copy (copy.211/220, 4.49 ms each at stage 1) because XLA
  relays out the f32 tensor for the fc1 GEMM — MLP_LN_HANDROLLED
  computes f32 stats without an f32 value tensor.

E2E ladder at B=512, production program, one process (fresh jit per
variant; trace-time knobs are safe per the knob NOTE).  Cosine gate vs
the production baseline on a shared random input.
"""
import dataclasses
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


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import tinyvit as tv
    from geoguessr_ai_tpu.models.tinyvit import (
        PROD_QUANT_SITES,
        TinyViT,
        TinyViTConfig,
    )
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    log(device=str(tpu))

    base_cfg = TinyViTConfig.tiny_vit_21m_512(
        fused_block_stages=(1, 3), pallas_attention_stages=()
    )
    with jax.default_device(cpu):
        variables = TinyViT(base_cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        )
        model_cal = TinyViT(dataclasses.replace(
            base_cfg, dtype=jnp.float32, quant_mode="calibrate"))
        rngd = np.random.default_rng(0)
        stats = calibrate_act_stats(
            jax.jit(lambda v, xx: model_cal.apply(
                v, xx, mutable=["act_stats"])),
            jax.device_put(variables, cpu),
            [jnp.asarray(rngd.normal(0, 1, (2, 512, 512, 3)),
                         jnp.float32)],
        )
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)

    B = 512
    dvars = jax.device_put(variables, tpu)
    # Random timing input so the first 8 output rows double as the
    # cosine gate (a separate gate batch would cost a second compile
    # per variant through the relay).
    x = jax.device_put(
        jnp.asarray(
            rngd.normal(0, 1, (B, 512, 512, 3)).astype(np.float32),
            jnp.bfloat16,
        ),
        tpu,
    )

    # v8 LANDED: PROD_QUANT_SITES now includes "localdw", so the base
    # set for this ladder is spelled explicitly (the ladder compares
    # the pre-landing production set against +localdw).
    base_sites = tuple(s for s in PROD_QUANT_SITES if s != "localdw")
    variants = [
        ("v7_prod", base_sites, False),
        ("v8_localdw", base_sites + ("localdw",), False),
        ("v9_lnhand", base_sites, True),
        ("v10_both", base_sites + ("localdw",), True),
    ]
    results = {}
    gate_ref = None
    for name, sites, lnhand in variants:
        tv.MLP_LN_HANDROLLED = lnhand
        try:
            model_q = TinyViT(dataclasses.replace(
                base_cfg, quant_mode="static", quant_sites=sites))
            fwd = jax.jit(
                lambda v, xx, m=model_q: m.apply(
                    {**v, "act_scales": scales}, xx))
            ok = False
            for attempt in range(4):
                try:
                    np.asarray(fwd(dvars, x)[0, 0:1])
                    ok = True
                    break
                except Exception as e:
                    log(variant=name, compile_attempt=attempt,
                        error=str(e)[:200])
                    time.sleep(20)
            if not ok:
                continue
            emb = np.asarray(fwd(dvars, x)[:8]).astype(np.float32)
            if gate_ref is None:
                gate_ref = emb
                cos = 1.0
            else:
                num = (gate_ref * emb).sum(-1)
                den = np.linalg.norm(gate_ref, axis=-1) * np.linalg.norm(
                    emb, axis=-1
                )
                cos = float((num / den).min())
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(dvars, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / iters
            img_s = B / dt
            results[name] = img_s
            log(variant=name, sites=list(sites), lnhand=lnhand,
                ms=round(dt * 1e3, 2), img_s=round(img_s, 1),
                panos_s=round(img_s / 4, 1), cos_min=round(cos, 6))
        except Exception as e:
            log(variant=name, error=str(e)[:300])
        finally:
            tv.MLP_LN_HANDROLLED = False

    log(done=True, results={k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
