#!/usr/bin/env python
"""Round-5 int8-storage follow-up ladder: the "dw" win's mechanism
(int8 HBM storage across a fusion boundary, bf16 compute) applied to
the two remaining named boundaries.

tools/exp_r5_int8.py measured +5.2% e2e from storing the dw-conv INPUT
int8 (985.3 -> 1036.7 img/s).  The same producer-write + consumer-read
byte halving is available at:

* "dwout" — the dw conv's GELU output feeding the conv3 1x1 (MBConv +
  PatchMerging), the twin boundary of "dw";
* "stem"  — patch-embed conv1's GELU output feeding conv2 (256^2 x 48
  @ B=512 = 3.2 GB, the largest single activation in the model).

E2E ladder at B=512 on the real chip, production program (fused-block
stages 1+3 + noproj stage 2 defaults + static int8).  v3 = the current
production baseline from the first ladder.
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

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
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
    x = jax.device_put(jnp.zeros((B, 512, 512, 3), jnp.bfloat16), tpu)

    variants = [
        ("v3_prod", ("fc1", "fc2", "dw")),
        ("v4_dwout", ("fc1", "fc2", "dw", "dwout")),
        ("v5_dwout_stem", ("fc1", "fc2", "dw", "dwout", "stem")),
        ("v6_stem_only", ("fc1", "fc2", "dw", "stem")),
    ]
    results = {}
    for name, sites in variants:
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
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(dvars, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / iters
            img_s = B / dt
            results[name] = img_s
            log(variant=name, sites=list(sites),
                ms=round(dt * 1e3, 2), img_s=round(img_s, 1),
                panos_s=round(img_s / 4, 1))
        except Exception as e:
            log(variant=name, error=str(e)[:300])

    log(done=True, results={k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
