#!/usr/bin/env python
"""Round-5 B>512 re-probe at the int8-storage production config.

The round-4 escape campaign proved embed B>512 was an honest HBM OOM
(B=544 ran 805.6 < 981 img/s at B=512, paging against capacity) — but
that was the bf16-activation program.  PROD_QUANT_SITES now stores the
dw-conv inputs and the 3.2 GB stem boundary as int8, cutting the
biggest resident activations in half, so the capacity wall has moved
and the batch question re-opens (VERDICT r4 discipline: re-measure
when the program changes under a closed verdict).

E2E ladder on the real chip: B=512 (same-process baseline), 576, 640 at
the production program (fused 1+3 + noproj stage-2 + static int8 at
fc1/fc2/dw/stem).
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
    dvars = jax.device_put(variables, tpu)

    model_q = TinyViT(dataclasses.replace(
        base_cfg, quant_mode="static", quant_sites=PROD_QUANT_SITES))
    fwd = jax.jit(
        lambda v, xx: model_q.apply({**v, "act_scales": scales}, xx))

    results = {}
    for B in (512, 576, 640):
        try:
            x = jax.device_put(
                jnp.zeros((B, 512, 512, 3), jnp.bfloat16), tpu)
            ok = False
            for attempt in range(3):
                try:
                    np.asarray(fwd(dvars, x)[0, 0:1])
                    ok = True
                    break
                except Exception as e:
                    log(B=B, compile_attempt=attempt, error=str(e)[:200])
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
            results[B] = img_s
            log(B=B, ms=round(dt * 1e3, 2), img_s=round(img_s, 1),
                panos_s=round(img_s / 4, 1))
            del x
        except Exception as e:
            log(B=B, error=str(e)[:300])

    log(done=True, results={str(k): round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
