#!/usr/bin/env python
"""Re-measure embed batch >512 under the round-5 int8-storage config.

The round-4 verdict "embed B>512 = honest HBM OOM (B=544 runs 805.6 <
B=512)" was measured BEFORE the int8 activation-storage sites landed
(dw/stem/localdw halve the dominant activation boundaries — the stem
boundary alone dropped 3.2 GB -> 1.6 GB at B=512).  With that HBM
freed, the capacity pressure that degraded B=544 may be gone, and the
throughput-vs-batch curve may keep rising past 512.

E2E ladder, production program (fused 1+3, noproj 2, static int8 at
PROD_QUANT_SITES), one process, fresh jit per batch size; B=512 is
re-measured first as the same-session baseline.
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
    fwd = jax.jit(lambda v, xx: model_q.apply(
        {**v, "act_scales": scales}, xx))

    results = {}
    for B in (512, 544, 576, 640):
        try:
            x = jax.device_put(
                jnp.asarray(
                    rngd.normal(0, 1, (B, 512, 512, 3)).astype(
                        np.float32
                    ),
                    jnp.bfloat16,
                ),
                tpu,
            )
        except Exception as e:  # noqa: BLE001
            log(batch=B, upload_error=str(e)[:200])
            continue
        ok = False
        for attempt in range(3):
            try:
                np.asarray(fwd(dvars, x)[0, 0:1])
                ok = True
                break
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                log(batch=B, compile_attempt=attempt, error=msg[:300])
                if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower():
                    break
                time.sleep(20)
        if not ok:
            del x
            continue
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(dvars, x)
        np.asarray(out[0, 0:1])
        dt = (time.perf_counter() - t0) / iters
        img_s = B / dt
        results[str(B)] = round(img_s, 1)
        log(batch=B, ms=round(dt * 1e3, 2), img_s=round(img_s, 1),
            panos_s=round(img_s / 4, 1))
        del x

    log(done=True, results=results)


if __name__ == "__main__":
    main()
