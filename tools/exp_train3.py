#!/usr/bin/env python
"""Round-3 train-step optimization matrix (VERDICT #5).

Round-2 state: 23.2 panos/s @ B=16 (12,647-cell head, fwd+bwd+AdamW);
B=32 needs remat for zero gain; remat B=64 OOMs.  New levers measured
here: selective remat (stages 0/1 carry the big activations), the
"dots" checkpoint policy, and scanned bf16 gradient accumulation
(activation memory of one microbatch).  Reports panos/s + train MFU
(fwd+bwd ~= 3x54 GFLOP/img).
"""
import dataclasses
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


PEAK_TFLOPS = 197e12
GFLOP_PER_IMG_TRAIN = 3 * 54e9


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import OptimizerConfig
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    table = CentroidTable.load("data/geocells/centroid_table.npz")
    centroids = jax.device_put(jnp.asarray(table.centroids), tpu)
    rng = np.random.default_rng(0)

    CASES = [
        ("b16_noremat", 16, dict(), 1),
        ("b32_noremat", 32, dict(), 1),
        ("b64_accum2", 64, dict(), 2),
        ("b64_remat01", 64, dict(remat=True, remat_stages=(0, 1)), 1),
        ("b64_remat_dots", 64, dict(remat=True, remat_policy="dots"), 1),
        ("b96_accum3_remat01", 96,
         dict(remat=True, remat_stages=(0, 1)), 3),
    ]

    for name, B, tv_over, accum in CASES:
        tv = TinyViTConfig.tiny_vit_21m_512(**tv_over)
        model = SuperGuessr(
            num_cells=table.num_cells,
            backbone=TinyViT(tv),
            panorama=True,
            embed_dim=tv.embed_dim,
        )
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(0),
                pixel_values=jnp.zeros(
                    (1, 4, tv.image_size, tv.image_size, 3), jnp.bfloat16
                ),
            )
            state = create_train_state(
                model, variables, OptimizerConfig(), 100
            )
        state = jax.device_put(state, tpu)
        batch = {
            "pixel_values": jax.device_put(
                jnp.asarray(
                    rng.normal(
                        0, 1, (B, 4, tv.image_size, tv.image_size, 3)
                    ),
                    jnp.bfloat16,
                ),
                tpu,
            ),
            "coords": jax.device_put(
                jnp.asarray(
                    np.stack(
                        [
                            rng.uniform(-170, 170, B),
                            rng.uniform(-60, 60, B),
                        ],
                        axis=-1,
                    ),
                    jnp.float32,
                ),
                tpu,
            ),
        }
        step = jax.jit(
            lambda s, b, c, _a=accum: train_step(
                s, b, c, grad_accum_steps=_a
            ),
            donate_argnums=(0,),
        )
        try:
            t0 = time.time()
            state2, metrics = step(state, batch, centroids)
            np.asarray(metrics["loss"])[()]
            compile_s = time.time() - t0
            iters = 8
            t0 = time.perf_counter()
            s = state2
            for _ in range(iters):
                s, metrics = step(s, batch, centroids)
            float(np.asarray(metrics["loss"]))
            dt = (time.perf_counter() - t0) / iters
            panos_s = B / dt
            mfu = panos_s * 4 * GFLOP_PER_IMG_TRAIN / PEAK_TFLOPS
            log(case=name, B=B, accum=accum, compile_s=round(compile_s, 1),
                ms=round(dt * 1e3, 1), panos_s=round(panos_s, 1),
                train_mfu=round(float(mfu), 4),
                loss=round(float(np.asarray(metrics["loss"])), 3))
            del s, state2
        except Exception as e:
            log(case=name + "_fail", err=str(e)[:250])
        del state, batch, step


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
