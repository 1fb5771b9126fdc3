#!/usr/bin/env python
"""Train matrix round 2: every round-3 case whose ACTIVATION footprint
exceeded the B=16 program (b32 noremat, b64 accum2=micro32, b64
remat01) died in the terminal-side compile helper — the same opaque
exit-1 as the int8 programs, so large train programs are uncompilable
through this relay regardless of remat policy.  This matrix holds the
microbatch at the proven 16-image footprint and scales the OPTIMIZER
batch via scanned bf16 grad accumulation instead."""
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
        ("b32_accum2", 32, dict(), 2),
        ("b64_accum4", 64, dict(), 4),
        ("b128_accum8", 128, dict(), 8),
        ("b16_remat_dots", 16, dict(remat=True, remat_policy="dots"), 1),
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
                        [rng.uniform(-170, 170, B),
                         rng.uniform(-60, 60, B)], axis=-1
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
            float(np.asarray(metrics["loss"]))
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
            log(case=name + "_fail", err=str(e)[:200])
        del state, batch, step


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
