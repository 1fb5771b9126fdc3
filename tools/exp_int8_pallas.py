#!/usr/bin/env python
"""Round-4b: does MOSAIC emit the double-rate int8 MXU mode?

The round-3 int8 chapter closed on "a raw int8 dot runs at bf16 rate"
— but that was XLA's lax.dot_general lowering (tools/exp_int8_probe2).
Mosaic lowers matmuls itself (tpu.matmul); if a pallas s8 x s8 -> s32
GEMM runs ~2x the bf16 rate, the chapter reopens (MLP GEMMs, qkv sites,
stage-0 1x1s all become halvable).

Measures pallas tiled GEMMs at MLP-ish shapes: bf16 vs int8, plus the
XLA int8 dot for reference.
"""
import functools
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from geoguessr_ai_tpu import config as C

    C.enable_compilation_cache()
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)

    def matmul_kernel(a_ref, b_ref, o_ref, *, out_dt):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dt,
        )

    def pallas_matmul(a, b, bm, bn, out_dt):
        M, K = a.shape
        N = b.shape[1]
        return pl.pallas_call(
            functools.partial(matmul_kernel, out_dt=out_dt),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dt),
            grid=(M // bm, N // bn),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(a, b)

    # Single-dispatch ms-scale timings through the relay are dominated
    # by client dispatch overhead (the chained-dispatch artifact in the
    # pretrain chapter): back-to-back runs of the same int8 K=8192 dot
    # measured 132.3 then 69.1 TOPS.  So: chain R matmuls inside ONE
    # jit (lax.scan accumulating into a resident acc) so device compute
    # dominates the wall; compare int8 vs bf16 at identical structure.
    R = 16

    def chain(a, bs, acc_dt):
        def body(acc, b):
            d = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            return acc + d, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((a.shape[0], bs.shape[2]), acc_dt), bs
        )
        return acc

    # (M, K, N): square deep-K sweep + the production TinyViT stage-2
    # MLP GEMM shapes (fc1 384->1536, fc2 1536->384 at 131k tokens).
    shapes = [
        (4096, 2048, 4096),
        (4096, 4096, 4096),
        (131072, 384, 1536),
        (131072, 1536, 384),
    ]
    for M, K, N in shapes:
        flops = 2 * M * K * N * R
        ab = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16), tpu
        )
        bbs = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (R, K, N)), jnp.bfloat16), tpu
        )
        a8 = jax.device_put(
            jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8), tpu
        )
        b8s = jax.device_put(
            jnp.asarray(rng.integers(-127, 127, (R, K, N)), jnp.int8), tpu
        )
        cases = {
            "xla_int8": (jax.jit(
                functools.partial(chain, acc_dt=jnp.int32)), (a8, b8s)),
            "xla_bf16": (jax.jit(
                functools.partial(chain, acc_dt=jnp.float32)), (ab, bbs)),
        }
        for name, (jf, args) in cases.items():
            try:
                out = jf(*args)
                np.asarray(out[0, 0:1])
                t0 = time.perf_counter()
                for _ in range(5):
                    out = jf(*args)
                np.asarray(out[0, 0:1])
                dt = (time.perf_counter() - t0) / 5
                log(probe=f"{name}_M{M}_K{K}_N{N}", ms=round(dt * 1e3, 3),
                    tops=round(flops / dt / 1e12, 1))
            except Exception as e:  # noqa: BLE001
                log(probe=f"{name}_M{M}_K{K}_N{N}", error=repr(e)[:300])


if __name__ == "__main__":
    main()
