#!/usr/bin/env python
"""Bisect the fused-block kernel's compile-helper failure: compile the
KERNEL ALONE at stage-1 shapes, progressively enabling its pieces.
Variants: plain qkv-attn (the known-good existing kernel as control),
fused minus LN, fused minus proj, WB=1 vs WB=4, full."""
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

    import geoguessr_ai_tpu.ops.window_attention as wa

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    # stage-1 shapes: W=5120 (B=320 x 16 windows), N=256, C=192, H=6
    W, N, C, H = 5120, 256, 192, 6
    hd = C // H
    D = C
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.bfloat16), tpu
    )
    ls = jax.device_put(jnp.ones((C,), jnp.float32), tpu)
    lb = jax.device_put(jnp.zeros((C,), jnp.float32), tpu)
    wqkv = jax.device_put(
        jnp.asarray(rng.normal(0, 0.05, (C, 3 * D)), jnp.float32), tpu
    )
    bqkv = jax.device_put(jnp.zeros((3 * D,), jnp.float32), tpu)
    wproj = jax.device_put(
        jnp.asarray(rng.normal(0, 0.05, (D, C)), jnp.float32), tpu
    )
    bproj = jax.device_put(jnp.zeros((C,), jnp.float32), tpu)
    ab = jax.device_put(
        jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32), tpu
    )

    def timed(f, args, label):
        try:
            t0 = time.time()
            out = f(*args)
            np.asarray(out[0, 0:1, 0:1])
            cs = time.time() - t0
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            np.asarray(out[0, 0:1, 0:1])
            dt = (time.perf_counter() - t0) / iters
            log(case=label, compile_s=round(cs, 1), ms=round(dt * 1e3, 2))
        except Exception as e:
            log(case=label + "_fail", err=str(e)[:160])

    # control: existing qkv kernel (known to compile) on same shapes
    qkv = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (W, N, 3 * D)), jnp.bfloat16), tpu
    )
    timed(
        jax.jit(
            lambda t, b: wa._attention_qkv_fused_pallas(
                t, b, hd**-0.5, H
            )
        ),
        (qkv, ab),
        "control_qkv_kernel",
    )

    for wb in (1, 4):
        timed(
            jax.jit(
                functools.partial(
                    wa._fused_block_pallas,
                    scale=hd**-0.5, num_heads=H, eps=1e-5, block_w=wb,
                )
            ),
            (x, ls, lb, wqkv, bqkv, wproj, bproj, ab),
            f"fused_full_wb{wb}",
        )

    # minus-LN variant: patch the kernel to skip LN (identity)
    orig_kernel = wa._fused_block_kernel

    def kernel_no_ln(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                     bproj_ref, ab_ref, o_ref, *, scale, hd, num_heads,
                     eps):
        WB, N_, C_ = x_ref.shape
        D_ = num_heads * hd
        ln = x_ref[...].reshape(WB * N_, C_)
        qkv_l = (
            jax.lax.dot_general(
                ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(ln.dtype)
            + bqkv_ref[0]
        ).reshape(WB, N_, 3 * D_)

        def slot(s):
            return jnp.stack(
                [
                    qkv_l[w, :, h * 3 * hd + s * hd: h * 3 * hd + (s + 1) * hd]
                    for w in range(WB)
                    for h in range(num_heads)
                ],
                axis=0,
            )

        q, k, v = slot(0), slot(1), slot(2)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        abf = ab_ref[...].astype(jnp.float32)
        s = s * scale + jnp.concatenate([abf] * WB, axis=0)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_cat = jnp.concatenate(
            [
                jnp.concatenate(
                    [o[w * num_heads + h] for h in range(num_heads)],
                    axis=-1,
                )
                for w in range(WB)
            ],
            axis=0,
        ).astype(ln.dtype)
        out = jax.lax.dot_general(
            o_cat, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0].astype(jnp.float32)
        o_ref[...] = out.reshape(WB, N_, C_).astype(o_ref.dtype)

    wa._fused_block_kernel = kernel_no_ln
    timed(
        jax.jit(
            functools.partial(
                wa._fused_block_pallas,
                scale=hd**-0.5, num_heads=H, eps=1e-5, block_w=1,
            )
        ),
        (x, ls, lb, wqkv, bqkv, wproj, bproj, ab),
        "fused_no_ln_wb1",
    )
    wa._fused_block_kernel = orig_kernel


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
