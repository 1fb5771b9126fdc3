#!/usr/bin/env python
"""int8 probe round 2.

Probe 1 findings (exp_int8_probe.py): attention-site int8 kills the
terminal-side compile helper; MLP-only int8 compiles but is throughput
NEUTRAL (746 vs 742 img/s); conv-only int8 compiles and LOSES (612).

This answers two questions:
  a) Is a raw int8 dot actually ~2x bf16 on this chip/toolchain?  If
     not, the int8 avenue is dead here regardless of fusion quality.
  b) Which attention site (qkv vs proj) kills the compiler?
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def timed(fwd, args, iters=10):
    # slice ON DEVICE before np.asarray — fetching the full output drags
    # GBs through the ~66 MB/s relay and dwarfs the kernel time
    np.asarray(fwd(*args)[0:1, 0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    np.asarray(out[0:1, 0:1])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.ops.quant import int8_static_matmul

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)

    # (a) raw GEMM: stage-2 fc1 shape at B=320 (tokens = 320*32*32)
    for M, K, N in ((327680, 384, 1536), (327680, 384, 1152)):
        gflop = 2 * M * K * N / 1e9
        x = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16), tpu
        )
        w = jax.device_put(
            jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.bfloat16), tpu
        )
        try:
            dt = timed(jax.jit(lambda a, b: a @ b), (x, w))
            log(probe="raw_bf16", M=M, K=K, N=N, ms=round(dt * 1e3, 3),
                tflops=round(gflop / dt / 1e3, 1))
        except Exception as e:
            log(probe="raw_bf16_fail", M=M, K=K, N=N, err=str(e)[:160])

        xq = jax.device_put(
            jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8), tpu
        )
        wq = jax.device_put(
            jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8), tpu
        )

        def raw_int8(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        try:
            dt = timed(jax.jit(raw_int8), (xq, wq))
            log(probe="raw_int8_dot", M=M, K=K, N=N, ms=round(dt * 1e3, 3),
                tops=round(gflop / dt / 1e3, 1))
        except Exception as e:
            log(probe="raw_int8_dot_fail", M=M, K=K, N=N, err=str(e)[:160])

        # full static path incl. quantize epilogue + dequant
        wf = jax.device_put(
            jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32), tpu
        )
        amax = jax.device_put(jnp.asarray(4.0, jnp.float32), tpu)
        try:
            dt = timed(
                jax.jit(
                    lambda a, b, s: int8_static_matmul(a, b, s)
                ),
                (x, wf, amax),
            )
            log(probe="static_int8_full", M=M, K=K, N=N,
                ms=round(dt * 1e3, 3), tflops=round(gflop / dt / 1e3, 1))
        except Exception as e:
            log(probe="static_int8_full_fail", M=M, K=K, N=N,
                err=str(e)[:160])

    # (b) which attention site kills the compiler
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cpu = jax.devices("cpu")[0]
    cfg = TinyViTConfig.tiny_vit_21m_512()
    model = TinyViT(cfg)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16),
        )
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        xs = jnp.asarray(
            rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)),
            jnp.float32,
        )
        stats = calibrate_act_stats(
            jax.jit(lambda v, x: model_cal.apply(v, x, mutable=["act_stats"])),
            variables, [xs],
        )
    variables = jax.device_put(variables, tpu)
    act_scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)
    B = 320
    xb = jax.device_put(
        jnp.asarray(
            rng.normal(0, 1, (B, cfg.image_size, cfg.image_size, 3)),
            jnp.bfloat16,
        ),
        tpu,
    )
    for name, sites in (
        ("int8_qkv_only", ("qkv",)),
        ("int8_proj_only", ("proj",)),
        ("int8_mlp_b448", ("fc1", "fc2")),
    ):
        Bx = 448 if name.endswith("b448") else B
        if Bx != B:
            xb2 = jax.device_put(
                jnp.asarray(
                    rng.normal(0, 1, (Bx, cfg.image_size, cfg.image_size, 3)),
                    jnp.bfloat16,
                ),
                tpu,
            )
        else:
            xb2 = xb
        m = TinyViT(
            dataclasses.replace(cfg, quant_mode="static", quant_sites=sites)
        )
        fwd = jax.jit(
            lambda v, s, x, _m=m: _m.apply({**v, "act_scales": s}, x)
        )
        try:
            t0 = time.time()
            np.asarray(fwd(variables, act_scales, xb2)[0, 0:1])
            cs = time.time() - t0
            dt = timed(fwd, (variables, act_scales, xb2))
            log(probe=name, B=Bx, compile_s=round(cs, 1),
                ms=round(dt * 1e3, 2), img_s=round(Bx / dt, 1))
        except Exception as e:
            log(probe=name + "_fail", err=str(e)[:160])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
