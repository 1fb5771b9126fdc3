#!/usr/bin/env python
"""Round-4b: 4D fused-block kernel (window partition in BlockSpec) A/B.

Cases:
  micro — standalone stage-1-shaped op (B=512, 64x64x192, w=16, 6 heads):
          partition+fused_block_attention+unpartition vs
          fused_block_attention_4d.
  e2e   — TinyViT-21M-512 embed @ B=512 production config,
          fused_block_4d off vs on.
"""
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def run_micro():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.ops import window_attention as WA

    C.enable_compilation_cache()
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    B, H, Wd, Cc, heads, w = 512, 64, 64, 192, 6, 16
    D = Cc
    hd = D // heads
    N = w * w
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, H, Wd, Cc)), jnp.bfloat16), tpu
    )
    ls = jnp.asarray(rng.uniform(0.5, 1.5, (Cc,)), jnp.float32)
    lb = jnp.asarray(rng.normal(0, 0.1, (Cc,)), jnp.float32)
    wq = jnp.asarray(rng.normal(0, 0.05, (Cc, 3 * D)), jnp.float32)
    bq = jnp.asarray(rng.normal(0, 0.05, (3 * D,)), jnp.float32)
    wp = jnp.asarray(rng.normal(0, 0.05, (D, Cc)), jnp.float32)
    bp = jnp.asarray(rng.normal(0, 0.05, (Cc,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (heads, N, N)), jnp.float32)
    weights = tuple(jax.device_put(a, tpu) for a in (ls, lb, wq, bq, wp, bp, bias))
    scale = hd**-0.5

    def via_partition(x, ls, lb, wq, bq, wp, bp, bias):
        wins = WA._window_partition(x, w)
        out = WA.fused_block_attention(
            wins, ls, lb, wq, bq, wp, bp, bias, scale, heads
        )
        return WA._window_unpartition(out, w, (H, Wd))

    def via_4d(x, ls, lb, wq, bq, wp, bp, bias):
        return WA.fused_block_attention_4d(
            x, ls, lb, wq, bq, wp, bp, bias, scale, heads, w
        )

    outs = {}
    for name, fn in (("partition", via_partition), ("4d", via_4d)):
        try:
            jf = jax.jit(fn)
            out = jf(x, *weights)
            np.asarray(out[0, 0, 0, 0:1])
            outs[name] = np.asarray(out[:2].astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(10):
                out = jf(x, *weights)
            np.asarray(out[0, 0, 0, 0:1])
            dt = (time.perf_counter() - t0) / 10
            log(probe=f"micro_{name}", ms=round(dt * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            log(probe=f"micro_{name}", error=repr(e)[:400])
    if len(outs) == 2:
        a, b = outs["partition"], outs["4d"]
        log(probe="micro_maxdiff",
            max_diff=round(float(np.abs(a - b).max()), 5))


def run_e2e():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    C.enable_compilation_cache()
    cfg = TinyViTConfig.tiny_vit_21m_512()
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    base = TinyViT(cfg)
    with jax.default_device(cpu):
        v = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        stats = calibrate_act_stats(
            jax.jit(lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"])),
            v,
            [jnp.asarray(rng.normal(0, 1, (2, 512, 512, 3)), jnp.float32)],
        )
    v = jax.device_put(v, tpu)
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 0.5, (512, 512, 512, 3)), jnp.bfloat16), tpu
    )
    outs = {}
    for fb4d in (False, True):
        model = TinyViT(
            dataclasses.replace(
                cfg,
                fused_block_stages=(1, 3),
                quant_mode="static",
                quant_sites=("fc1", "fc2"),
                fused_block_4d=fb4d,
            )
        )
        fwd = jax.jit(lambda v, s, x, m=model: m.apply({**v, "act_scales": s}, x))
        try:
            out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            outs[fb4d] = np.asarray(out[:4].astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(5):
                out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / 5
            log(probe=f"e2e_fb4d={fb4d}", ms=round(dt * 1e3, 1),
                img_s=round(512 / dt, 1), panos_s=round(128 / dt, 1))
        except Exception as e:  # noqa: BLE001
            log(probe=f"e2e_fb4d={fb4d}", error=repr(e)[:400])
    if len(outs) == 2:
        a, b = outs[False], outs[True]
        cos = float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        )
        log(probe="e2e_cosine", cosine=round(cos, 6),
            max_diff=round(float(np.abs(a - b).max()), 4))


def main():
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--case":
        {"micro": run_micro, "e2e": run_e2e}[argv[1]]()
        return
    names = argv[0].split(",") if argv else ["micro", "e2e"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=5400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                log(case=name, **json.loads(line))
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                stderr_tail=proc.stderr[-600:])
        else:
            log(case=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
