#!/usr/bin/env python
"""Round-4b: software-pipelined stage-2 noproj kernel A/B.

The structural roofline (docs/performance.md round-4b) shows the
stage-2 kernel at its SERIALIZED floor: 25.6 ms/block ~= MXU 12.9 +
softmax VPU 13.4.  S2_SW_PIPELINE reorders the head/q-tile loop to
issue step i+1's score matmul before step i's softmax, letting the
independent units overlap (~10 ms/block reclaimable if the hardware
dual-issues).

Measures the standalone stage-2 op and the production e2e embed, flag
off vs on.
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
    W, N, Cc, heads = 512, 1024, 384, 12
    hd = Cc // heads
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (W, N, Cc)), jnp.bfloat16), tpu
    )
    ls = jnp.ones((Cc,))
    lb = jnp.zeros((Cc,))
    wq = jnp.asarray(rng.normal(0, 0.05, (Cc, 3 * Cc)), jnp.float32)
    bq = jnp.asarray(rng.normal(0, 0.05, (3 * Cc,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (heads, N, N)), jnp.float32)
    args = tuple(jax.device_put(a, tpu) for a in (x, ls, lb, wq, bq, bias))

    outs = {}
    for pipe in (False, True):
        WA.S2_SW_PIPELINE = pipe
        fn = jax.jit(
            lambda *a: WA._fb_s2_pallas(*a, hd**-0.5, heads, 1e-5)
        )
        try:
            out = fn(*args)
            np.asarray(out[0, 0, 0:1])
            outs[pipe] = np.asarray(out[:2, :4].astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args)
            np.asarray(out[0, 0, 0:1])
            dt = (time.perf_counter() - t0) / 10
            log(probe=f"micro_pipe={pipe}", ms=round(dt * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            log(probe=f"micro_pipe={pipe}", error=repr(e)[:400])
    WA.S2_SW_PIPELINE = False
    if len(outs) == 2:
        log(probe="micro_maxdiff",
            max_diff=round(float(np.abs(outs[False] - outs[True]).max()), 5))


def run_e2e():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops import window_attention as WA
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
    model = TinyViT(
        dataclasses.replace(
            cfg,
            fused_block_stages=(1, 3),
            quant_mode="static",
            quant_sites=("fc1", "fc2"),
        )
    )
    for pipe in (False, True):
        WA.S2_SW_PIPELINE = pipe
        fwd = jax.jit(
            lambda v, s, x, m=model, p=pipe: m.apply({**v, "act_scales": s}, x)
        )
        try:
            out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            t0 = time.perf_counter()
            for _ in range(5):
                out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / 5
            log(probe=f"e2e_pipe={pipe}", ms=round(dt * 1e3, 1),
                img_s=round(512 / dt, 1), panos_s=round(128 / dt, 1))
        except Exception as e:  # noqa: BLE001
            log(probe=f"e2e_pipe={pipe}", error=repr(e)[:400])
    WA.S2_SW_PIPELINE = False


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
