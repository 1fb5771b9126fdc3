#!/usr/bin/env python
"""Round-4b: fused stage-0 MBConv kernel (ops/mbconv.py) measurement.

Cases (each a fresh subprocess so a compile crash can't eat the rest):
  micro — standalone MBConv op at production stage-0 shapes
          (B=512, 128x128x96, E=384): XLA composition vs Pallas kernel
          at tile_h 8/16/32.  Small programs -> fast compiles; picks
          the tile for e2e.
  e2e   — TinyViT-21M-512 embed forward @ B=512 with the full round-4
          production config (fused 1+3, noproj stage-2, static-int8
          MLP), fused_mbconv off vs on; numerics cosine + img/s.

Usage: exp_r4_mbconv.py [micro,e2e] [--tile N]
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


def _sync(x):
    np.asarray(jax_np(x))


def jax_np(x):
    import jax.numpy as jnp

    return x[(0,) * (x.ndim - 1)][None] if x.ndim else x


def timeit(fn, args, iters=5):
    out = fn(*args)
    np.asarray(out.reshape(-1)[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.reshape(-1)[0:1])
    return (time.perf_counter() - t0) / iters


def run_micro():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.ops import mbconv as M

    C.enable_compilation_cache()
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    B, H, W, Cc, E = 512, 128, 128, 96, 384
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, H, W, Cc)), jnp.bfloat16), tpu
    )
    w1 = jnp.asarray(rng.normal(0, 0.1, (Cc, E)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, E)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (E, Cc)), jnp.float32)
    s1 = jnp.ones((E,)); b1 = jnp.zeros((E,)) + 0.02
    s2 = jnp.ones((E,)) * 1.1; b2 = jnp.zeros((E,)) - 0.01
    s3 = jnp.ones((Cc,)) * 0.9; b3 = jnp.zeros((Cc,)) + 0.01
    args = tuple(
        jax.device_put(a, tpu)
        for a in (x, w1, s1, b1, w2, s2, b2, w3, s3, b3)
    )

    xla = jax.jit(lambda *a: M._mbconv_xla(*a, exact=False))
    dt = timeit(xla, args)
    log(probe="micro_xla", ms=round(dt * 1e3, 2))
    ref = np.asarray(xla(*args)[:2, :4].astype(jnp.float32))

    def sweep(label, tile):
        try:
            pk = jax.jit(
                lambda *a: M._mbconv_pallas(*a, exact=False, tile_h=tile)
            )
            out = np.asarray(pk(*args)[:2, :4].astype(jnp.float32))
            cos = float(
                (ref * out).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
            )
            dt = timeit(pk, args)
            log(probe=label, ms=round(dt * 1e3, 2), cosine=round(cos, 6),
                max_diff=round(float(np.abs(ref - out).max()), 4))
        except Exception as e:  # noqa: BLE001 — log-and-continue sweep
            log(probe=label, error=repr(e)[:300])

    for tile in (8, 16, 32):
        sweep(f"micro_pallas_t{tile}", tile)
    # ablations: attribute the VPU time (dw accumulator dtype; GELU)
    M.ACC_DTYPE = jnp.bfloat16
    sweep("micro_pallas_t32_accbf16", 32)
    M.SKIP_GELU = True
    sweep("micro_pallas_t32_accbf16_nogelu", 32)
    M.ACC_DTYPE = jnp.float32
    sweep("micro_pallas_t32_nogelu", 32)
    M.SKIP_GELU = False


def run_e2e(tile=None):
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops import mbconv as M
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    C.enable_compilation_cache()
    if tile:
        M.MB_TILE_H = tile

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
    for fused in (False, True):
        model = TinyViT(
            dataclasses.replace(
                cfg,
                fused_block_stages=(1, 3),
                quant_mode="static",
                quant_sites=("fc1", "fc2"),
                fused_mbconv=fused,
            )
        )
        fwd = jax.jit(lambda v, s, x, m=model: m.apply({**v, "act_scales": s}, x))
        try:
            out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            outs[fused] = np.asarray(out[:4].astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(5):
                out = fwd(v, scales, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / 5
            log(probe=f"e2e_fused={fused}", ms=round(dt * 1e3, 1),
                img_s=round(512 / dt, 1), panos_s=round(128 / dt, 1),
                tile=tile or M.MB_TILE_H)
        except Exception as e:  # noqa: BLE001
            log(probe=f"e2e_fused={fused}", error=repr(e)[:400])
    if len(outs) == 2:
        a, b = outs[False], outs[True]
        cos = float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        )
        log(probe="e2e_cosine", cosine=round(cos, 6),
            max_diff=round(float(np.abs(a - b).max()), 4))


def main():
    tile = None
    argv = list(sys.argv[1:])
    if "--tile" in argv:
        i = argv.index("--tile")
        tile = int(argv[i + 1])
        del argv[i : i + 2]
    if argv and argv[0] == "--case":
        {"micro": run_micro, "e2e": lambda: run_e2e(tile)}[argv[1]]()
        return
    names = argv[0].split(",") if argv else ["micro", "e2e"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        cmd = [sys.executable, os.path.abspath(__file__), "--case", name]
        if tile:
            cmd += ["--tile", str(tile)]
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=repo, env=env, capture_output=True, text=True,
            timeout=5400,
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
