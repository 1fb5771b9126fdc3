#!/usr/bin/env python
"""Round-4 batch #3: remat x batch matrix with the Pallas attention bwd.

The escape campaign de-opaqued the train batch wall: B>=24 is an honest
HBM OOM in the stage-2 backward (216-768 MB bf16 temps), and the old
remat blocker (scoped-VMEM overshoot in the VJP recompute's replayed
forward kernel) is structurally gone now that the backward runs in
dedicated Pallas kernels with 1-2 MB stack budgets.  So remat is
finally *testable*: checkpoint the activation-heavy stages and re-probe
the batch matrix.  Ref workload: main_coordinator_idun.py:149-157
(reference trains B=24).

Each case runs in a fresh subprocess so a compile crash doesn't kill
the batch.
"""
import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def _train_case(B, accum=1, remat_stages=None, remat_policy="full",
                scan_stages=None, scan_remat=False):
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
    tv = TinyViTConfig.tiny_vit_21m_512()
    if scan_stages is not None:
        tv = dataclasses.replace(
            tv, scan_stages=tuple(scan_stages), scan_remat=scan_remat
        )
    if remat_stages is not None:
        tv = dataclasses.replace(
            tv,
            remat=True,
            remat_stages=tuple(remat_stages),
            remat_policy=remat_policy,
        )
    model = SuperGuessr(
        num_cells=table.num_cells,
        backbone=TinyViT(tv),
        panorama=True,
        embed_dim=tv.embed_dim,
    )
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1, 4, 512, 512, 3), jnp.bfloat16),
        )
        state = create_train_state(model, variables, OptimizerConfig(), 100)
    state = jax.device_put(state, tpu)
    batch = {
        "pixel_values": jax.device_put(
            jnp.asarray(
                rng.normal(0, 1, (B, 4, 512, 512, 3)), jnp.bfloat16
            ),
            tpu,
        ),
        "coords": jax.device_put(
            jnp.asarray(
                np.stack(
                    [rng.uniform(-170, 170, B), rng.uniform(-60, 60, B)],
                    axis=-1,
                ),
                jnp.float32,
            ),
            tpu,
        ),
    }
    step = jax.jit(
        lambda s, b, c: train_step(s, b, c, grad_accum_steps=accum),
        donate_argnums=(0,),
    )
    t0 = time.time()
    state2, metrics = step(state, batch, centroids)
    loss0 = float(np.asarray(metrics["loss"]))
    compile_s = time.time() - t0
    iters = 6
    s = state2
    t0 = time.perf_counter()
    for _ in range(iters):
        s, metrics = step(s, batch, centroids)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", compile_s=round(compile_s, 1), ms=round(dt * 1e3, 1),
        panos_s=round(B / dt, 1),
        train_mfu=round(B / dt * 4 * 3 * 54e9 / 197e12, 4),
        loss=round(loss0, 3))


PROBES = {
    # stage 2 holds the OOM dumps' largest temps — checkpoint it first
    "b24_r2": lambda: _train_case(24, remat_stages=(2,)),
    "b32_r2": lambda: _train_case(32, remat_stages=(2,)),
    "b32_r12": lambda: _train_case(32, remat_stages=(1, 2)),
    "b48_r123": lambda: _train_case(48, remat_stages=(1, 2, 3)),
    "b48_rall": lambda: _train_case(48, remat_stages=(0, 1, 2, 3)),
    "b64_rall": lambda: _train_case(64, remat_stages=(0, 1, 2, 3)),
    "b32_r2_dots": lambda: _train_case(
        32, remat_stages=(2,), remat_policy="dots"
    ),
    "b16_r2": lambda: _train_case(16, remat_stages=(2,)),
    "b96_rall": lambda: _train_case(96, remat_stages=(0, 1, 2, 3)),
    "b128_rall_accum2": lambda: _train_case(
        128, accum=2, remat_stages=(0, 1, 2, 3)
    ),
    # round-4b wave 2: accum rate at the new 391.2 ms micro step
    "b64_accum4": lambda: _train_case(64, accum=4),
    # round-5: lax.scan over a stage's blocks (program-size lever for
    # the 4,884-fusion backward tail; VERDICT r4 #2)
    "b16_scan2": lambda: _train_case(16, scan_stages=(2,)),
    "b16_scan123": lambda: _train_case(16, scan_stages=(1, 2, 3)),
    # both B=16 scan probes OOM at compile (scan2 by 250 MB, scan123 by
    # 6.2 GB: scan forfeits the unrolled schedule's cross-block buffer
    # reuse).  B=12 fits under scan2 — the clean program-size A/B:
    "b12_base": lambda: _train_case(12),
    "b12_scan2": lambda: _train_case(12, scan_stages=(2,)),
    # scan-of-remat: checkpoint each scanned block (config.scan_remat)
    # so the stacked residuals shrink to one block's carry — the memory
    # fix for the OOMs above.  b24/b32_scan123_sremat probe whether the
    # combo unlocks B>16 without grad accumulation (the r4 matrix's
    # unrolled-remat B>=24 OOM verdict does not cover this layout).
    "b16_scan2_sremat": lambda: _train_case(
        16, scan_stages=(2,), scan_remat=True
    ),
    "b24_scan123_sremat": lambda: _train_case(
        24, scan_stages=(1, 2, 3), scan_remat=True
    ),
    "b32_scan123_sremat": lambda: _train_case(
        32, scan_stages=(1, 2, 3), scan_remat=True
    ),
    # B=32 ties the unrolled B=16 rate (41.8 vs 41.9) — does the rate
    # hold (or improve) at B=64, fully replacing the accum path?
    # MEASURED: OOM — B=32 is the scan-of-remat native ceiling; B>32
    # stays on scanned accumulation.
    "b64_scan123_sremat": lambda: _train_case(
        64, scan_stages=(1, 2, 3), scan_remat=True
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if args.probe:
        PROBES[args.probe]()
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in PROBES:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", name],
            cwd=repo,
            env=env,
            capture_output=True,
            text=True,
            timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                inner = json.loads(line)
                out = {"probe": name}
                out.update(inner)
                log(**out)
            except (json.JSONDecodeError, TypeError, AttributeError):
                log(probe=name, raw=line[:300])
        if proc.returncode != 0:
            log(probe=name, result="CRASH", rc=proc.returncode,
                wall_s=wall, stderr_tail=proc.stderr[-700:])
        else:
            log(probe=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
