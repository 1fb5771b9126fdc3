#!/usr/bin/env python
"""Round-4 batch #2: training with the Pallas attention backward.

Measures the train step after rerouting all attention backwards through
VMEM-resident Pallas kernels (small-N interleaved kernel for stages 1/3,
q-tiled head-major K1/K2 for stage 2) — the round-4 profile charged
~250 ms of the 680 ms B=16 step to stage-2's XLA attention autodiff and
~95+ ms to the stages-1/3 XLA recompute.  Also re-probes the batch wall
(B>=20 previously died at 16.11-18.36 MB scoped VMEM in the stage-3
bwd kernel; the stack budget is now 1 MB) and sanity-checks that the
hybrid stage-2 op left the inference program's throughput unchanged.

Each case runs in a fresh subprocess so a compile crash doesn't kill
the batch.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def probe_embed_sanity():
    """Default-config e2e embed at B=320 — must stay ~802 img/s (the
    hybrid op's primal trace is supposed to be identical)."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

    cfg = TinyViTConfig.tiny_vit_21m_512()
    model = TinyViT(cfg)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        v = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
    v = jax.device_put(v, tpu)
    x = jax.device_put(jnp.zeros((320, 512, 512, 3), jnp.bfloat16), tpu)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    t0 = time.time()
    np.asarray(fwd(v, x)[0, 0:1])
    compile_s = time.time() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(v, x)
    np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", compile_s=round(compile_s, 1),
        img_s=round(320 / dt, 1))


def _train_case(B, accum=1, profile=False):
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
    donate = () if profile else (0,)
    step = jax.jit(
        lambda s, b, c: train_step(s, b, c, grad_accum_steps=accum),
        donate_argnums=donate,
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
    if profile:
        import glob
        import gzip

        d = "/tmp/tv_trainprof_r4b"
        with jax.profiler.trace(d):
            for _ in range(3):
                state2, metrics = step(state, batch, centroids)
            float(np.asarray(metrics["loss"]))
        time.sleep(2)
        ev = []
        for t in glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz"):
            data = json.load(gzip.open(t))
            pid_tpu = {
                p["pid"]
                for p in [
                    e
                    for e in data["traceEvents"]
                    if e.get("ph") == "M"
                    and e.get("name") == "process_name"
                ]
                if "TPU" in str(p.get("args", {}).get("name", ""))
            }
            for e in data["traceEvents"]:
                if e.get("ph") == "X" and e.get("pid") in pid_tpu:
                    ev.append(e)
        agg = {}
        for e in ev:
            agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e3
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
        for name, ms in rows:
            log(top_event=name[:70], ms_per_step=round(ms / 3, 2))


def probe_train_b16():
    _train_case(16)


def probe_train_b16_prof():
    _train_case(16, profile=True)


def probe_train_b24():
    _train_case(24)


def probe_train_b32():
    _train_case(32)


def probe_train_b48():
    _train_case(48)


def probe_train_b64():
    _train_case(64)


def probe_train_b64_accum2():
    _train_case(64, accum=2)


PROBES = {
    "train_b16": probe_train_b16,
    "train_b24": probe_train_b24,
    "train_b32": probe_train_b32,
    "train_b48": probe_train_b48,
    "train_b64": probe_train_b64,
    "train_b16_prof": probe_train_b16_prof,
    "embed_sanity": probe_embed_sanity,
    "train_b64_accum2": probe_train_b64_accum2,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if args.probe:
        PROBES[args.probe]()
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, fn in PROBES.items():
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
                for k, v in inner.items():
                    out["sub" if k == "probe" else k] = v
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
