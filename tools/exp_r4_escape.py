#!/usr/bin/env python
"""Round-4 batch #1: compile-helper escape campaign + train-step profile.

VERDICT r3 #1: four walls share one opaque terminal-side compile failure
(embed B>512, stage-3 fused WB>1, int8-qkv, train programs above B=16
panos).  This batch systematically probes the knobs that change compiler
memory/size behavior, each in a FRESH subprocess (XLA_FLAGS only apply
at process start), and records a verdict table for the ledger:

  trainprof_b16     per-fusion profile of the full train step (fwd+bwd+
                    AdamW) at the proven B=16 — VERDICT #2's missing
                    artifact (attributes the 23% fwd -> 7.5% train gap)
  embed_b576_base   re-confirm the B=576 wall + record stderr/wall time
  embed_b576_vmem   --xla_tpu_scoped_vmem_limit_kib=65536
  embed_b576_vmem128  ... =131072
  embed_b576_donate donated input buffer (aliasing changes allocation)
  train_b32_base    re-confirm the train wall
  train_b32_vmem    scoped-vmem flag on the train program
  train_b32_fullremat  remat ALL stages: if this still crashes, the wall
                    is program SIZE/compile-memory, not activation HBM —
                    the discriminating probe
  train_b24         is the wall at 16 panos or between 24 and 32?
  train_b20         finer boundary

Usage: python tools/exp_r4_escape.py            # run all probes
       python tools/exp_r4_escape.py --probe X  # one probe, in-process
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


# --------------------------------------------------------------------------
# probe bodies (run in a fresh subprocess each)
# --------------------------------------------------------------------------


def _embed_fwd(batch, donate=False):
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
    x = jax.device_put(jnp.zeros((batch, 512, 512, 3), jnp.bfloat16), tpu)
    kw = {"donate_argnums": (1,)} if donate else {}
    fwd = jax.jit(lambda v, x: model.apply(v, x), **kw)
    t0 = time.time()
    out = fwd(v, x)
    np.asarray(out[0, 0:1])
    compile_s = time.time() - t0
    iters = 6
    if donate:
        # donated input: re-upload each iter (still measures the program)
        xs = [
            jax.device_put(
                jnp.zeros((batch, 512, 512, 3), jnp.bfloat16), tpu
            )
            for _ in range(iters)
        ]
        t0 = time.perf_counter()
        for i in range(iters):
            out = fwd(v, xs[i])
        np.asarray(out[0, 0:1])
    else:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(v, x)
        np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", compile_s=round(compile_s, 1),
        img_s=round(batch / dt, 1), panos_s=round(batch / 4 / dt, 1))


def probe_embed_b576_base():
    _embed_fwd(576)


def probe_embed_b576_vmem():
    _embed_fwd(576)


def probe_embed_b576_vmem128():
    _embed_fwd(576)


def probe_embed_b576_donate():
    _embed_fwd(576, donate=True)


def probe_embed_b544():
    _embed_fwd(544)


def probe_embed_split2():
    """Program splitting: two independent B=288 executables round-robined
    — the no-flag escape for >512 aggregate batch.  Reports aggregate
    throughput to compare against the single-program B=512 (830.5)."""
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
    B = 288
    xa = jax.device_put(jnp.zeros((B, 512, 512, 3), jnp.bfloat16), tpu)
    xb = jax.device_put(jnp.ones((B, 512, 512, 3), jnp.bfloat16), tpu)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    t0 = time.time()
    np.asarray(fwd(v, xa)[0, 0:1])
    compile_s = time.time() - t0
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        oa = fwd(v, xa)
        ob = fwd(v, xb)
    np.asarray(oa[0, 0:1])
    np.asarray(ob[0, 0:1])
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", compile_s=round(compile_s, 1),
        agg_batch=2 * B, img_s=round(2 * B / dt, 1),
        panos_s=round(2 * B / 4 / dt, 1))


def _train_step_run(B, tv_overrides=None, accum=1):
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
    tv = TinyViTConfig.tiny_vit_21m_512(**(tv_overrides or {}))
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
    float(np.asarray(metrics["loss"]))
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
        train_mfu=round(B / dt * 4 * 3 * 54e9 / 197e12, 4))
    return step, state, batch, centroids


def probe_train_b32_base():
    _train_step_run(32)


def probe_train_b32_vmem():
    _train_step_run(32)


def probe_train_b32_fullremat():
    _train_step_run(
        32, tv_overrides=dict(remat=True, remat_stages=(0, 1, 2, 3))
    )


def probe_train_b24():
    _train_step_run(24)


def probe_train_b20():
    _train_step_run(20)


def probe_trainprof_b16():
    """Per-fusion profile of the full train step at B=16 (VERDICT #2)."""
    import glob
    import gzip
    import re

    import jax

    # build + compile the step via the shared body, then re-trace for text
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
    B = 16
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
    # NO donation: the profiled step must be re-runnable on the same state
    step = jax.jit(lambda s, b, c: train_step(s, b, c))
    t0 = time.time()
    state2, metrics = step(state, batch, centroids)
    float(np.asarray(metrics["loss"]))
    log(probe="trainprof_compile", compile_s=round(time.time() - t0, 1))

    txt = step.lower(state, batch, centroids).compile().as_text()
    src = {}
    for m in re.finditer(
        r'%?(fusion[.\d]*|convolution[.\d]*|copy[.\d]*|custom-call[.\d]*'
        r'|scatter[.\d]*|reduce[.\d]*)'
        r'[^\n]*?op_name="([^"]+)"',
        txt,
    ):
        src.setdefault(m.group(1), m.group(2))
    log(probe="hlo_size_mb", mb=round(len(txt) / 1e6, 1))

    d = "/tmp/tv_trainprof_r4"
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
                if e.get("ph") == "M" and e.get("name") == "process_name"
            ]
            if "TPU" in str(p.get("args", {}).get("name", ""))
        }
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in pid_tpu:
                ev.append(e)
    agg = {}
    for e in ev:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e3
    total = sum(agg.values())
    log(probe="profile_total", ms_per_step=round(total / 3, 1))

    def category(opname: str, fusion: str) -> str:
        o = opname or ""
        bwd = "transpose" in o or "/vjp" in o or "grad" in o
        tag = "bwd " if bwd else "fwd "
        if "window_attention" in o or "fused_block" in o or "pallas" in o \
                or "custom-call" in fusion:
            return tag + "pallas/attn-kernel"
        if "attn" in o:
            return tag + "attn (xla)"
        if "mlp" in o or "fc1" in o or "fc2" in o:
            return tag + "mlp"
        if "conv" in o:
            return tag + "conv"
        if "adamw" in o or "opt" in o.lower() or "scale_by" in o:
            return "optimizer"
        if "norm" in o or "bn" in o:
            return tag + "norm"
        return tag + "other"

    by_cat = {}
    rows = []
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        base = name.split("/")[-1]
        opname = src.get(base, "")
        c = category(opname, base)
        by_cat[c] = by_cat.get(c, 0.0) + ms
        if len(rows) < 45:
            rows.append(
                {"ms": round(ms / 3, 2), "fusion": name[:48],
                 "op": opname[:130]}
            )
    log(probe="by_category",
        cats={k: round(v / 3, 1) for k, v in
              sorted(by_cat.items(), key=lambda kv: -kv[1])})
    for r in rows:
        log(probe="fusion", **r)


PROBES = {
    "trainprof_b16": (probe_trainprof_b16, {}),
    "embed_b576_base": (probe_embed_b576_base, {}),
    "embed_b576_vmem": (
        probe_embed_b576_vmem,
        {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"},
    ),
    "embed_b576_vmem128": (
        probe_embed_b576_vmem128,
        {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=131072"},
    ),
    "embed_b576_donate": (probe_embed_b576_donate, {}),
    "embed_b544": (probe_embed_b544, {}),
    "embed_split2": (probe_embed_split2, {}),
    "train_b32_base": (probe_train_b32_base, {}),
    "train_b32_vmem": (
        probe_train_b32_vmem,
        {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"},
    ),
    "train_b32_fullremat": (probe_train_b32_fullremat, {}),
    "train_b24": (probe_train_b24, {}),
    "train_b20": (probe_train_b20, {}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if args.probe:
        fn, _env = PROBES[args.probe]
        fn()
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, (fn, env_over) in PROBES.items():
        env = dict(os.environ)
        env.update(env_over)
        # script-mode sys.path[0] is tools/, not the repo root
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
            log(probe=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                env=env_over,
                stderr_tail=proc.stderr[-700:])
        else:
            log(probe=name, result="done", wall_s=wall, env=env_over)


if __name__ == "__main__":
    main()
