#!/usr/bin/env python
"""Round-4 closing profiles: per-fusion breakdown of the CURRENT
production paths (all round-4 defaults), feeding the speed-of-light
decomposition chapter in docs/performance.md.

Cases (each a fresh subprocess so one compile crash can't eat the rest):
  embed  — TinyViT-21M-512 forward @ B=512 imgs, fused 1+3 + noproj
           stage-2 + static-int8 MLP (the 597 ms bench path).
  train  — SuperGuessr train step @ B=16 panos, 12,647 cells, Pallas
           backwards + merged BQ=512 (the 427.7 ms path).

Usage: exp_r4_profile.py [embed,train]
"""
import dataclasses
import glob
import gzip
import json
import os
import re
import subprocess
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def categorize(opname: str, fusion: str) -> str:
    """Map a device event (fusion name + HLO op_name metadata) to a
    model component category (the categories tools/roofline.py models)."""
    o = opname or ""
    bwd = "transpose(" in o or "/grad" in o
    pre = "bwd " if bwd else ""
    # lax.cond platform_dependent branches = the pallas kernels
    # (fused-block / noproj / qkv window attention).
    if fusion.startswith("branch_") or "custom-call" in fusion:
        return pre + "pallas kernel"
    if "local_conv" in o or "depthwise" in o:
        return pre + "dw conv"
    # MBConv/PatchMerging conv2 is the depthwise 3x3 (models/tinyvit.py)
    if "conv2/conv/conv_general_dilated" in o and (
        "stage0" in o or "downsample" in o
    ):
        return pre + "dw conv"
    if "patch_embed" in o or "downsample" in o:
        return pre + "patch/downsample conv"
    if "window_attention" in o or "fused_block" in o:
        return pre + "pallas kernel"
    if "attn" in o or "qkv" in o or "/proj" in o:
        return pre + "attn (xla)"
    if "mlp" in o or "fc1" in o or "fc2" in o:
        return pre + "mlp"
    if "norm" in o or "bn" in o:
        return pre + "norm"
    if "conv" in o:
        return pre + "conv 1x1/3x3"
    if "head" in o or "cell" in o or "fusion_layer" in o:
        return pre + "head/fusion"
    if fusion.startswith("copy") or fusion.startswith("dynamic"):
        return pre + "copy/slice"
    if ("convert" in fusion or "reduce" in fusion or "clamp" in fusion
            or fusion.startswith("add") or fusion.startswith("multiply")):
        return pre + "elementwise/convert"
    return pre + "other"


def _profile(jit_fn, args, label, sync, iters=3):
    """Trace `iters` dispatches of jit_fn(*args), aggregate TPU op time by
    fusion name, map fusion -> op_name metadata via compiled HLO text, and
    log a category table + top fusions."""
    import jax

    txt = jit_fn.lower(*args).compile().as_text()
    src = {}
    for m in re.finditer(
        r'%?(fusion[.\d]*|convolution[.\d]*|copy[.\d]*|custom-call[.\d]*'
        r'|dynamic-slice[.\d]*|dynamic-update-slice[.\d]*)'
        r'[^\n]*?op_name="([^"]+)"',
        txt,
    ):
        src.setdefault(m.group(1), m.group(2))

    d = f"/tmp/tv_profile_r4_{label}"
    # wipe stale traces: jax.profiler.trace creates a NEW timestamped
    # subdir per run and the glob below would sum events across runs
    # (the round-4b double-count).
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        out = None
        for _ in range(iters):
            out = jit_fn(*args)
        sync(out)
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
        # keep only the "XLA Ops" thread: the "XLA Modules" thread holds
        # whole-program spans that double every child op.
        tid_ops = {
            (e["pid"], e.get("tid"))
            for e in data["traceEvents"]
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e["args"].get("name") == "XLA Ops"
        }
        for e in data["traceEvents"]:
            if (
                e.get("ph") == "X"
                and e.get("pid") in pid_tpu
                and (e["pid"], e.get("tid")) in tid_ops
            ):
                ev.append(e)
    agg = {}
    for e in ev:
        # the top-level program span ("jit__lambda(...)"/"jit_<name>")
        # covers every child op — counting it doubles the total.  The
        # train trace additionally emits one bare-integer span per
        # dispatch ("0","1","2", each == the full step) — same problem.
        if e["name"].startswith("jit") or e["name"].isdigit():
            continue
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e3
    total = sum(agg.values())
    log(probe=f"{label}_profile_total", ms_per_step=round(total / iters, 1))
    dump = {
        name: {"ms": round(ms / iters, 3),
               "op": src.get(name.split("/")[-1], "")}
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])
    }
    with open(f"/tmp/profile_r4_{label}.json", "w") as f:
        json.dump(dump, f, indent=0)

    category = categorize

    by_cat = {}
    rows = []
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        base = name.split("/")[-1]
        opname = src.get(base, "")
        c = category(opname, base)
        by_cat[c] = by_cat.get(c, 0.0) + ms
        if len(rows) < 40:
            rows.append(
                {"ms": round(ms / iters, 2), "fusion": name[:48],
                 "op": opname[:130]}
            )
    log(probe=f"{label}_by_category",
        cats={k: round(v / iters, 1) for k, v in
              sorted(by_cat.items(), key=lambda kv: -kv[1])})
    for r in rows:
        log(probe=f"{label}_fusion", **r)


def run_embed():
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
    model = TinyViT(
        dataclasses.replace(
            cfg,
            fused_block_stages=(1, 3),
            quant_mode="static",
            quant_sites=("fc1", "fc2"),
        )
    )
    v = jax.device_put(v, tpu)
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)
    x = jax.device_put(jnp.zeros((512, 512, 512, 3), jnp.bfloat16), tpu)
    fwd = jax.jit(lambda v, s, x: model.apply({**v, "act_scales": s}, x))
    out = fwd(v, scales, x)
    np.asarray(out[0, 0:1])
    # timed confirm
    t0 = time.perf_counter()
    for _ in range(5):
        out = fwd(v, scales, x)
    np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / 5
    log(probe="embed_confirm", ms=round(dt * 1e3, 1),
        img_s=round(512 / dt, 1), panos_s=round(128 / dt, 1))
    _profile(fwd, (v, scales, x), "embed",
             lambda o: np.asarray(o[0, 0:1]))


def run_train():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C

    C.enable_compilation_cache()
    from geoguessr_ai_tpu.config import OptimizerConfig
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step

    B = 16
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
            jnp.asarray(rng.normal(0, 1, (B, 4, 512, 512, 3)), jnp.bfloat16),
            tpu,
        ),
        "coords": jax.device_put(
            jnp.asarray(
                np.stack(
                    [rng.uniform(-170, 170, B), rng.uniform(-60, 60, B)], -1
                ),
                jnp.float32,
            ),
            tpu,
        ),
    }
    # NOT donated: the profile loop reuses the same state buffers.
    step = jax.jit(lambda s, b, c: train_step(s, b, c))
    state2, metrics = step(state, batch, centroids)
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(3):
        _, metrics = step(state, batch, centroids)
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / 3
    log(probe="train_confirm", ms=round(dt * 1e3, 1),
        panos_s=round(B / dt, 1))
    _profile(step, (state, batch, centroids), "train",
             lambda o: np.asarray(o[1]["loss"]))


CASES = {"embed": run_embed, "train": run_train}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        CASES[sys.argv[2]]()
        return
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(CASES)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=3600,
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
