#!/usr/bin/env python
"""Round-3 profile: per-fusion breakdown of the production 742 img/s
forward at B=320, grouped by op category, plus interleaved confirm runs
of bf16 vs mlp-int8 at B=448 (probe2 saw 757 vs round-2's 737 — check
it's not run-to-run variance)."""
import dataclasses
import glob
import gzip
import json
import re
import sys
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cfg = TinyViTConfig.tiny_vit_21m_512()
    model = TinyViT(cfg)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        v = model.init(
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

    x320 = jax.device_put(jnp.zeros((320, 512, 512, 3), jnp.bfloat16), tpu)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    np.asarray(fwd(v, x320)[0, 0:1])

    # ---- per-fusion profile ------------------------------------------
    txt = fwd.lower(v, x320).compile().as_text()
    src = {}
    for m in re.finditer(
        r'%?(fusion[.\d]*|convolution[.\d]*|copy[.\d]*|custom-call[.\d]*)'
        r'[^\n]*?op_name="([^"]+)"',
        txt,
    ):
        src.setdefault(m.group(1), m.group(2))

    d = "/tmp/tv_profile_r3"
    with jax.profiler.trace(d):
        for _ in range(3):
            out = fwd(v, x320)
        np.asarray(out[0, 0:1])
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
        if "local_conv" in o:
            return "local_conv(dw)"
        if "conv2" in o and ("downsample" in o or "stage0" in o or "patch" in o):
            return "dw/strided conv"
        if "attn" in o:
            if "qkv" in o:
                return "attn qkv"
            if "proj" in o:
                return "attn proj"
            if "softmax" in o or "einsum" in o or "dot" in o:
                return "attn scores/probs"
            return "attn other"
        if "mlp" in o or "fc1" in o or "fc2" in o:
            return "mlp"
        if "window_attention" in o or "pallas" in o or "custom-call" in fusion:
            return "pallas kernel"
        if "norm" in o or "bn" in o:
            return "norm"
        if "conv" in o:
            return "conv 1x1/3x3"
        return "other"

    by_cat = {}
    rows = []
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        base = name.split("/")[-1]
        opname = src.get(base, "")
        c = category(opname, base)
        by_cat[c] = by_cat.get(c, 0.0) + ms
        if len(rows) < 35:
            rows.append(
                {"ms": round(ms / 3, 2), "fusion": name[:48],
                 "op": opname[:110]}
            )
    log(probe="by_category",
        cats={k: round(v / 3, 1) for k, v in
              sorted(by_cat.items(), key=lambda kv: -kv[1])})
    for r in rows:
        log(probe="fusion", **r)

    # ---- B=448 confirm: bf16 vs mlp-int8, interleaved x3 --------------
    x448 = jax.device_put(jnp.zeros((448, 512, 512, 3), jnp.bfloat16), tpu)
    mq = TinyViT(
        dataclasses.replace(
            cfg, quant_mode="static", quant_sites=("fc1", "fc2")
        )
    )
    fwdq = jax.jit(lambda v, s, x: mq.apply({**v, "act_scales": s}, x))
    np.asarray(fwd(v, x448)[0, 0:1])
    np.asarray(fwdq(v, scales, x448)[0, 0:1])

    def timeit(f, args, iters=10):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(out[0, 0:1])
        return 448 * iters / (time.perf_counter() - t0)

    for rep in range(3):
        log(probe="bf16_b448", rep=rep, img_s=round(timeit(fwd, (v, x448)), 1))
        log(probe="int8mlp_b448", rep=rep,
            img_s=round(timeit(fwdq, (v, scales, x448)), 1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(phase="fatal", err=str(e)[:500])
        sys.exit(1)
