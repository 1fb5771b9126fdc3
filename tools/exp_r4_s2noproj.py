#!/usr/bin/env python
"""Round-4 batch #4: stage-2 no-proj fused block, e2e verdict.

Measures fused_block_noproj_stages=(2,) against the production default
(fused 1 + qkv 3 + static-int8 MLP) at B=512 — VERDICT #3's attempt #5.
Variants: head-sequential (VMEM-lean) vs head-batched kernels, and a
block_q=512 probe.  Each case runs in a subprocess so a compile crash
doesn't kill the batch; parity reported as min cosine vs the baseline
case's embeddings (written to /tmp/s2_ref_emb.npy by the first case).
"""
import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

REF_EMB = "/tmp/s2_ref_emb.npy"


def log(**kw):
    print(json.dumps(kw), flush=True)


def run_case(name, over, head_batched=None, block_q=None):
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops import window_attention as wa
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    if head_batched is not None:
        wa.S2_HEAD_BATCHED = head_batched
    if block_q is not None:
        wa.S2_BLOCK_Q = block_q

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    base = TinyViTConfig.tiny_vit_21m_512()
    model = TinyViT(base)
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        v = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
        model_cal = TinyViT(
            dataclasses.replace(base, dtype=jnp.float32,
                                quant_mode="calibrate")
        )
        stats = calibrate_act_stats(
            jax.jit(
                lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"])
            ),
            v,
            [jnp.asarray(rng.normal(0, 1, (2, 512, 512, 3)), jnp.float32)],
        )
    v = jax.device_put(v, tpu)
    scales = jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)
    B = 512
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, 512, 512, 3)), jnp.bfloat16), tpu
    )
    cfg = dataclasses.replace(
        base, quant_mode="static", quant_sites=("fc1", "fc2"), **over
    )
    m = TinyViT(cfg)
    fwd = jax.jit(lambda vv, xx: m.apply({**vv, "act_scales": scales}, xx))
    t0 = time.time()
    np.asarray(fwd(v, x)[0, 0:1])
    cs = time.time() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(v, x)
    np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / iters
    rec = dict(result="ok", B=B, compile_s=round(cs, 1),
               ms=round(dt * 1e3, 1), img_s=round(B / dt, 1),
               panos_s=round(B / dt / 4, 1))
    emb = np.asarray(fwd(v, x)[:8], np.float32)
    if not os.path.exists(REF_EMB):
        np.save(REF_EMB, emb)
    else:
        ref = np.load(REF_EMB)
        cos = (emb * ref).sum(-1) / (
            np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1)
        )
        rec["min_cosine"] = round(float(cos.min()), 6)
    log(**rec)


CASES = {
    "base_512": (dict(), None, None),
    "s2seq_512": (dict(fused_block_noproj_stages=(2,)), False, 256),
    "s2bat_512": (dict(fused_block_noproj_stages=(2,)), True, 256),
    "s2seq_bq512": (dict(fused_block_noproj_stages=(2,)), False, 512),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    args = ap.parse_args()
    if args.case:
        over, hb, bq = CASES[args.case]
        run_case(args.case, over, hb, bq)
        return
    if os.path.exists(REF_EMB):
        os.unlink(REF_EMB)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in CASES:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                inner = json.loads(line)
                log(case=name, **inner)
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:300])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                stderr_tail=proc.stderr[-700:])
        else:
            log(case=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
