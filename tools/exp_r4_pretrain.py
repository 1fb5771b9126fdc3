#!/usr/bin/env python
"""Round-4 batch #7: CLIP contrastive pretrain step on the real chip.

Measures the reference pretrain workload (CLIP-L/14-336, frozen towers,
trainable visual_projection + logit_scale — pretrain_idun.py:220-239)
and A/Bs STOP_GRAD_FROZEN: computing-then-zeroing the frozen towers'
grads (torch-faithful but wasteful) vs stop_gradient inside the loss so
XLA dead-code-eliminates the frozen backward entirely.

Usage: exp_r4_pretrain.py [case,case,...]   cases: sg_on_b64 sg_off_b64
       exp_r4_pretrain.py --case <name>     (subprocess entry)
"""
import json
import os
import subprocess
import sys
import time


def log(**kw):
    print(json.dumps(kw), flush=True)


def run_case(stop_grad: bool, B: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import geoguessr_ai_tpu.train.pretrain_clip as pc
    from geoguessr_ai_tpu.models.clip_text import (
        CLIPModel,
        CLIPTextConfig,
    )
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig

    pc.STOP_GRAD_FROZEN = stop_grad
    vision = CLIPVisionConfig.vit_l_14_336()
    text = CLIPTextConfig.vit_l_text()
    model = CLIPModel(vision, text)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1, 336, 336, 3), jnp.bfloat16),
            input_ids=jnp.zeros((1, text.max_length), jnp.int32),
        )["params"]
    from geoguessr_ai_tpu.config import PretrainConfig

    mask = pc.trainable_mask(params)
    cfg = PretrainConfig()
    tx, _ = pc.make_pretrain_optimizer(cfg, 1000)
    params = jax.device_put(params, tpu)
    opt_state = jax.jit(tx.init)(params)
    batch = {
        "pixel_values": jax.device_put(
            jnp.asarray(
                rng.normal(0, 1, (B, 336, 336, 3)), jnp.bfloat16
            ),
            tpu,
        ),
        "input_ids": jax.device_put(
            jnp.asarray(
                rng.integers(0, 49000, (B, text.max_length)), jnp.int32
            ),
            tpu,
        ),
    }
    step = jax.jit(
        lambda p, o, b: pc.pretrain_step(p, o, b, model, tx, mask),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, batch)
    l0 = float(np.asarray(loss))
    compile_s = time.time() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    l1 = float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", B=B, stop_grad=stop_grad,
        compile_s=round(compile_s, 1), ms=round(dt * 1e3, 1),
        img_s=round(B / dt, 1), loss0=round(l0, 4), loss=round(l1, 4))


CASES = {
    "sg_on_b64": lambda: run_case(True, 64),
    "sg_off_b64": lambda: run_case(False, 64),
    # big-batch contrastive step becomes feasible once the frozen
    # towers' backward is DCE'd (fwd-dominated memory); reference
    # PRETRAIN_ARGS wants bs 960 w/ accum 8 (config.py:105-136).
    "sg_on_b256": lambda: run_case(True, 256),
}


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
            cwd=repo, env=env, capture_output=True, text=True, timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                log(case=name, **json.loads(line))
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                stderr_tail=proc.stderr[-500:])
        else:
            log(case=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
