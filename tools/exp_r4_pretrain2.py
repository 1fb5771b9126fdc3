#!/usr/bin/env python
"""Round-4 pretrain follow-up: the donated step measured 10.7 s at B=64
while the NON-donated profiled step ran 194.6 ms (exp_r4_pretrain_prof).
Isolate the mechanism: donation vs the sequential dependency chain vs
independent dispatches, at B=64 and B=256.

Cases: {b64,b256} x {donate_chain, nodonate_chain, nodonate_indep}
"""
import json
import os
import subprocess
import sys
import time


def log(**kw):
    print(json.dumps(kw), flush=True)


def run_case(B: int, donate: bool, chain: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import geoguessr_ai_tpu.train.pretrain_clip as pc
    from geoguessr_ai_tpu.config import PretrainConfig
    from geoguessr_ai_tpu.models.clip_text import CLIPModel, CLIPTextConfig
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig

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
    mask = pc.trainable_mask(params)
    cfg = PretrainConfig()
    tx, _ = pc.make_pretrain_optimizer(cfg, 1000)
    params = jax.device_put(params, tpu)
    opt_state = jax.jit(tx.init)(params)
    batch = {
        "pixel_values": jax.device_put(
            jnp.asarray(rng.normal(0, 1, (B, 336, 336, 3)), jnp.bfloat16),
            tpu,
        ),
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(0, 49000, (B, text.max_length)),
                        jnp.int32),
            tpu,
        ),
    }
    kw = {"donate_argnums": (0, 1)} if donate else {}
    step = jax.jit(
        lambda p, o, b: pc.pretrain_step(p, o, b, model, tx, mask), **kw
    )
    t0 = time.time()
    p, o, loss = step(params, opt_state, batch)
    l0 = float(np.asarray(loss))
    compile_s = time.time() - t0
    if donate:
        params, opt_state = p, o
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        if chain:
            params, opt_state, loss = step(params, opt_state, batch)
        else:
            _, _, loss = step(params, opt_state, batch)
    l1 = float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / iters
    log(result="ok", B=B, donate=donate, chain=chain,
        compile_s=round(compile_s, 1), ms=round(dt * 1e3, 1),
        img_s=round(B / dt, 1), loss0=round(l0, 4), loss=round(l1, 4))


CASES = {
    "b64_nodonate_chain": lambda: run_case(64, False, True),
    "b64_nodonate_indep": lambda: run_case(64, False, False),
    "b64_donate_chain": lambda: run_case(64, True, True),
    "b256_nodonate_chain": lambda: run_case(256, False, True),
    "b256_nodonate_indep": lambda: run_case(256, False, False),
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
