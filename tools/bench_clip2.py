#!/usr/bin/env python
"""CLIP flash follow-up: head_block 8 and batch sweep at the new default."""
import dataclasses, json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower

STEPS, RESULTS = 10, {}
cpu = jax.devices("cpu")[0]
base = CLIPVisionConfig.vit_l_14_336()  # pallas hb4 default now
with jax.default_device(cpu):
    variables = CLIPVisionTower(base).init(jax.random.PRNGKey(0), jnp.zeros((1,336,336,3), jnp.bfloat16))
variables = jax.device_put(variables, jax.devices()[0])

def measure(name, cfg, B):
    model = CLIPVisionTower(cfg)
    x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(0,1,(B,336,336,3)), jnp.bfloat16), jax.devices()[0])
    @jax.jit
    def fwd(v, x):
        return model.apply(v, x).pooler_output
    t0 = time.perf_counter(); out = fwd(variables, x); np.asarray(out[0,0:1])
    tc = time.perf_counter() - t0
    out = fwd(variables, x); np.asarray(out[0,0:1])
    t0 = time.perf_counter()
    for _ in range(STEPS): out = fwd(variables, x)
    np.asarray(out[0,0:1])
    dt = (time.perf_counter()-t0)/STEPS
    RESULTS[name] = {"img_per_s": round(B/dt,1), "ms": round(dt*1000,1), "compile_s": round(tc,1)}
    print(f"[{name}] {B/dt:.1f} img/s ({dt*1000:.1f} ms @ B={B}, compile {tc:.0f}s)", flush=True)
    json.dump(RESULTS, open("/tmp/clip2.json","w"), indent=1)
    del x

measure("hb4_B288", base, 288)
measure("hb4_B352", base, 352)
measure("hb4_B448", base, 448)
print("DONE", flush=True)
