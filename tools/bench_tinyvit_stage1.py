#!/usr/bin/env python
"""TinyViT e2e: stage-1 attention variants — head-major kernel (current
default) vs qkv-fused kernel (removes the bnc,chd boundary einsums the
profile shows at ~25 ms + 8.5 ms of converts)."""
import dataclasses, json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
import geoguessr_ai_tpu.ops.window_attention as wa

B, STEPS, RESULTS = 320, 10, {}
cpu = jax.devices("cpu")[0]
base = TinyViTConfig.tiny_vit_21m_512()
with jax.default_device(cpu):
    variables = TinyViT(base).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3), jnp.bfloat16))
variables = jax.device_put(variables, jax.devices()[0])
x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(0,1,(B,512,512,3)), jnp.bfloat16), jax.devices()[0])

def measure(name, cfg, min_n):
    wa.QKV_KERNEL_MIN_N = min_n
    model = TinyViT(cfg)
    @jax.jit
    def fwd(v, x):
        return model.apply(v, x)
    t0 = time.perf_counter(); out = fwd(variables, x); np.asarray(out[0,0:1])
    tc = time.perf_counter() - t0
    out = fwd(variables, x); np.asarray(out[0,0:1])
    t0 = time.perf_counter()
    for _ in range(STEPS): out = fwd(variables, x)
    np.asarray(out[0,0:1])
    dt = (time.perf_counter()-t0)/STEPS
    probe = np.asarray(out[:4,:16].astype(jnp.float32))
    RESULTS[name] = {"img_per_s": round(B/dt,1), "ms": round(dt*1000,1), "compile_s": round(tc,1)}
    print(f"[{name}] {B/dt:.1f} img/s ({dt*1000:.1f} ms, compile {tc:.0f}s)", flush=True)
    json.dump(RESULTS, open("/tmp/tv_stage1_bench.json","w"), indent=1)
    return probe

ref = measure("s1_headmajor", base, 512)
p = measure("s1_qkvfused", base, 0)
print(f"  parity {np.abs(p-ref).max():.4f}", flush=True)
# qkv-fused at stage 1 AND 2
p = measure("s12_qkvfused", dataclasses.replace(base, pallas_attention_stages=(1,2)), 0)
print(f"  parity {np.abs(p-ref).max():.4f}", flush=True)
print("DONE", flush=True)
