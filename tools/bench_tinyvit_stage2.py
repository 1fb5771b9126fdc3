#!/usr/bin/env python
"""TinyViT-21M-512 e2e: stage-2 v2 qkv kernel sweep vs the (1,)-default.
One process; results to /tmp/tv_stage2_bench.json."""
import dataclasses, functools, json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
import geoguessr_ai_tpu.ops.window_attention as wa

B, STEPS, RESULTS = 320, 10, {}
x = None, 
cpu = jax.devices("cpu")[0]
base = TinyViTConfig.tiny_vit_21m_512()
model0 = TinyViT(base)
with jax.default_device(cpu):
    variables = model0.init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3), jnp.bfloat16))
variables = jax.device_put(variables, jax.devices()[0])
x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(0,1,(B,512,512,3)), jnp.bfloat16), jax.devices()[0])

_orig = wa._attention_qkv_fused_pallas

def measure(name, cfg, block_q=512, head_block=2):
    wa._attention_qkv_fused_pallas = functools.partial(_orig, block_q=block_q, head_block=head_block)
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
    json.dump(RESULTS, open("/tmp/tv_stage2_bench.json","w"), indent=1)
    return probe

ref = measure("stages1_default", base)
for name, bq, hb in (("s12_bq256_hb4",256,4), ("s12_bq128_hb4",128,4), ("s12_bq128_hb12",128,12)):
    cfg = dataclasses.replace(base, pallas_attention_stages=(1,2))
    p = measure(name, cfg, bq, hb)
    d = float(np.abs(p-ref).max())
    RESULTS[name]["max_diff"] = d
    print(f"  parity maxdiff {d:.4f}", flush=True)
json.dump(RESULTS, open("/tmp/tv_stage2_bench.json","w"), indent=1)
print("DONE", flush=True)
