#!/usr/bin/env python
"""int8 v2 (per-row activation scales) e2e re-measurement on both towers."""
import dataclasses, json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

STEPS, RESULTS = 10, {}
cpu = jax.devices("cpu")[0]

def measure(name, model, variables, B, size, pooler=False):
    x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(0,1,(B,size,size,3)), jnp.bfloat16), jax.devices()[0])
    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x)
        return out.pooler_output if pooler else out
    # the terminal-side compile helper fails transiently; retry
    t0 = time.perf_counter()
    for attempt in range(5):
        try:
            out = fwd(variables, x); np.asarray(out[0,0:1])
            break
        except Exception as e:
            print(f"  compile attempt {attempt} failed: {str(e)[:120]}", flush=True)
            time.sleep(20)
    else:
        raise RuntimeError("compile failed 5x")
    tc = time.perf_counter() - t0
    out = fwd(variables, x); np.asarray(out[0,0:1])
    t0 = time.perf_counter()
    for _ in range(STEPS): out = fwd(variables, x)
    np.asarray(out[0,0:1])
    dt = (time.perf_counter()-t0)/STEPS
    probe = np.asarray(out[:4,:16].astype(jnp.float32))
    RESULTS[name] = {"img_per_s": round(B/dt,1), "ms": round(dt*1000,1), "compile_s": round(tc,1)}
    print(f"[{name}] {B/dt:.1f} img/s ({dt*1000:.1f} ms @ B={B}, compile {tc:.0f}s)", flush=True)
    json.dump(RESULTS, open("/tmp/int8v2.json","w"), indent=1)
    del x
    return probe

# CLIP: flash default + per-row int8
ccfg = CLIPVisionConfig.vit_l_14_336()
with jax.default_device(cpu):
    cv = CLIPVisionTower(ccfg).init(jax.random.PRNGKey(0), jnp.zeros((1,336,336,3), jnp.bfloat16))
cv = jax.device_put(cv, jax.devices()[0])
ref = measure("clip_bf16_B320", CLIPVisionTower(ccfg), cv, 320, 336, pooler=True)
p = measure("clip_int8v2_B320", CLIPVisionTower(dataclasses.replace(ccfg, quantize_gemms=True)), cv, 320, 336, pooler=True)
cos = float(((p*ref).sum(-1)/(np.linalg.norm(p,axis=-1)*np.linalg.norm(ref,axis=-1))).min())
RESULTS["clip_int8v2_B320"]["min_cos"] = cos
print(f"  cos {cos:.5f}", flush=True)
del cv

# TinyViT per-row int8
tcfg = TinyViTConfig.tiny_vit_21m_512()
with jax.default_device(cpu):
    tv = TinyViT(tcfg).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3), jnp.bfloat16))
tv = jax.device_put(tv, jax.devices()[0])
ref = measure("tv_bf16_B320", TinyViT(tcfg), tv, 320, 512)
p = measure("tv_int8v2_B320", TinyViT(dataclasses.replace(tcfg, quantize_gemms=True)), tv, 320, 512)
cos = float(((p*ref).sum(-1)/(np.linalg.norm(p,axis=-1)*np.linalg.norm(ref,axis=-1))).min())
RESULTS["tv_int8v2_B320"]["min_cos"] = cos
print(f"  cos {cos:.5f}", flush=True)
json.dump(RESULTS, open("/tmp/int8v2.json","w"), indent=1)
print("DONE", flush=True)
