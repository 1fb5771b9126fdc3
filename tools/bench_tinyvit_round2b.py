#!/usr/bin/env python
"""Follow-up TinyViT batch: stage (1,3) variant, batch sweep at the new
default, and the predecoded embed-builder device rate."""
import dataclasses, json, os, sys, tempfile, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

STEPS, RESULTS = 10, {}
cpu = jax.devices("cpu")[0]
base = TinyViTConfig.tiny_vit_21m_512()
with jax.default_device(cpu):
    variables = TinyViT(base).init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3), jnp.bfloat16))
variables = jax.device_put(variables, jax.devices()[0])

def measure(name, cfg, B):
    model = TinyViT(cfg)
    x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(0,1,(B,512,512,3)), jnp.bfloat16), jax.devices()[0])
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
    RESULTS[name] = {"img_per_s": round(B/dt,1), "ms": round(dt*1000,1), "compile_s": round(tc,1)}
    print(f"[{name}] {B/dt:.1f} img/s ({dt*1000:.1f} ms @ B={B}, compile {tc:.0f}s)", flush=True)
    json.dump(RESULTS, open("/tmp/tv_r2b.json","w"), indent=1)
    del x

measure("s1qkv_B320", base, 320)   # new default
measure("s13qkv_B320", dataclasses.replace(base, pallas_attention_stages=(1,3)), 320)
measure("s1qkv_B384", base, 384)
measure("s1qkv_B448", base, 448)

# predecoded embed-builder device rate on the real chip
from geoguessr_ai_tpu.config import BackboneConfig, EmbedBuildConfig
from geoguessr_ai_tpu.data.embed_builder import build_embedding_sqlite
from geoguessr_ai_tpu.data.sqlite_dataset import create_sqlite_from_records
fix = "/root/repo/tests/fixtures/heading=000.jpg"
blob = open(fix, "rb").read()
with tempfile.TemporaryDirectory() as td:
    raw = os.path.join(td, "raw.sqlite")
    create_sqlite_from_records(raw, [
        {"location_id": f"l{i}", "lat": 1.0, "lon": 2.0, "heading": 0, "image": blob}
        for i in range(2048)
    ])
    t0 = time.perf_counter()
    n = build_embedding_sqlite(raw, os.path.join(td, "e.sqlite"),
        EmbedBuildConfig(batch_size=512, fetch_threads=8), predecoded=True)
    dt = time.perf_counter() - t0
    RESULTS["embed_builder_predecoded"] = {"rows": n, "wall_s": round(dt,1), "img_per_s": round(n/dt,1)}
    print(f"[embed_builder_predecoded] {n} rows in {dt:.1f}s = {n/dt:.1f} img/s (incl predecode+compile)", flush=True)
json.dump(RESULTS, open("/tmp/tv_r2b.json","w"), indent=1)
print("DONE", flush=True)
