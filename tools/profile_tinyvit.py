#!/usr/bin/env python
"""Per-fusion profile of the production TinyViT forward at B=320.
Traces 3 steps, parses the device trace, prints the top fusions with
their source ops (op_name metadata from compiled.as_text())."""
import glob, gzip, json, re, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

B = 320
cfg = TinyViTConfig.tiny_vit_21m_512()
model = TinyViT(cfg)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3), jnp.bfloat16))
v = jax.device_put(v, jax.devices()[0])
x = jax.device_put(jnp.zeros((B,512,512,3), jnp.bfloat16), jax.devices()[0])
fwd = jax.jit(lambda v, x: model.apply(v, x))
out = fwd(v, x); np.asarray(out[0,0:1])

# fusion name -> source op map from the compiled HLO
txt = fwd.lower(v, x).compile().as_text()
src = {}
for m in re.finditer(r'(fusion[.\d]*|convolution[.\d]*|copy[.\d]*)[^\n]*?op_name="([^"]+)"', txt):
    src.setdefault(m.group(1), m.group(2))

d = "/tmp/tv_profile"
with jax.profiler.trace(d):
    for _ in range(3):
        out = fwd(v, x)
    np.asarray(out[0,0:1])
time.sleep(2)

traces = glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz")
ev = []
for t in traces:
    data = json.load(gzip.open(t))
    pid_tpu = {p["pid"] for p in [e for e in data["traceEvents"] if e.get("ph")=="M" and e.get("name")=="process_name"] if "TPU" in str(p.get("args",{}).get("name",""))}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in pid_tpu:
            ev.append(e)
agg = {}
for e in ev:
    agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e3
total = sum(agg.values())
print(f"total device time {total:.1f} ms over 3 steps ({total/3:.1f}/step)")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    base = name.split("/")[-1]
    print(f"{ms/3:8.2f} ms  {name[:60]:60s} {src.get(base, '')[:90]}")
