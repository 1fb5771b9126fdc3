#!/usr/bin/env python
"""Training-step throughput on one chip: full sharded train_step
(preprocess'd input -> forward -> haversine labels -> backward -> AdamW)
for TinyViT SuperGuessr at the production 12,647-cell head, with and
without remat."""
import dataclasses, json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
from geoguessr_ai_tpu.models import SuperGuessr, TinyViT, TinyViTConfig
from geoguessr_ai_tpu.parallel.mesh import batch_sharding, create_mesh, put_variables
from geoguessr_ai_tpu.train.state import create_train_state
from geoguessr_ai_tpu.train.steps import make_sharded_steps

STEPS, RESULTS = 8, {}
NUM_CELLS = 12647
cpu = jax.devices("cpu")[0]
mesh_cfg = MeshConfig(data_parallel=1, model_parallel=1)
mesh = create_mesh(mesh_cfg, devices=jax.devices()[:1])
rng = np.random.default_rng(0)
centroids = jax.device_put(jnp.asarray(
    np.stack([rng.uniform(-180,180,NUM_CELLS), rng.uniform(-85,85,NUM_CELLS)], -1), jnp.float32))

def measure(name, tv_cfg, B):
    model = SuperGuessr(num_cells=NUM_CELLS, backbone=TinyViT(tv_cfg),
                        panorama=True, embed_dim=tv_cfg.embed_dim)
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1,4,512,512,3), jnp.bfloat16))
    variables = put_variables(variables, mesh, mesh_cfg)
    state = create_train_state(model, variables, OptimizerConfig(learning_rate=1e-4), 100)
    batch = {
        "pixel_values": jax.device_put(jnp.asarray(
            rng.normal(0,1,(B,4,512,512,3)), jnp.bfloat16), batch_sharding(mesh, mesh_cfg)),
        "coords": jax.device_put(jnp.asarray(
            rng.uniform(-60,60,(B,2)), jnp.float32), batch_sharding(mesh, mesh_cfg)),
    }
    jit_train, _ = make_sharded_steps(mesh, mesh_cfg)
    for attempt in range(5):
        try:
            t0 = time.perf_counter()
            state, m = jit_train(state, batch, centroids)
            np.asarray(m["loss"]); tc = time.perf_counter()-t0
            break
        except Exception as e:
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "hbm" in msg.lower():
                print(f"[{name}] OOM", flush=True)
                RESULTS[name] = {"oom": True}
                json.dump(RESULTS, open("/tmp/train_step.json","w"), indent=1)
                return
            print(f"  attempt {attempt}: {msg[:100]}", flush=True)
            time.sleep(20)
    else:
        raise RuntimeError("failed")
    state, m = jit_train(state, batch, centroids); np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = jit_train(state, batch, centroids)
    np.asarray(m["loss"])
    dt = (time.perf_counter()-t0)/STEPS
    RESULTS[name] = {"panos_per_s": round(B/dt,1), "ms": round(dt*1000,1),
                     "compile_s": round(tc,1), "loss": float(m["loss"])}
    print(f"[{name}] {B/dt:.1f} panos/s train ({dt*1000:.0f} ms @ B={B}, compile {tc:.0f}s)", flush=True)
    json.dump(RESULTS, open("/tmp/train_step.json","w"), indent=1)

base = TinyViTConfig.tiny_vit_21m_512()
measure("train_B16", base, 16)
measure("train_B32", base, 32)
measure("train_remat_B32", dataclasses.replace(base, remat=True), 32)
measure("train_remat_B64", dataclasses.replace(base, remat=True), 64)
print("DONE", flush=True)
