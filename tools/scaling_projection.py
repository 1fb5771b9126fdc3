#!/usr/bin/env python
"""Multi-chip scaling projection for the production train/embed steps.

Single-chip numbers are measured (docs/performance.md); multi-chip
hardware is not reachable here, so this grounds the projection in two
verifiable artifacts instead of hand-waving:

1. **HLO collective inventory** — compile the sharded train step on an
   8-virtual-device CPU mesh (pure dp, the production layout) and list
   every collective op with its shape: what GSPMD actually inserts.
2. **Byte accounting at production scale** — init the real
   TinyViT-21M-512 + 12,647-cell SuperGuessr, count gradient bytes, and
   compute per-step ring all-reduce time across ICI bandwidths.

Projection model: step_time(n) = measured single-chip step (the batch
dimension shards, so per-chip compute is constant at micro=16/chip) +
ring all-reduce of the gradients, 2(n-1)/n x bytes / ICI_bw.  The embed
path has NO collectives (verified from the dryrun HLO) and projects
linearly.

Writes data/out/SCALING.json.  Runs entirely on CPU.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _collective_inventory(n_devices: int = 8) -> dict:
    """Compile the sharded train step (dp=n) at test_tiny scale and
    return {op_kind: [shapes...]} from the post-GSPMD HLO."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
    from geoguessr_ai_tpu.models import SuperGuessr, TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        put_variables,
    )
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import make_sharded_steps

    devices = jax.devices()[:n_devices]
    mesh_cfg = MeshConfig(data_parallel=n_devices, model_parallel=1)
    mesh = create_mesh(mesh_cfg, devices=devices)
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    num_cells = 64
    model = SuperGuessr(
        num_cells=num_cells,
        backbone=TinyViT(cfg),
        panorama=True,
        embed_dim=cfg.embed_dim,
        dtype=jnp.float32,
    )
    B = n_devices
    x = jnp.zeros((2, 4, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x)
    variables = put_variables(variables, mesh, mesh_cfg)
    state = create_train_state(
        model, variables, OptimizerConfig(learning_rate=1e-3), 10
    )
    rng = np.random.default_rng(0)
    centroids = jnp.asarray(
        rng.uniform(-60, 60, (num_cells, 2)), jnp.float32
    )
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, 4, cfg.image_size, cfg.image_size, 3)),
            jnp.float32,
        ),
        "coords": jnp.asarray(rng.uniform(-60, 60, (B, 2)), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh, mesh_cfg))
    jit_train, _ = make_sharded_steps(mesh, mesh_cfg)
    txt = jit_train.lower(state, batch, centroids).compile().as_text()

    inv: dict = {}
    for m in re.finditer(
        r"%?[\w.\-]+ = (\([^)]*\)|\S+) (all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)\(",
        txt,
    ):
        inv.setdefault(m.group(2), []).append(m.group(1))
    # total f32 elements moved by all-reduces (gradient sync volume)
    elems = 0
    for s in inv.get("all-reduce", []):
        for shp in re.findall(r"f32\[([\d,]*)\]", s):
            elems += int(np.prod([int(d) for d in shp.split(",") if d] or [1]))
    return {
        "allreduce_f32_elements": elems,
        **{
            k: {"count": len(v), "example_shapes": v[:12]}
            for k, v in inv.items()
        },
    }


def _param_bytes() -> dict:
    """Gradient/param byte accounting for the PRODUCTION model."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import SuperGuessr, TinyViT, TinyViTConfig

    cfg = TinyViTConfig.tiny_vit_21m_512()
    model = SuperGuessr(
        num_cells=12647,
        backbone=TinyViT(cfg),
        panorama=True,
        embed_dim=cfg.embed_dim,
    )
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            pixel_values=jnp.zeros((1, 4, 512, 512, 3), jnp.bfloat16),
        )
    )
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    return {
        "param_count": n_params,
        "grad_bytes_f32": n_params * 4,
        "grad_bytes_bf16": n_params * 2,
    }


import numpy as np  # noqa: E402  (used in both subprocess halves)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--inventory":
        print(json.dumps(_collective_inventory()))
        return
    # collective inventory needs a fresh 8-device CPU process
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\S+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inventory"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        sys.exit(1)
    inventory = json.loads(proc.stdout.splitlines()[-1])

    pb = _param_bytes()
    # Measured single-chip step at micro=16 panos/chip (round-5
    # re-measure of the wave-2 program, TRAIN.json: 41.9 panos/s —
    # docs/performance.md).
    step_ms = 381.9
    panos_per_chip_step = 16
    rows = []
    for n in (2, 4, 8, 16):
        for bw_gbs in (40, 90, 180):
            ar_ms = (
                2 * (n - 1) / n * pb["grad_bytes_f32"] / (bw_gbs * 1e9)
            ) * 1e3
            total = step_ms + ar_ms
            rows.append(
                {
                    "chips": n,
                    "ici_gbs": bw_gbs,
                    "allreduce_ms": round(ar_ms, 2),
                    "panos_s": round(
                        n * panos_per_chip_step / (total / 1e3), 1
                    ),
                    "efficiency": round(step_ms / total, 4),
                }
            )
    out = {
        "model": "SuperGuessr + TinyViT-21M-512, 12647 cells",
        "measured_single_chip_step_ms": step_ms,
        "measured_single_chip_panos_s": 41.9,
        **pb,
        "train_collectives_dp8_hlo": inventory,
        "embed_collectives": "none (verified: embed HLO has no cross-replica ops; scales linearly)",
        "projection_model": (
            "step(n) = measured step (batch shards; per-chip compute "
            "constant) + ring all-reduce 2(n-1)/n * grad_bytes / ici_bw"
        ),
        "projection": rows,
    }
    path = os.path.join(REPO, "data", "out", "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "projection"},
                     indent=1))
    for r in rows:
        print(json.dumps(r))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
