#!/usr/bin/env python
"""Measure CLIP-L/14-336 + TinyViT-21M-512 forward throughput across the
round-2 kernel program variants (fused Pallas attention, int8 GEMMs) in
ONE process — remote compiles queue serially.

All CLIP variants share ONE set of variables (param trees are identical
across paths) so the parity numbers are meaningful.

Timing protocol (.claude/skills/verify/SKILL.md): jit once, warm up, then
time >=10 pipelined steps per sync; the only honest barrier through the
axon relay is a tiny device->host fetch.

Writes /tmp/clip_flash_bench.json and prints one line per variant.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from geoguessr_ai_tpu.models.clip_vit import (  # noqa: E402
    CLIPVisionConfig,
    CLIPVisionTower,
)
from geoguessr_ai_tpu.models.tinyvit import (  # noqa: E402
    TinyViT,
    TinyViTConfig,
)

B_CLIP = 256
B_TV = 320
STEPS = 10
RESULTS = {}


def _sync(out):
    np.asarray(out[0, 0:1])


def measure(name, model, variables, x, batch):
    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x)
        return getattr(out, "pooler_output", out)

    t0 = time.perf_counter()
    out = fwd(variables, x)
    _sync(out)
    t_compile = time.perf_counter() - t0
    out = fwd(variables, x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fwd(variables, x)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    img_s = batch / dt
    probe = np.asarray(out[:4, :16].astype(jnp.float32))
    RESULTS[name] = {
        "img_per_s": round(img_s, 1),
        "ms_per_batch": round(dt * 1000, 1),
        "compile_s": round(t_compile, 1),
    }
    print(
        f"[{name}] {img_s:.1f} img/s ({dt * 1000:.1f} ms/batch @ B={batch}, "
        f"compile {t_compile:.0f}s)",
        flush=True,
    )
    with open("/tmp/clip_flash_bench.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return probe


def cos(a, b):
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return float((num / den).min())


# ---------------- CLIP ----------------
base_cfg = CLIPVisionConfig.vit_l_14_336()
base_model = CLIPVisionTower(base_cfg)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    variables = base_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 336, 336, 3), jnp.bfloat16),
    )
variables = jax.device_put(variables, jax.devices()[0])
x_clip = jax.device_put(
    jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B_CLIP, 336, 336, 3)),
        jnp.bfloat16,
    ),
    jax.devices()[0],
)

ref = measure("clip_xla", base_model, variables, x_clip, B_CLIP)

VARIANTS = [
    ("clip_flash_hb4", dict(pallas_attention=True, pallas_head_block=4)),
    ("clip_int8", dict(quantize_gemms=True)),
    (
        "clip_flash_int8",
        dict(
            pallas_attention=True, pallas_head_block=4, quantize_gemms=True
        ),
    ),
]
for name, over in VARIANTS:
    cfg = dataclasses.replace(base_cfg, **over)
    probe = measure(name, CLIPVisionTower(cfg), variables, x_clip, B_CLIP)
    RESULTS[name]["max_diff_vs_xla"] = float(np.abs(probe - ref).max())
    RESULTS[name]["min_cosine_vs_xla"] = cos(probe, ref)
    print(
        f"  parity: maxdiff {RESULTS[name]['max_diff_vs_xla']:.4f} "
        f"cos {RESULTS[name]['min_cosine_vs_xla']:.5f}",
        flush=True,
    )

del variables, x_clip

# ---------------- TinyViT ----------------
tv_cfg = TinyViTConfig.tiny_vit_21m_512()
tv_model = TinyViT(tv_cfg)
with jax.default_device(cpu):
    tv_vars = tv_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    )
tv_vars = jax.device_put(tv_vars, jax.devices()[0])
x_tv = jax.device_put(
    jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B_TV, 512, 512, 3)),
        jnp.bfloat16,
    ),
    jax.devices()[0],
)

ref_tv = measure("tinyvit_bf16", tv_model, tv_vars, x_tv, B_TV)
probe = measure(
    "tinyvit_int8",
    TinyViT(dataclasses.replace(tv_cfg, quantize_gemms=True)),
    tv_vars,
    x_tv,
    B_TV,
)
RESULTS["tinyvit_int8"]["min_cosine_vs_bf16"] = cos(probe, ref_tv)
print(
    f"  parity: cos {RESULTS['tinyvit_int8']['min_cosine_vs_bf16']:.5f}",
    flush=True,
)

with open("/tmp/clip_flash_bench.json", "w") as f:
    json.dump(RESULTS, f, indent=1)
print("DONE", flush=True)
