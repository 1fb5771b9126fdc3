#!/usr/bin/env python
"""Map the round-5 embed profile's UNMAPPED fusions to source ops.

The fresh per-fusion profile of the 1047.5 img/s program
(docs/performance.md round-5 profile chapter) attributes ~31 ms to
fusions whose trace events carry no op_name (multiply_reduce_fusion
2x8.64 ms, add_convert_fusion.9/.14 ~10.6 ms, add.476 3.67 ms) plus
~27 ms of stage-1 copy/transpose/reshape.  This script compiles the
SAME program (no execution) and greps the optimized HLO for those
fusion names' op_name metadata, so the next embed campaign aims at
named targets instead of categories.

Compile-only: one remote compile through the axon relay (~10-15 min),
then pure host-side text processing.
"""
import dataclasses
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "data", "out", "embed_r5_hlo.txt",
)

TARGETS = [
    "multiply_reduce_fusion",
    "add_convert_fusion.9",
    "add_convert_fusion.14",
    "add.476",
    "copy.211",
    "copy.220",
    "copy.210",
    "copy.219",
    "copy.207",
    "copy.215",
    "copy.216",
    "copy.224",
    "clamp_convert_fusion",
]


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.tinyvit import PROD_QUANT_SITES
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    C.enable_compilation_cache()
    cfg = TinyViTConfig.tiny_vit_21m_512()
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    base = TinyViT(cfg)
    with jax.default_device(cpu):
        v = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        )
        model_cal = TinyViT(
            dataclasses.replace(cfg, dtype=jnp.float32, quant_mode="calibrate")
        )
        stats = calibrate_act_stats(
            jax.jit(lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"])),
            v,
            [jnp.asarray(rng.normal(0, 1, (2, 512, 512, 3)), jnp.float32)],
        )
    model = TinyViT(
        dataclasses.replace(
            cfg,
            fused_block_stages=(1, 3),
            pallas_attention_stages=(),
            quant_mode="static",
            quant_sites=PROD_QUANT_SITES,
        )
    )
    scales = jax.tree.map(jnp.asarray, stats)
    x = jnp.zeros((512, 512, 512, 3), jnp.bfloat16)
    fwd = jax.jit(lambda v, s, x: model.apply({**v, "act_scales": s}, x))
    print("lowering + compiling (remote, expect 10-15 min)...", flush=True)
    compiled = fwd.lower(v, scales, x).compile()
    text = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT} ({len(text)} chars)", flush=True)

    # For each target fusion: print its root line + any op_name metadata
    # inside its computation body.
    lines = text.splitlines()
    for t in TARGETS:
        pat = re.compile(rf'\b{re.escape(t)}(\.\d+)?\s*=')
        hits = [i for i, ln in enumerate(lines) if pat.search(ln)]
        for i in hits[:6]:
            ln = lines[i].strip()
            m = re.search(r'op_name="([^"]+)"', ln)
            print(f"== {t} @L{i}: {ln[:300]}")
            if m:
                print(f"   op_name: {m.group(1)}")
            # fusion roots reference a computation; find its body ops
            cm = re.search(r"calls=(\S+)", ln)
            if cm:
                comp = cm.group(1).rstrip(",")
                # print the computation's op_names
                in_comp = False
                names = set()
                for ln2 in lines:
                    if re.match(rf"%?{re.escape(comp)}\b", ln2.strip()) or (
                        ln2.startswith(f"{comp} ") or f" {comp} (" in ln2
                    ):
                        in_comp = True
                        continue
                    if in_comp:
                        if ln2.startswith("}"):
                            break
                        m2 = re.search(r'op_name="([^"]+)"', ln2)
                        if m2:
                            names.add(m2.group(1))
                for n in sorted(names)[:12]:
                    print(f"   body op: {n}")
    print("done", flush=True)


if __name__ == "__main__":
    main()
