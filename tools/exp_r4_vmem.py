#!/usr/bin/env python
"""Round-4 batch #6: per-kernel ``vmem_limit_bytes`` — the scoped-VMEM
knob that DOES transit the relay (XLA_FLAGS are rejected by the relay
client's parser; compiler params ride inside the kernel).

Cases (each in a subprocess so a compile crash doesn't kill the batch):

  probe_default  24 MB-scratch toy kernel, no override -> expected CRASH
                 (proves the probe exercises the limit)
  probe_v64      same kernel, vmem_limit_bytes=64 MB  -> ok iff the
                 raise transits the relay
  s2bat_v64      embed B=512: head-batched stage-2 no-proj kernel
                 (18.77 MB, crashed at the 16 MB default)
  fbwb8_v64      embed B=512: stage-1/3 fused-block WB=8 under a 32 MB
                 score budget (18.9 MB, the round-3 compile-crash mode)
  stack4_v64     train B=16: small-N bwd head-group stacks 4 MB
                 (stage-3 H=18 goes 5 groups -> 2)
  bwdbq512_v64   train B=16: merged large-N bwd q-tile 512 (halves k/v
                 refetch rounds per head, mirrors the fwd bq512 win)
  train_both_v64 train B=16: stack4 + bwdbq512 together
"""
import json
import os
import subprocess
import sys
import time

REF_EMB = "/tmp/s2_ref_emb.npy"


def log(**kw):
    print(json.dumps(kw), flush=True)


def probe(limit):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref, scr):
        for i in range(6):
            scr[i] = x_ref[0] * (i + 1.0)
        o_ref[...] = scr[...].sum(0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, 1024, 1024), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
    )
    x = jnp.ones((1, 1024, 1024), jnp.float32)
    out = jax.jit(f)(x)
    log(result="ok", s=float(np.asarray(out[0, 0:1])[0]))


def embed_case(wa_over):
    import importlib.util

    import geoguessr_ai_tpu.ops.window_attention as wa

    for k, v in wa_over.items():
        setattr(wa, k, v)
    spec = importlib.util.spec_from_file_location(
        "exp_r4_s2noproj",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp_r4_s2noproj.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.run_case("case", {})


def train_case(wa_over):
    import importlib.util

    import geoguessr_ai_tpu.ops.window_attention as wa

    for k, v in wa_over.items():
        setattr(wa, k, v)
    spec = importlib.util.spec_from_file_location(
        "exp_r4_remat",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp_r4_remat.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._train_case(16)


V64 = 64 * 1024 * 1024

CASES = {
    "probe_default": lambda: probe(None),
    "probe_v64": lambda: probe(V64),
    "s2bat_v64": lambda: embed_case(
        {"VMEM_LIMIT_BYTES": V64, "S2_HEAD_BATCHED": True,
         "S2_BLOCK_Q": 256}
    ),
    "fbwb8_v64": lambda: embed_case(
        {"VMEM_LIMIT_BYTES": V64, "FUSED_BLOCK_WB": 8,
         "FUSED_BLOCK_SCORE_BYTES": 32 * 1024 * 1024}
    ),
    "s2bq1024_v64": lambda: embed_case(
        {"VMEM_LIMIT_BYTES": V64, "S2_BLOCK_Q": 1024}
    ),
    "s2hb12_v64": lambda: embed_case(
        {"VMEM_LIMIT_BYTES": V64, "S2_HEAD_BLOCK": 12,
         "S2_BLOCK_Q": 512}
    ),
    "stack4_v64": lambda: train_case(
        {"VMEM_LIMIT_BYTES": V64,
         "_BWD_STACK_BYTES": 4 * 1024 * 1024}
    ),
    "bwdbq512_v64": lambda: train_case(
        {"VMEM_LIMIT_BYTES": V64, "_BWD_BLOCK_Q": 512}
    ),
    "train_both_v64": lambda: train_case(
        {"VMEM_LIMIT_BYTES": V64,
         "_BWD_STACK_BYTES": 4 * 1024 * 1024,
         "_BWD_BLOCK_Q": 512}
    ),
}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        CASES[sys.argv[2]]()
        return
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(CASES)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                log(case=name, **json.loads(line))
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                stderr_tail=proc.stderr[-500:])
        else:
            log(case=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
