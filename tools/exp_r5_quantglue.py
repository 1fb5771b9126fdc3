#!/usr/bin/env python
"""Round-5 quantize-glue campaign (VERDICT r4 weak #1's tail + the r5
profile's elementwise/convert bucket).

The 1047.5 img/s program pays ~45 ms of standalone clamp_convert
fusions (B=512): every int8 site's quantize runs as its OWN kLoop pass
(read bf16 + write int8) instead of riding the producer fusion's
epilogue.  If XLA would let the producer write int8 directly we'd save
both the separate pass and half the producer's write bytes (~60 ms in
scope).  These probes learn the fusion rules empirically:

  * where does XLA place the int8 materialization for each producer
    kind (conv emitter, einsum GEMM, LayerNorm)?
  * does any rewrite of fake_quant_static get the s8 root INTO the
    producer fusion?

Each probe compiles a micro chain on the real chip, regex-scans
`compiled.as_text()` for s8-rooted fusions and the producer op, and
times the chain.  Subprocess-per-probe so a crash doesn't kill the
batch (exp_r4_remat pattern).

Ref workload: /root/reference/build_sqlite_clip.slurm:39-44 (embedding
extraction throughput is the reference's production bottleneck).
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time


def log(**kw):
    print(json.dumps(kw), flush=True)


# (B, H, W, Cin, Cexp) — stage-0-shaped but batch-shrunk: bytes-bound
# behavior and fusion decisions are shape-class, not batch, dependent.
SHAPE = (64, 128, 128, 96, 384)


def _analyze(txt, tag):
    """Summarize where the s8 boundary landed in a compiled program."""
    s8_roots = re.findall(
        r"%?([\w.\-]+) = s8\[[^\]]*\][^\n]*? fusion\([^\n]*?kind=(\w+)", txt
    )
    conv_fusions = re.findall(
        r"%?([\w.\-]+) = (\w+)\[[^\]]*\][^\n]*?convolution", txt
    )
    # a standalone quantize pass shows up as a kLoop fusion whose
    # computation is clamp/round/convert only (no dot/conv)
    log(probe=tag, s8_rooted_fusions=s8_roots[:8],
        conv_lines=[f"{n}:{d}" for n, d in conv_fusions[:8]])
    with open(f"/tmp/quantglue_{tag}.hlo", "w") as f:
        f.write(txt)


def _time(fn, args, sync, iters=10):
    import numpy as np

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _setup():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geoguessr_ai_tpu import config as C

    C.enable_compilation_cache()
    B, H, W, Cin, Cexp = SHAPE
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (1, 1, Cin, Cexp)), jnp.float32)
    wdw = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, Cexp)), jnp.float32)
    scale = jnp.asarray(rng.normal(1, 0.1, (Cexp,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (Cexp,)), jnp.float32)
    amax = jnp.asarray(4.0, jnp.float32)
    return jax, jnp, np, (x, w1, wdw, scale, shift, amax)


def _gelu(y):
    import jax.numpy as jnp

    return 0.5 * y * (
        1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y))
    )


def _dw(jnp, y, wdw):
    import jax.lax as lax

    return lax.conv_general_dilated(
        y, wdw.astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1],
    )


def probe_conv_prod(variant="round"):
    """conv-emitter producer -> BN/GELU -> quantize -> dw consumer.

    variant:
      round  — production fake_quant_static (round, clip, s8, dequant)
      noround— clip+convert only (convert does round-to-nearest anyway
               on TPU? checked numerically on CPU first — see
               test, this probe only asks about FUSION placement)
      f32dq  — dequantize in f32 then cast (matches production)
    """
    jax, jnp, np, (x, w1, wdw, scale, shift, amax) = _setup()
    import jax.lax as lax

    def f(x, w1, wdw, scale, shift, amax):
        y = lax.conv_general_dilated(
            x, w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = _gelu(y)
        s = jnp.maximum(amax, 1e-12) / 127.0
        if variant == "round":
            q = jnp.clip(
                jnp.round(y.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
        else:
            q = jnp.clip(y.astype(jnp.float32) / s, -127, 127).astype(
                jnp.int8
            )
        y = (q.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jnp.mean(_dw(jnp, y, wdw).astype(jnp.float32))

    jf = jax.jit(f)
    args = (x, w1, wdw, scale, shift, amax)
    txt = jf.lower(*args).compile().as_text()
    _analyze(txt, f"conv_prod_{variant}")
    ms = _time(jf, args, lambda o: np.asarray(o))
    log(probe=f"conv_prod_{variant}", ms=round(ms, 2))


def probe_conv_prod_nodq():
    """Same chain but the consumer READS the int8 directly (dequant in
    the consumer's operand fusion, as production intends): does the
    producer conv fusion then root at s8?"""
    jax, jnp, np, (x, w1, wdw, scale, shift, amax) = _setup()
    import jax.lax as lax

    def f(x, w1, wdw, scale, shift, amax):
        y = lax.conv_general_dilated(
            x, w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = _gelu(y)
        s = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(y.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        q = jax.lax.optimization_barrier(q)  # force s8 to BE the boundary
        y = (q.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jnp.mean(_dw(jnp, y, wdw).astype(jnp.float32))

    jf = jax.jit(f)
    args = (x, w1, wdw, scale, shift, amax)
    txt = jf.lower(*args).compile().as_text()
    _analyze(txt, "conv_prod_nodq")
    ms = _time(jf, args, lambda o: np.asarray(o))
    log(probe="conv_prod_nodq", ms=round(ms, 2))


def probe_einsum_prod_nodq():
    """einsum producer + optimization_barrier forcing the s8 boundary
    (the untested cell after einsum_prod showed XLA elides int8 when it
    owns both sides): does the DOT fusion root at s8, or does a
    standalone clamp pass appear here too?  If the dot roots s8, an
    einsum-form conv1 with forced int8 materialization could replace
    the conv-emitter + clamp-pass pair at the dw-feeding sites (the
    layout copy into the dw emitter would move int8 bytes)."""
    jax, jnp, np, (x, w1, wdw, scale, shift, amax) = _setup()

    def f(x, w1, wdw, scale, shift, amax):
        y = jnp.einsum(
            "...c,cd->...d", x, w1[0, 0].astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = _gelu(y)
        s = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(y.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        q = jax.lax.optimization_barrier(q)
        y = (q.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jnp.mean(_dw(jnp, y, wdw).astype(jnp.float32))

    jf = jax.jit(f)
    args = (x, w1, wdw, scale, shift, amax)
    txt = jf.lower(*args).compile().as_text()
    _analyze(txt, "einsum_prod_nodq")
    ms = _time(jf, args, lambda o: np.asarray(o))
    log(probe="einsum_prod_nodq", ms=round(ms, 2))


def probe_einsum_prod():
    """einsum-GEMM producer (the _PointwiseConv path): does the dot
    fusion root at s8?"""
    jax, jnp, np, (x, w1, wdw, scale, shift, amax) = _setup()

    def f(x, w1, wdw, scale, shift, amax):
        B, H, W, Cin = x.shape
        y = jnp.einsum(
            "...c,cd->...d", x, w1[0, 0].astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = _gelu(y)
        s = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(y.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        y = (q.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jnp.mean(_dw(jnp, y, wdw).astype(jnp.float32))

    jf = jax.jit(f)
    args = (x, w1, wdw, scale, shift, amax)
    txt = jf.lower(*args).compile().as_text()
    _analyze(txt, "einsum_prod")
    ms = _time(jf, args, lambda o: np.asarray(o))
    log(probe="einsum_prod", ms=round(ms, 2))


def probe_bf16_ref():
    """No-quant reference chain for the timing deltas."""
    jax, jnp, np, (x, w1, wdw, scale, shift, amax) = _setup()
    import jax.lax as lax

    def f(x, w1, wdw, scale, shift, amax):
        y = lax.conv_general_dilated(
            x, w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = _gelu(y)
        return jnp.mean(_dw(jnp, y, wdw).astype(jnp.float32))

    jf = jax.jit(f)
    args = (x, w1, wdw, scale, shift, amax)
    ms = _time(jf, args, lambda o: np.asarray(o))
    log(probe="bf16_ref", ms=round(ms, 2))


PROBES = {
    "bf16_ref": probe_bf16_ref,
    "conv_prod_round": lambda: probe_conv_prod("round"),
    "conv_prod_noround": lambda: probe_conv_prod("noround"),
    "conv_prod_nodq": probe_conv_prod_nodq,
    "einsum_prod": probe_einsum_prod,
    "einsum_prod_nodq": probe_einsum_prod_nodq,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if args.probe:
        PROBES[args.probe]()
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in PROBES:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                inner = json.loads(line)
                out = {"wrapper": name}
                out.update(inner)
                log(**out)
            except (json.JSONDecodeError, TypeError, AttributeError):
                log(wrapper=name, raw=line[:300])
        if proc.returncode != 0:
            log(probe=name, result="CRASH", rc=proc.returncode,
                wall_s=wall, stderr_tail=proc.stderr[-700:])
        else:
            log(probe=name, result="done", wall_s=wall)


if __name__ == "__main__":
    main()
