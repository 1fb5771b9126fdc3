#!/usr/bin/env python
"""Round-5 int8 campaign at the post-wave-2 XLA conv sites (VERDICT r4 #1).

The round-4b wave-2 pointwise-lowering revision moved MBConv/PatchMerging
conv1 back to XLA CONV emitters, which staled the int8 "closed" verdict for
exactly those sites: ~97 ms of XLA conv GEMM time + 54.6 ms of bytes-bound
dw conv in the 592 ms step were never re-tried with int8 after the flip
(docs/performance.md round-4b chapters).  Three levers, measured here:

  1. int8 on the conv emitter itself (ops.quant.int8_static_conv via
     tinyvit.CONV_INT8_EMITTER) — keeps the dw-feeding conv layout, swaps
     operands to int8 (2x MXU mode + half the activation read bytes).
  2. int8 activation STORAGE feeding the dw convs (quant site "dw",
     fake_quant_static): producer epilogue writes int8, dw operand fusion
     converts — a pure HBM-bytes lever on a bytes-bound op.
  3. both combined.

Probes first (isolated conv ops, int8 vs bf16 at the production shapes),
then the e2e embed ladder at B=512 against the 981 img/s wave-2 baseline.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.models import tinyvit as tv
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    C.enable_compilation_cache()
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0:1])

    def time_it(fn, *args, iters=20):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    # ------------------------------------------------------------------
    # Probes: isolated convs at the production shapes, int8 vs bf16.
    # Relative comparison under an identical multi-dispatch harness.
    # ------------------------------------------------------------------
    def conv(x, w, stride=1, pad=0, groups=1, pt=jnp.bfloat16):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=pt,
        )

    # Probe B is 128 (not the production 512): the int8 probe's int32
    # output alone is 12.9 GB at B=512 (the first launch OOMed every
    # probe AND leaked the chip into the e2e section).  Relative int8 vs
    # bf16 speedup is batch-invariant at these sizes; buffers are
    # explicitly deleted between probes.
    PB = 128

    def free(*arrs):
        for a in arrs:
            try:
                a.delete()
            except Exception:
                pass

    shapes = [
        # (name, (B,H,W,Cin), (kh,kw,Cin,Cout), stride, pad)
        ("mb_conv1", (PB, 128, 128, 96), (1, 1, 96, 384), 1, 0),
        ("mb_conv3", (PB, 128, 128, 384), (1, 1, 384, 96), 1, 0),
        ("patch_conv2", (PB, 256, 256, 48), (3, 3, 48, 96), 2, 1),
    ]
    for name, xs, wshape, stride, pad in shapes:
        bufs = ()
        try:
            xb = jax.device_put(
                jnp.asarray(rng.normal(0, 1, xs), jnp.bfloat16), tpu)
            wb = jax.device_put(
                jnp.asarray(rng.normal(0, 0.1, wshape), jnp.bfloat16), tpu)
            xq = jax.device_put(
                jnp.asarray(rng.integers(-127, 128, xs), jnp.int8), tpu)
            wq = jax.device_put(
                jnp.asarray(rng.integers(-127, 128, wshape), jnp.int8), tpu)
            bufs = (xb, wb, xq, wq)
            f_bf = jax.jit(lambda a, b: conv(a, b, stride, pad))
            f_i8 = jax.jit(
                lambda a, b: conv(a, b, stride, pad, pt=jnp.int32))
            t_bf = time_it(f_bf, xb, wb)
            t_i8 = time_it(f_i8, xq, wq)
            log(probe=name, bf16_ms=round(t_bf, 3), int8_ms=round(t_i8, 3),
                speedup=round(t_bf / t_i8, 3))
        except Exception as e:
            log(probe=name, error=str(e)[:300])
        finally:
            free(*bufs)

    # dw conv reading int8 (convert in the operand fusion) vs bf16
    bufs = ()
    try:
        xs, wshape = (PB, 128, 128, 384), (3, 3, 1, 384)
        xb = jax.device_put(
            jnp.asarray(rng.normal(0, 1, xs), jnp.bfloat16), tpu)
        xq = jax.device_put(
            jnp.asarray(rng.integers(-127, 128, xs), jnp.int8), tpu)
        wb = jax.device_put(
            jnp.asarray(rng.normal(0, 0.1, wshape), jnp.bfloat16), tpu)
        bufs = (xb, xq, wb)
        f_bf = jax.jit(lambda a, b: conv(a, b, 1, 1, groups=384))
        f_i8in = jax.jit(
            lambda a, b: conv(
                a.astype(jnp.bfloat16) * jnp.bfloat16(0.01), b, 1, 1,
                groups=384))
        t_bf = time_it(f_bf, xb, wb)
        t_i8 = time_it(f_i8in, xq, wb)
        log(probe="dw_int8_read", bf16_ms=round(t_bf, 3),
            int8_in_ms=round(t_i8, 3), speedup=round(t_bf / t_i8, 3))
    except Exception as e:
        log(probe="dw_int8_read", error=str(e)[:300])
    finally:
        free(*bufs)

    # ------------------------------------------------------------------
    # E2E embed ladder at B=512 (bench.py harness semantics).
    # ------------------------------------------------------------------
    base_cfg = TinyViTConfig.tiny_vit_21m_512(
        fused_block_stages=(1, 3), pallas_attention_stages=()
    )
    with jax.default_device(cpu):
        variables = TinyViT(base_cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        )
    B = 512
    dvars = jax.device_put(variables, tpu)
    x = jax.device_put(jnp.zeros((B, 512, 512, 3), jnp.bfloat16), tpu)

    def calibrate(conv_int8):
        tv.CONV_INT8_EMITTER = conv_int8
        with jax.default_device(cpu):
            model_cal = TinyViT(dataclasses.replace(
                base_cfg, dtype=jnp.float32, quant_mode="calibrate"))
            rngd = np.random.default_rng(0)
            stats = calibrate_act_stats(
                jax.jit(lambda v, xx: model_cal.apply(
                    v, xx, mutable=["act_stats"])),
                jax.device_put(variables, cpu),
                [jnp.asarray(rngd.normal(0, 1, (2, 512, 512, 3)),
                             jnp.float32)],
            )
        return jax.device_put(jax.tree.map(jnp.asarray, stats), tpu)

    scales_plain = calibrate(False)
    scales_emitter = calibrate(True)

    # Ordered by expected value: the dw-storage lever (bytes-bound op,
    # probe-independent) before the conv-emitter variants the isolated
    # probes already measured negative (0.616x/0.846x) — if the round
    # dies mid-ladder we keep the informative points.
    variants = [
        ("v0_base", False, ("fc1", "fc2")),
        ("v3_dw_only", False, ("fc1", "fc2", "dw")),
        ("v1_conv_int8", True, ("fc1", "fc2", "conv")),
        ("v2_conv_dw_int8", True, ("fc1", "fc2", "conv", "dw")),
    ]
    results = {}
    for name, conv_int8, sites in variants:
        try:
            tv.CONV_INT8_EMITTER = conv_int8
            scales = scales_emitter if conv_int8 else scales_plain
            model_q = TinyViT(dataclasses.replace(
                base_cfg, quant_mode="static", quant_sites=sites))
            fwd = jax.jit(
                lambda v, xx, m=model_q, s=scales: m.apply(
                    {**v, "act_scales": s}, xx))
            ok = False
            for attempt in range(4):
                try:
                    np.asarray(fwd(dvars, x)[0, 0:1])
                    ok = True
                    break
                except Exception as e:
                    log(variant=name, compile_attempt=attempt,
                        error=str(e)[:200])
                    time.sleep(20)
            if not ok:
                continue
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(dvars, x)
            np.asarray(out[0, 0:1])
            dt = (time.perf_counter() - t0) / iters
            img_s = B / dt
            results[name] = img_s
            log(variant=name, conv_int8=conv_int8, sites=list(sites),
                ms=round(dt * 1e3, 2), img_s=round(img_s, 1),
                panos_s=round(img_s / 4, 1))
        except Exception as e:
            log(variant=name, error=str(e)[:300])

    log(done=True, results={k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
