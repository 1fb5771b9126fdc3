"""Fused MBConv Pallas kernel (round 4b).

TinyViT's conv stage (stage 0) is a MobileNet-style inverted bottleneck
(timm ``tiny_vit`` MBConv semantics; consumed by the reference via
/root/reference/models/tinyvit.py:28-53):

    1x1 expand (C -> E=4C) + BN + GELU
    depthwise 3x3 + BN + GELU
    1x1 project (E -> C) + BN
    residual add + GELU

At production shapes (B=512 images, 128x128x96, E=384) the XLA lowering
is HBM-bound: the 4x-expanded activation makes two full HBM round trips
(expand write 6.4 GB, dw read+write 12.8 GB, project read 6.4 GB per
block) plus the residual epilogue — measured ~63 ms per block of the
592 ms embed step (tools/exp_r4_profile.py round-4b: dw 22 ms, 1x1s
12+12 ms, residual mul 7 ms, boundary copies ~10 ms, x2 blocks).

This kernel keeps the expanded activation entirely in VMEM.  Grid
(B, H/th) over full-width row strips: each step DMAs a (th+2, W+2, C)
halo strip of the pre-padded input from HBM into VMEM scratch, then

    expand GEMM on the whole strip (+folded-BN scale/bias, GELU)
    dw 3x3 as 9 statically-shifted VPU MACs into an f32 accumulator
        (+BN, GELU)
    project GEMM (+BN), residual add from the strip center, GELU

and writes only the (th, W, C) output block.  HBM traffic drops to
read-x + write-out (~3.2 GB vs ~28 GB per block); the residual read is
free (it is the already-resident strip center).  The halo costs one
extra strip row pair on the expand GEMM ((th+2)/th FLOPs).

Eval-only by design: BN folds into per-channel scale/bias from running
stats, which is exactly the ``use_running_average=True`` semantic.
Training keeps the XLA path (batch statistics + BN stat updates cannot
fold).  The standalone-XLA shifted-MAC lowering measured NEGATIVE
(DW_SHIFTED in models/tinyvit.py — the 9 shifted slices materialize in
HBM); in-VMEM shifting has no such materialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per strip (auto-shrunk to a divisor of H).  VMEM at production
#: stage-0 shapes (W=128, C=96, E=384), th=16: x strip (18,130,96) bf16
#: 0.45 MB + expanded (18,130,384) bf16 1.8 MB + f32 dw accumulator
#: (16,128,384) 3.1 MB + out (16,128,96) x2 buffers 0.8 MB + weights
#: ~0.2 MB -> ~6.5 MB, comfortably under the 16 MB scoped limit.
MB_TILE_H = 16
#: dw-MAC accumulator dtype — f32 matches XLA's conv accumulation;
#: bf16 is a measurement knob (2x VPU packing, ~0.6% worst-case
#: accumulation error over 9 terms).
ACC_DTYPE = jnp.float32


#: perf-ablation knob: skip the GELUs inside the kernel (WRONG numerics;
#: used only to attribute VPU time in tools/exp_r4_mbconv.py).
SKIP_GELU = False


def _gelu(x, exact: bool):
    if SKIP_GELU:
        return x
    return jax.nn.gelu(x, approximate=not exact)


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm(eval) as per-channel (scale, bias): y = x*s + b.

    Matches flax.linen.BatchNorm(use_running_average=True, epsilon=eps)
    up to fold-order rounding (fold computed in f32).
    """
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def _mbconv_kernel(
    xp_hbm, w1_ref, sb1_ref, w2_ref, sb2_ref, w3_ref, sb3_ref,
    o_ref, xs_ref, sem, *, th: int, w_img: int, exact: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.dslice(b, 1), pl.dslice(i * th, th + 2)], xs_ref, sem
    )
    cp.start()
    cp.wait()

    # strip width is padded UP to a sublane multiple (8) and channels to
    # a lane multiple (128): Mosaic memref slices must be aligned to the
    # tiling on BOTH tiled dims, even for full logical extents.  Real
    # image columns live at 1..w_img in padded coordinates; the padded
    # channel rows of w1 are zero so the expand GEMM ignores them.
    xt = xs_ref[0]  # (th+2, Wp, Cp)
    Hs, Ws, Cp = xt.shape
    W = w_img
    C = o_ref.shape[-1]
    E = w1_ref.shape[1]
    dt = xt.dtype

    # 1x1 expand on the whole halo strip (the dw conv needs expanded
    # values at halo positions).  bf16 GEMM output + bf16 scale/bias
    # matches the in-model path (einsum preferred_element_type=dtype,
    # BN in compute dtype) and runs the E-space VPU ops at 2x packing.
    h = jax.lax.dot_general(
        xt.reshape(Hs * Ws, Cp), w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt)  # Mosaic requires a 32-bit matmul acc; cast once
    h = h * sb1_ref[0].astype(dt) + sb1_ref[1].astype(dt)
    h = _gelu(h, exact).reshape(Hs, Ws, E)

    # The dw conv pads the EXPANDED tensor with zeros ('same' padding),
    # but the strip halo was expanded from zero-padded x — and
    # gelu(bn1(0)) != 0.  Zero h wherever the halo row/col is image
    # padding (strip-interior halo rows are real rows and stay).  The
    # mask is built 2D in f32 (a minor-dim insert on i1/bf16 is a Mosaic
    # reshape restriction; f32 is allowed) and applied as one multiply.
    ri = jax.lax.broadcasted_iota(jnp.int32, (Hs, Ws), 0) + i * th
    ci = jax.lax.broadcasted_iota(jnp.int32, (Hs, Ws), 1)
    h_img = pl.num_programs(1) * th
    valid = (
        (ci >= 1) & (ci <= W) & (ri > 0) & (ri < h_img + 1)
    )
    mask = valid.astype(jnp.float32)[:, :, None].astype(dt)
    h = h * mask

    # depthwise 3x3 as 9 statically-shifted MACs.  f32 accumulation
    # matches XLA's conv (which accumulates f32 internally); acc_dt is
    # a measurement knob.
    acc = jnp.zeros((th, W, E), ACC_DTYPE)
    for di in range(3):
        for dj in range(3):
            acc = acc + (
                h[di : di + th, dj : dj + W, :].astype(ACC_DTYPE)
                * w2_ref[di * 3 + dj].astype(ACC_DTYPE)
            )
    y = acc.astype(dt) * sb2_ref[0].astype(dt) + sb2_ref[1].astype(dt)
    y = _gelu(y, exact)

    # 1x1 project + BN + residual (strip center) + GELU.
    p = jax.lax.dot_general(
        y.reshape(th * W, E), w3_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt)
    p = p * sb3_ref[0].astype(dt) + sb3_ref[1].astype(dt)
    p = p.reshape(th, W, C)
    out = _gelu(xt[1 : th + 1, 1 : W + 1, :C] + p, exact)
    o_ref[0] = out


def _pick_tile(h: int, requested: int) -> int:
    th = min(requested, h)
    while h % th:
        th -= 1
    return th


def _mbconv_pallas(
    x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
    exact: bool, tile_h=None, interpret: bool = False,
):
    B, H, W, C = x.shape
    E = w1.shape[1]
    th = _pick_tile(H, tile_h or MB_TILE_H)
    dt = x.dtype
    # Mosaic memref-slice alignment: the DMA'd input's second-minor dim
    # must be a sublane multiple (8) and its minor dim a lane multiple
    # (128) — pad width and channels up; the kernel masks the extra
    # columns and the zero-padded w1 rows null the extra channels.
    # NOTE (advisor r4): this jnp.pad materializes a full padded copy of
    # x in HBM (an extra read+write) before the kernel — part of why the
    # kernel lost its HBM-savings bet (closed-negative, see module
    # docstring).  If this path is ever revisited, fold the halo into
    # the in-kernel DMA (clamped slices + in-VMEM masking) instead.
    wp = -(-(W + 2) // 8) * 8
    cp = -(-C // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - W - 1), (0, cp - C)))
    w1p = jnp.pad(w1.astype(dt), ((0, cp - C), (0, 0)))
    const = lambda b, i: (0, 0)
    args = (
        xp,
        w1p,
        jnp.stack([s1, b1]).astype(jnp.float32),
        # pre-round dw weights to compute dtype (the XLA conv path
        # multiplies bf16 weights), then widen for the f32 MACs.
        w2.reshape(9, E).astype(dt).astype(jnp.float32),
        jnp.stack([s2, b2]).astype(jnp.float32),
        w3.astype(dt),
        jnp.stack([s3, b3]).astype(jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_mbconv_kernel, th=th, w_img=W, exact=exact),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cp, E), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, E), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, E), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, E), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, C), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, th + 2, wp, cp), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def _mbconv_xla(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, exact: bool):
    """Reference composition (folded-BN form) for CPU and for tests."""
    dt = x.dtype
    h = jnp.einsum(
        "bhwc,ce->bhwe", x, w1.astype(dt), preferred_element_type=jnp.float32
    )
    h = _gelu((h * s1 + b1).astype(dt), exact)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    E = w1.shape[1]
    w2f = w2.reshape(9, E).astype(dt).astype(jnp.float32)
    acc = jnp.zeros(h.shape[:3] + (E,), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + (
                hp[:, di : di + H, dj : dj + W, :].astype(jnp.float32)
                * w2f[di * 3 + dj]
            )
    y = _gelu((acc * s2 + b2).astype(dt), exact)
    p = jnp.einsum(
        "bhwe,ec->bhwc", y, w3.astype(dt), preferred_element_type=jnp.float32
    )
    p = (p * s3 + b3).astype(dt)
    return _gelu(x + p, exact)


def fused_mbconv(
    x, w1, s1, b1, w2, s2, b2, w3, s3, b3, *, exact_gelu: bool = False
):
    """Inverted-bottleneck block with folded BatchNorm, fused on TPU.

    x: (B, H, W, C); w1: (C, E); w2: (3, 3, E) depthwise; w3: (E, C);
    each (s, b) pair is the folded BN scale/bias (see fold_bn).
    Inference-only (no VJP): the model gates this path on ``not train``.
    """
    return jax.lax.platform_dependent(
        x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
        cpu=functools.partial(_mbconv_xla, exact=exact_gelu),
        default=functools.partial(_mbconv_pallas, exact=exact_gelu),
    )
