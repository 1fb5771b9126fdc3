"""Fused window attention for TinyViT, as Pallas TPU kernels.

The XLA path materializes the (B·nW, H, N, N) float32 score tensor in HBM —
the model's largest single traffic source.  Window sizes are small (N = 256
or 1024), so a q-tile's whole softmax row fits in VMEM and no online-softmax
machinery is needed (see the boom guide §1-§6 for the general case).

Layout: all kernels take q/k/v/out as **(W, N, H, hd)** — the natural
output layout of the fused qkv projection — with the head axis sliced by
the BlockSpec.  An earlier head-major (W, H, N, hd) variant required
transposes around the pallas_call that cost more end-to-end than the
kernel saved (measured 525 vs 668 img/s).

Two kernels, selected by shape:

* ``_attention_qtiled`` (large N): grid (heads, q_tiles, windows); per cell
  one (BQ, N) f32 score tile lives only in VMEM.  The per-(head, q_tile)
  bias block keeps the same index across the window dimension, so Pallas
  leaves it resident — one HBM fetch per (head, q_tile) instead of per
  window.  Measured on v5e at stage-2 shapes (W=128, H=12, N=1024, hd=32),
  head-major inputs: 14.2 ms vs 33.9 ms XLA, max diff 1e-3.

* ``_attention_batched`` (small N): grid (heads, window_blocks); each cell
  computes BW windows' attention via batched dot_general so the MXU sees
  enough work per step (one-window-per-cell grids ran 3-8x slower than
  XLA).  s1 shapes: 14.8 ms vs 32.3 ms XLA; s3: 5.8 vs 7.7 ms.

Rejected designs, measured: whole-window single-cell kernel 787 ms;
jax.experimental flash_attention 55.9-60.3 ms (head_dim 32 wastes 3/4 of
the MXU contraction depth in its tiling).

Platform dispatch: `lax.platform_dependent` lowers to the XLA formula on
CPU (tests, host-side init) and to Pallas on TPU.  Training uses a custom
VJP whose backward recomputes attention with plain XLA ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: q-tile rows for the large-N kernel (128 keeps the per-cell
#: (H, BQ, N) f32 score tile within VMEM at H=12, N=1024).
BLOCK_Q = 128
#: windows per grid cell for the small-N kernel.
BLOCK_W = 8


def _qtiled_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    # Mosaic's tpu.matmul supports exactly one leading batch dim, so the
    # token-major tiles are transposed head-leading inside VMEM (cheap —
    # these are on-chip relayouts, not HBM traffic).
    q = jnp.swapaxes(q_ref[0], 0, 1)  # (H, BQ, hd)
    k = jnp.swapaxes(k_ref[0], 0, 1)  # (H, N, hd)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    b = b_ref[...]  # (H, BQ, N) f32
    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, BQ, N)
    s = s * scale + b
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, BQ, hd)
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)


def _attention_qtiled(q, k, v, bias, scale, block_q=BLOCK_Q):
    """Large-N kernel: grid (q_tiles, windows), all heads per cell.

    Pallas TPU requires the last two block dims to be full (or 8/128
    aligned), so the head axis stays whole; per-cell VMEM is dominated by
    the (H, BQ, N) f32 score tile (12.6 MB for H=12, BQ=256, N=1024).
    The (H, BQ, N) bias block keeps a constant index across the window
    dimension -> resident, one HBM fetch per q_tile.
    """
    W, N, H, hd = q.shape
    block_q = min(block_q, N)
    # expand the bias to (H, N, N) tiles indexed by q-tile
    return pl.pallas_call(
        functools.partial(_qtiled_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((W, N, H, hd), q.dtype),
        grid=(N // block_q, W),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, H, hd),
                lambda qt, w: (w, qt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, H, hd),
                lambda qt, w: (w, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, H, hd),
                lambda qt, w: (w, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H, block_q, N),
                lambda qt, w: (0, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, H, hd),
            lambda qt, w: (w, qt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(q, k, v, bias)


def _batched_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    BW, N, H, hd = q_ref.shape
    # single leading batch dim for tpu.matmul: fold (BW, H) together
    def fold(ref):
        return jnp.transpose(ref[...], (0, 2, 1, 3)).reshape(BW * H, N, hd)

    q, k, v = fold(q_ref), fold(k_ref), fold(v_ref)
    b = b_ref[...]  # (H, N, N) f32
    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BW*H, N, N)
    s = s.reshape(BW, H, N, N) * scale + b[None]
    s = s.reshape(BW * H, N, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BW*H, N, hd)
    o = o.reshape(BW, H, N, hd)
    o_ref[...] = jnp.transpose(o, (0, 2, 1, 3)).astype(o_ref.dtype)


def _attention_batched(q, k, v, bias, scale, block_w=BLOCK_W):
    """Small-N kernel: grid (window_blocks,), all heads per cell; the full
    (H, N, N) bias stays resident for the entire launch."""
    W, N, H, hd = q.shape
    block_w = min(block_w, W)
    return pl.pallas_call(
        functools.partial(_batched_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((W, N, H, hd), q.dtype),
        grid=(W // block_w,),
        in_specs=[
            pl.BlockSpec(
                (block_w, N, H, hd),
                lambda wb: (wb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_w, N, H, hd),
                lambda wb: (wb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_w, N, H, hd),
                lambda wb: (wb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H, N, N),
                lambda wb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_w, N, H, hd),
            lambda wb: (wb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(q, k, v, bias)


def _attention_xla(q, k, v, bias, scale):
    """Reference formula on the (W, N, H, hd) layout."""
    s = jnp.einsum(
        "wnhd,wmhd->whnm", q, k, preferred_element_type=jnp.float32
    )
    s = s * scale + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,wmhd->wnhd", p, v)


def _attention_pallas(q, k, v, bias, scale):
    W, N, H, hd = q.shape
    if N >= 512:
        return _attention_qtiled(q, k, v, bias, scale)
    if W % BLOCK_W == 0:
        return _attention_batched(q, k, v, bias, scale)
    return _attention_qtiled(q, k, v, bias, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, bias, scale: float):
    """softmax(q k^T * scale + bias) v over independent windows.

    Args:
      q, k, v: (W, N, H, hd) — W windows (batch x window grid), H heads,
        token-major layout straight from the qkv projection.
      bias: (H, N, N) float32 additive attention bias (shared across W).
      scale: score scale (1/sqrt(hd)).

    Returns:
      (W, N, H, hd) in q.dtype.
    """
    return jax.lax.platform_dependent(
        q,
        k,
        v,
        bias,
        cpu=functools.partial(_attention_xla, scale=scale),
        default=functools.partial(_attention_pallas, scale=scale),
    )


def _fwd(q, k, v, bias, scale):
    return window_attention(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, residuals, g):
    q, k, v, bias = residuals
    _, vjp = jax.vjp(
        lambda q, k, v, bias: _attention_xla(q, k, v, bias, scale),
        q,
        k,
        v,
        bias,
    )
    return vjp(g)


window_attention.defvjp(_fwd, _bwd)


def supports_pallas() -> bool:
    """Pallas TPU kernels need a TPU-ish backend; CPU paths lower to the
    XLA fallback via platform_dependent."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
