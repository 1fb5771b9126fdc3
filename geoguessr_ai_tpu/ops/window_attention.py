"""Fused window attention for TinyViT, as a Pallas TPU kernel.

The XLA path materializes the (B·nW, H, N, N) float32 score tensor in HBM
(measured: 17.4 ms per stage-2 block at B=128 — the model's second-largest
cost).  Window sizes here are small (N = 256 or 1024), so one (window, head)
cell's whole attention fits in VMEM: this kernel computes
``softmax(q k^T · scale + bias) v`` per grid cell without ever writing
scores to HBM — flash attention without the online-softmax machinery
(no K tiling needed at these sizes; see boom guide §1-§6 for the general
case).

Grid layout is (heads, windows) so the per-head bias block keeps the same
index across consecutive window steps — Pallas skips the re-fetch, and the
bias streams from HBM once per head instead of once per window.

Training uses a custom VJP whose backward recomputes attention with plain
XLA ops (correct, memory-light; forward stays on the fast path).

Measured verdict on v5e (stage-2 shapes, B=128, H=12, N=1024, hd=32):
  XLA einsum + bf16 score storage : 15.0 ms   <- production path
  this kernel                     : 787 ms    (grid cells too small)
  jax.experimental flash_attention: 55.9 ms (no bias) / 60.3 ms (ab)
TinyViT's head_dim of 32 wastes 3/4 of the MXU's 128-deep contraction in
tiled kernels; XLA's batched lowering wins.  Kept for reference/future
block-batched tuning; models/tinyvit.py defaults to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (N, hd)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0]  # (N, N) f32

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _attention_xla(q, k, v, bias, scale):
    s = jnp.einsum(
        "whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32
    )
    s = s * scale + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def _attention_pallas(q, k, v, bias, scale):
    W, H, N, hd = q.shape
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, H, N, hd), q.dtype),
        grid=(H, W),
        in_specs=[
            pl.BlockSpec(
                (1, 1, N, hd),
                lambda h, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd),
                lambda h, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd),
                lambda h, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # bias block index is constant across the w dimension -> Pallas
            # keeps it resident, one HBM fetch per head.
            pl.BlockSpec(
                (1, N, N),
                lambda h, w: (h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, N, hd),
            lambda h, w: (w, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * W * H * N * N * hd,
            bytes_accessed=(3 * W * H * N * hd + H * N * N) * 2
            + W * H * N * hd * 2,
            transcendentals=W * H * N * N,
        ),
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, bias, scale: float):
    """softmax(q k^T * scale + bias) v over independent windows.

    Args:
      q, k, v: (W, H, N, hd) — W windows (batch x window grid), H heads.
      bias: (H, N, N) float32 additive attention bias (shared across W).
      scale: score scale (1/sqrt(hd)).

    Returns:
      (W, H, N, hd) in q.dtype.
    """
    return _attention_pallas(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    return window_attention(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, residuals, g):
    q, k, v, bias = residuals
    # Recompute with XLA ops; grads via VJP of the reference formula.
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
    """Pallas TPU kernels need a TPU-ish backend; CPU tests use interpret
    mode via the XLA fallback instead."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
