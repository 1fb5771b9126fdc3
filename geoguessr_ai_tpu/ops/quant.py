"""int8 GEMM path for embedding inference.

v5e doubles int8 MXU throughput over bf16 (394 TOPS vs ~197 TFLOPS), the
only lever that raises the single-chip ceiling above bf16 physics toward
BASELINE.json's north star (ROADMAP #3).  XLA lowers an
int8 x int8 -> int32 ``dot_general`` straight onto the MXU's int8 mode, so
no Pallas is needed for the GEMM itself; the quantize/dequantize epilogues
are VPU elementwise ops that fuse into neighbors.

Scheme (weights AND activations int8 — activations-int8 is required to
hit the int8 MXU mode):

* weights: symmetric per-output-channel scales, quantized from the f32
  params inside the jitted forward (a ~21M-element VPU pass, negligible
  next to the 54 GFLOP forward — and checkpoints stay f32, no export
  step).
* activations: dynamic symmetric per-tensor scale from the batch abs-max.

Accuracy is gated in tests/test_quant.py: cosine(int8, bf16) > 0.99 on
fixture-panorama embeddings (the VERDICT's acceptance bar).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_symmetric(
    x: jax.Array, axis=None, eps: float = 1e-12
) -> tuple:
    """Symmetric int8 quantization.  axis=None: one scale per tensor;
    axis=k: per-slice scales along every dim EXCEPT k are reduced away
    (e.g. for a (in, out) weight, axis=1 gives per-output-channel scales
    of shape (1, out))."""
    if axis is None:
        amax = jnp.max(jnp.abs(x))
    else:
        reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
        amax = jnp.max(jnp.abs(x), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    per_row: bool = True,
) -> jax.Array:
    """y = x @ w (+ bias) through the int8 MXU path.

    x: (..., K) activations (any float dtype); w: (K, N) float weights.
    Returns (..., N) in out_dtype.

    per_row=True (default) scales activations per ROW (token): the
    abs-max has no cross-row dependency, so XLA can fuse the whole
    quantization into the producer's epilogue instead of a separate
    global-reduce pass over the activation (the measured cost that sank
    the per-tensor variant, docs/performance.md) — and per-row scales
    are tighter, improving accuracy for free.
    """
    xf = x.astype(jnp.float32)
    if per_row:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (..., 1)
        xs = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    else:
        xq, xs = quantize_symmetric(xf)
    wq, ws = quantize_symmetric(w.astype(jnp.float32), axis=1)  # (1, N)
    y = jax.lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (xs * ws.reshape(-1))  # row scales x per-channel col scales
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_static_matmul(
    x: jax.Array,
    w: jax.Array,
    amax: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """y = x @ w (+ bias) with a STATIC-calibrated activation scale.

    ``amax`` is the calibrated abs-max of the activation tensor (f32
    scalar, observed offline on calibration batches).  The quantize step
    is then a pure elementwise op with NO data-dependent reduce — it
    fuses into the producer's epilogue, so the program keeps the bf16
    path's fusion structure with int8 dots.  This is the fix for the two
    measured failure modes of the dynamic path (docs/performance.md):
    the extra abs-max HBM pass per GEMM, and the broken score-dot fusion
    that OOM'd TinyViT at B=320.
    """
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    wq, ws = quantize_symmetric(w.astype(jnp.float32), axis=1)  # (1, N)
    y = jax.lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (scale * ws.reshape(-1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_static_einsum_nc_cd(
    x: jax.Array,
    w: jax.Array,
    amax: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """'...c,cd->...d' on the static-calibrated int8 path."""
    lead = x.shape[:-1]
    y = int8_static_matmul(
        x.reshape(-1, x.shape[-1]), w, amax, bias=bias, out_dtype=out_dtype
    )
    return y.reshape(*lead, w.shape[-1])


def int8_static_conv(
    x: jax.Array,
    w: jax.Array,
    amax: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """NHWC conv through XLA's conv emitter with int8 operands.

    Round-5 lever (VERDICT r4 #1): the round-4b wave-2 lowering revision
    moved the dw-feeding 1x1s back to XLA *conv* emitters (the einsum
    GEMM layout forced a 3.2 GB copy into the depthwise emitter), which
    un-closed the int8 verdict for exactly those sites — the proven 2x
    int8 MXU mode (docs/performance.md round-4b int8 chapter: 1.8x at
    the fc1 shape) was never re-tried on the conv form.  This keeps the
    conv emitter (so the dw consumer still reads its native layout) and
    swaps the operands to int8: activations on a STATIC calibrated
    scale (elementwise quantize, fuses into the producer epilogue — the
    property that made the MLP static path win), weights per-output-
    channel.

    x: (B, H, W, Cin) float; w: (kh, kw, Cin, Cout) f32 (nn.Conv
    layout); amax: calibrated activation abs-max (f32 scalar).
    """
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    wq, ws = quantize_symmetric(w.astype(jnp.float32), axis=3)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (scale * ws.reshape(-1))
    return y.astype(out_dtype)


def fake_quant_static(x: jax.Array, amax: jax.Array) -> jax.Array:
    """Symmetric int8 quantize -> dequantize with a static scale.

    Used to store an activation tensor int8 in HBM between two fusions
    (e.g. the GELU output feeding a bytes-bound depthwise conv: the
    producer's epilogue writes int8 — half the HBM bytes — and the
    consumer's operand fusion converts back).  Returns x's dtype; the
    int8 intermediate is the materialization point.
    """
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return (xq.astype(jnp.float32) * scale).astype(x.dtype)


@jax.custom_vjp
def fake_quant_static_ste(x: jax.Array, amax: jax.Array) -> jax.Array:
    """``fake_quant_static`` with a straight-through estimator.

    The primal is bit-identical to ``fake_quant_static`` (same jaxpr, so
    inference programs using either compile to the same HLO); the VJP
    passes the cotangent through unchanged (standard QAT STE — the
    round() has zero derivative almost everywhere, which would kill the
    gradient at every int8-storage site).  Pass-through (no clip mask):
    the storage sites sit behind calibrated amax, so out-of-range
    activations are rare and masking would cost a saved residual.
    """
    return fake_quant_static(x, amax)


def _fqs_ste_fwd(x, amax):
    return fake_quant_static(x, amax), amax


def _fqs_ste_bwd(amax, g):
    return g, jnp.zeros_like(amax)


fake_quant_static_ste.defvjp(_fqs_ste_fwd, _fqs_ste_bwd)


def calibrate_act_stats(apply_calibrate, variables, batches) -> dict:
    """Accumulate per-site activation abs-max over calibration batches.

    ``apply_calibrate(variables, x)`` must run a quant_mode='calibrate'
    forward with ``mutable=['act_stats']`` and return ``(out, mutated)``.
    Returns the accumulated 'act_stats' tree — pass it to the static
    model as the 'act_scales' collection.
    """
    stats: dict = {}
    for x in batches:
        v = dict(variables)
        if stats:
            v["act_stats"] = stats
        _, mutated = apply_calibrate(v, x)
        stats = mutated["act_stats"]
    return stats


def int8_einsum_nc_cd(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """'...c,cd->...d' on the int8 path (the 1x1-conv/Dense shape used
    throughout the towers)."""
    lead = x.shape[:-1]
    y = int8_matmul(
        x.reshape(-1, x.shape[-1]), w, bias=bias, out_dtype=out_dtype
    )
    return y.reshape(*lead, w.shape[-1])
