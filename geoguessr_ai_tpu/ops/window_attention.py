"""Fused window attention for TinyViT, as Pallas TPU kernels.

The XLA path materializes the (B·nW, H, N, N) float32 score tensor in HBM —
the model's largest single traffic source.  Window sizes are small (N = 256
or 1024), so a q-tile's whole softmax row fits in VMEM and no online-softmax
machinery is needed (see boom guide §1-§6 for the general case).

Layout: kernels take **head-major (W, H, N, hd)** q/k/v.  Mosaic requires
the last two block dims to be full-or-aligned, which forbids slicing the
head axis of a token-major layout, and its tpu.matmul accepts only one
leading batch dim (a token-major variant with in-kernel transposes crashed
the compiler).  The surrounding model avoids materialized transposes by
emitting/consuming this layout directly inside the qkv/proj projection
einsums (models/tinyvit.py WindowAttention).

Two kernels, selected by shape:

* ``_attention_qtiled`` (large N): grid (heads, q_tiles, windows); per cell
  one (BQ, N) f32 score tile lives only in VMEM.  The per-(head, q_tile)
  bias block keeps the same index across the window dimension, so Pallas
  leaves it resident — one HBM fetch per (head, q_tile) instead of per
  window.  Measured on v5e at stage-2 shapes (W=128, H=12, N=1024, hd=32):
  **14.2 ms vs 33.9 ms XLA** (2.4x), max diff 1e-3.

* ``_attention_batched`` (small N): grid (heads, window_blocks); each cell
  computes BW windows' attention via batched dot_general so the MXU sees
  enough work per step (a naive one-window-per-cell grid ran 3-8x slower
  than XLA).

Earlier rejected designs, measured: whole-window single-cell kernel 787 ms;
jax.experimental flash_attention 55.9-60.3 ms (head_dim 32 wastes 3/4 of
the MXU contraction depth in its tiling).

Training uses a custom VJP whose backward recomputes attention with plain
XLA ops (correct, memory-light; forward stays on the fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: q-tile rows for the large-N kernel.
BLOCK_Q = 256
#: score-tile dtype inside the qkv-fused kernel.  bf16 halves the VMEM
#: tile (allowing bigger q-tiles / fewer k/v refetches); exp/softmax
#: normalization still accumulates f32.  Benchmarks patch this.
QKV_SCORE_DTYPE = jnp.float32
#: minimum window size N for WindowAttention to pick the qkv-fused kernel
#: over the head-major kernels (benchmarks patch this to sweep variants).
#: MEASURED (v5e, B=320 e2e): qkv-fused at stage 1 gives 734 vs 705
#: img/s — the fused (W, N, 3D) boundary removes the bnc,chd->bhnd
#: projection einsums (~25 ms) + dtype-convert copies (~8.5 ms) the
#: per-fusion profile attributed to the head-major layout — so the qkv
#: kernel is now the default wherever Pallas attention is enabled.
QKV_KERNEL_MIN_N = 0
#: windows per grid cell for the small-N kernel.
BLOCK_W = 8

#: per-kernel Mosaic VMEM limit override (bytes).  None keeps the
#: toolchain's 16 MB default.  Unlike --xla_tpu_scoped_vmem_limit_kib
#: (rejected by the relay client's flag parser — round-4 escape
#: campaign), this rides inside the kernel's compiler params, so it
#: transits the relay; it is the only scoped-VMEM knob reachable here.
VMEM_LIMIT_BYTES = None


def _cparams(*dimension_semantics):
    """CompilerParams with the module-level VMEM limit applied."""
    return pltpu.CompilerParams(
        dimension_semantics=dimension_semantics,
        vmem_limit_bytes=VMEM_LIMIT_BYTES,
    )


def _qtiled_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (BQ, hd)
    k = k_ref[0, 0]  # (N, hd)
    v = v_ref[0, 0]
    b = b_ref[0]  # (BQ, N) f32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + b
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attention_qtiled(q, k, v, bias, scale, block_q=BLOCK_Q):
    W, H, N, hd = q.shape
    block_q = min(block_q, N)
    while N % block_q:  # grid must tile N exactly (e.g. N=640 -> 128)
        block_q //= 2
    return pl.pallas_call(
        functools.partial(_qtiled_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((W, H, N, hd), q.dtype),
        grid=(H, N // block_q, W),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, hd),
                lambda h, qt, w: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd),
                lambda h, qt, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd),
                lambda h, qt, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, N),
                lambda h, qt, w: (h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, hd),
            lambda h, qt, w: (w, h, qt, 0),
            memory_space=pltpu.VMEM,
        ),
        # all-"arbitrary": measured equal to marking the window dim
        # parallel (14.4 vs 14.2 ms), and interpret mode requires parallel
        # dims to prefix the grid — which would break the resident-bias
        # block ordering.
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
    )(q, k, v, bias)


def _batched_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    q = q_ref[:, 0]  # (BW, N, hd)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    b = b_ref[0]  # (N, N) f32
    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BW, N, N)
    s = s * scale + b[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _attention_batched(q, k, v, bias, scale, block_w=BLOCK_W):
    W, H, N, hd = q.shape
    block_w = min(block_w, W)
    return pl.pallas_call(
        functools.partial(_batched_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((W, H, N, hd), q.dtype),
        grid=(H, W // block_w),
        in_specs=[
            pl.BlockSpec(
                (block_w, 1, N, hd),
                lambda h, wb: (wb, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_w, 1, N, hd),
                lambda h, wb: (wb, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_w, 1, N, hd),
                lambda h, wb: (wb, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, N),
                lambda h, wb: (h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_w, 1, N, hd),
            lambda h, wb: (wb, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_cparams("arbitrary", "arbitrary"),
    )(q, k, v, bias)


def _attention_xla(q, k, v, bias, scale):
    s = jnp.einsum(
        "whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32
    )
    s = s * scale + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def _attention_pallas(q, k, v, bias, scale):
    W, H, N, hd = q.shape
    if N >= 512:
        return _attention_qtiled(q, k, v, bias, scale)
    if W % BLOCK_W == 0:
        return _attention_batched(q, k, v, bias, scale)
    return _attention_qtiled(q, k, v, bias, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, bias, scale: float):
    """softmax(q k^T * scale + bias) v over independent windows.

    Pallas kernels on TPU, XLA einsum elsewhere — selected per lowering
    platform (`lax.platform_dependent`), so the same model traces on CPU
    (tests, host-side init) and TPU without reconfiguration.

    Args:
      q, k, v: (W, H, N, hd) — W windows (batch x window grid), H heads.
      bias: (H, N, N) float32 additive attention bias (shared across W).
      scale: score scale (1/sqrt(hd)).

    Returns:
      (W, H, N, hd) in q.dtype.
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


# ---------------------------------------------------------------------------
# qkv-fused variant: consumes the raw (W, N, 3D) qkv projection directly —
# no (B,N,H,hd) layout einsums around the pallas_call (profiling showed
# those cost more than the head-major kernel saves at stage-2 shapes).
# Heads are lane-sliced inside VMEM; output writes concatenated heads as a
# plain (W, N, D) tensor for the downstream projection.
#
# MEASURED VERDICTS (v5e, TinyViT-21M-512 e2e, bf16):
# * round 1, per-head Python-loop dots (B=256): 664 vs 697 img/s.
# * round 2, head-chunked v2 below (grid (hc, qt, w), resident bias
#   chunk, 4-head batched dot_general, B=320): 662 (bq256/hb4) and 579
#   (bq128/hb4) vs 693 for the (1,)-default.  Three designs in, the XLA
#   einsum attention still wins at stage-2 shapes: the hd=32 contraction
#   runs at 1/4 MXU depth for BOTH paths, so the kernel's only edge is
#   HBM traffic — and XLA's own softmax/probs scheduling at these shapes
#   is better than the per-fusion-profile estimate suggested, while the
#   kernel pays k/v refetch per q-tile.  XLA stays the stage-2 default;
#   the kernel remains a tested opt-in.
# ---------------------------------------------------------------------------


def _qkv_fused_kernel(
    q_ref, kv_ref, b_ref, o_ref, *, scale: float, hd: int
):
    """v2 cell: HB heads of one window's q-tile.

    Blocks arrive channel-sliced per head-chunk by the BlockSpec index
    maps (TinyViT qkv channel layout: head h at [h*3hd, (h+1)*3hd) with
    q/k/v slots of hd each).  Scores run as ONE batched dot over the
    chunk's heads — round 1's per-head Python-loop dots measured 664 vs
    697 img/s e2e; the batch dim amortises the narrow hd=32 contraction's
    fixed costs."""
    q_all = q_ref[0]  # (BQ, HB*3hd)
    kv_all = kv_ref[0]  # (N, HB*3hd)
    hb = q_all.shape[-1] // (3 * hd)
    # Bias travels bf16 ((H, BQ, N) f32 alone blows the 16MB scoped-VMEM
    # stack at stage-2 shapes); upcast at use.
    b = b_ref[...]  # (HB, BQ, N) bf16; upcast at use

    def heads(x, slot):
        return jnp.stack(
            [
                x[:, h * 3 * hd + slot * hd : h * 3 * hd + (slot + 1) * hd]
                for h in range(hb)
            ],
            axis=0,
        )  # (HB, rows, hd)

    q = heads(q_all, 0)
    k = heads(kv_all, 1)
    v = heads(kv_all, 2)
    sd = QKV_SCORE_DTYPE
    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=sd,
    )  # (HB, BQ, N) — MXU accumulates f32 internally either way
    s = s * jnp.asarray(scale, sd) + b.astype(sd)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    p = (p.astype(jnp.float32) / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p,
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (HB, BQ, hd)
    for h in range(hb):
        o_ref[0, :, h * hd : (h + 1) * hd] = o[h].astype(o_ref.dtype)


def select_head_block(num_heads: int, hd: int, requested: int) -> int:
    """Largest hb <= requested satisfying Mosaic's lane constraint: the
    qkv channel block (3*hd*hb wide) must divide by 128; falls back to
    the full head count (channel block == full dim, always legal)."""
    hb = min(requested, num_heads)
    while hb > 1 and (num_heads % hb or (3 * hd * hb) % 128):
        hb -= 1
    if num_heads % hb or (3 * hd * hb) % 128:
        return num_heads
    return hb


def _attention_qkv_fused_pallas(
    qkv, bias, scale, num_heads, block_q=256, head_block=4
):
    """Grid (head_chunk, q_tile, window) — window fastest, so the bias
    chunk block (index constant in w) stays VMEM-resident across all
    windows; k/v are re-fetched per q-tile only.

    head_block must satisfy Mosaic's lane constraint: the qkv channel
    block (3*hd*head_block wide) must be 128-divisible (hd=32 -> hb in
    {4, 8, 12}) or span the full channel dim; largest valid hb <= the
    request is chosen."""
    W, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    head_block = select_head_block(num_heads, hd, head_block)
    block_q = min(block_q, N)
    while N % block_q:
        block_q //= 2
    cw = 3 * hd * head_block  # qkv channels per chunk
    n_chunks = num_heads // head_block
    bias = bias.astype(qkv.dtype)  # (H, N, N) bf16
    return pl.pallas_call(
        functools.partial(_qkv_fused_kernel, scale=scale, hd=hd),
        out_shape=jax.ShapeDtypeStruct((W, N, D), qkv.dtype),
        grid=(n_chunks, N // block_q, W),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, cw),
                lambda hc, qt, w: (w, qt, hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, cw),
                lambda hc, qt, w: (w, 0, hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (head_block, block_q, N),
                lambda hc, qt, w: (hc, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, head_block * hd),
            lambda hc, qt, w: (w, qt, hc),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
    )(qkv, qkv, bias)  # same array via two views: q rows + full-window kv


def _attention_qkv_fused_xla(qkv, bias, scale, num_heads):
    W, N, D3 = qkv.shape
    hd = D3 // (3 * num_heads)
    x = qkv.reshape(W, N, num_heads, 3 * hd)
    q, k, v = jnp.split(x, 3, axis=-1)  # (W, N, H, hd)
    s = jnp.einsum(
        "wnhd,wmhd->whnm", q, k, preferred_element_type=jnp.float32
    )
    s = s * scale + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("whnm,wmhd->wnhd", p, v)
    return o.reshape(W, N, num_heads * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def window_attention_qkv(qkv, bias, scale: float, num_heads: int):
    """Window attention over a fused (W, N, 3D) qkv tensor.

    Channel layout matches the standard reshape/split convention:
    channel c -> (head = c // (3*hd), slot = (c %% (3*hd)) // hd) with
    slot 0/1/2 = q/k/v.  Returns (W, N, D).
    """
    return jax.lax.platform_dependent(
        qkv,
        bias,
        cpu=functools.partial(
            _attention_qkv_fused_xla, scale=scale, num_heads=num_heads
        ),
        default=functools.partial(
            _attention_qkv_fused_pallas, scale=scale, num_heads=num_heads
        ),
    )


def _qkv_fwd(qkv, bias, scale, num_heads):
    return window_attention_qkv(qkv, bias, scale, num_heads), (qkv, bias)


# ---------------------------------------------------------------------------
# Pallas attention BACKWARD (round 4, VERDICT #2): the training backward
# previously recomputed attention via jax.vjp over the XLA forward, which
# re-materializes the (W, H, N, N) f32 score/prob/dscore tensors in HBM —
# forfeiting in the bwd pass exactly the traffic the forward kernels
# eliminate.  This kernel recomputes scores/probs per window block in
# VMEM and emits d_qkv + d_bias in one pass (no online-softmax machinery:
# N <= 256 rows fit VMEM whole, as in the forward).
#
# Memory shape: grid (W/wb,) sequential; per cell an in-kernel python
# loop over head GROUPS bounds the f32 (wb*hg, N, N) stacks (s -> p,
# dp, ds) under _BWD_STACK_BYTES each, so stage 3's H=18 fits scoped
# VMEM (an all-heads cell would need 4 x 4.7 MB stacks — the measured
# compile-crash regime).  d_bias accumulates into a constant-index f32
# output block that stays resident across the sequential grid.
# ---------------------------------------------------------------------------

#: per-tensor budget for the (wb*hg, N, N) f32 score-sized stacks in the
#: backward kernel (several are live at once; see layout note above).
#: MEASURED: 2 MB put the stage-3 (H=18) backward at 16.11 MB scoped
#: VMEM — 116 KB over the 16 MB limit (train_b20/24 probes, round 4);
#: 1 MB leaves ~2 MB headroom after bias/db residency + double-buffered
#: window blocks.
_BWD_STACK_BYTES = 1 * 1024 * 1024


def _qkv_bwd_kernel(
    qkv_ref, b_ref, g_ref, dqkv_ref, db_ref, *,
    scale: float, hd: int, num_heads: int, hg: int,
):
    WB, N, _ = qkv_ref.shape
    w0 = pl.program_id(0)
    qkv = qkv_ref[...]  # (WB, N, 3D) bf16
    gout = g_ref[...]  # (WB, N, D)

    for h_start in range(0, num_heads, hg):
        heads = list(range(h_start, min(h_start + hg, num_heads)))

        def stack(src, get):
            return jnp.stack(
                [get(src[w], h) for w in range(WB) for h in heads], axis=0
            )

        q = stack(qkv, lambda x, h: x[:, h * 3 * hd : h * 3 * hd + hd])
        k = stack(
            qkv, lambda x, h: x[:, h * 3 * hd + hd : h * 3 * hd + 2 * hd]
        )
        v = stack(
            qkv,
            lambda x, h: x[:, h * 3 * hd + 2 * hd : h * 3 * hd + 3 * hd],
        )
        gh = stack(gout, lambda x, h: x[:, h * hd : (h + 1) * hd])

        b = b_ref[...][heads[0] : heads[-1] + 1]  # (hg, N, N)
        bt = jnp.concatenate([b] * WB, axis=0).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp is independent of s — issue before the softmax so the MXU
        # overlaps the VPU (round-4b reorder; identical numerics).
        # dp[nq, nk] = sum_d g[nq, d] v[nk, d]
        dp = jax.lax.dot_general(
            gh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bt
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (WB*hg, Nq, Nk) f32

        pv = p.astype(v.dtype)
        # dv[nk, d] = sum_nq p[nq, nk] g[nq, d]
        dv = jax.lax.dot_general(
            pv, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - t)  # (WB*hg, Nq, Nk) f32
        dsv = ds.astype(v.dtype)
        dq = jax.lax.dot_general(
            dsv, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        # dk[nk, d] = sum_nq ds[nq, nk] q[nq, d]
        dk = jax.lax.dot_general(
            dsv, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

        for i, h in enumerate(heads):
            for w in range(WB):
                row = w * len(heads) + i
                c0 = h * 3 * hd
                dqkv_ref[w, :, c0 : c0 + hd] = dq[row].astype(
                    dqkv_ref.dtype
                )
                dqkv_ref[w, :, c0 + hd : c0 + 2 * hd] = dk[row].astype(
                    dqkv_ref.dtype
                )
                dqkv_ref[w, :, c0 + 2 * hd : c0 + 3 * hd] = dv[row].astype(
                    dqkv_ref.dtype
                )

        db_part = sum(
            ds[w * len(heads) : (w + 1) * len(heads)] for w in range(WB)
        )  # (hg, N, N) f32

        h_slice = slice(heads[0], heads[-1] + 1)

        @pl.when(w0 == 0)
        def _init():
            db_ref[h_slice] = db_part

        @pl.when(w0 != 0)
        def _accum():
            db_ref[h_slice] += db_part


def _attention_qkv_bwd_pallas(
    qkv, bias, g, scale, num_heads, block_w=None, interpret=False
):
    """d(qkv), d(bias) for window_attention_qkv.  Returns d_bias in f32;
    callers cast to the primal bias dtype."""
    W, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    wb = block_w or 1
    while W % wb:
        wb -= 1
    hg = max(1, _BWD_STACK_BYTES // (wb * N * N * 4))
    hg = min(hg, num_heads)
    const3 = lambda w: (0, 0, 0)
    dqkv, db = pl.pallas_call(
        functools.partial(
            _qkv_bwd_kernel, scale=scale, hd=hd, num_heads=num_heads, hg=hg
        ),
        out_shape=[
            jax.ShapeDtypeStruct((W, N, 3 * D), qkv.dtype),
            jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32),
        ],
        grid=(W // wb,),
        in_specs=[
            pl.BlockSpec(
                (wb, N, 3 * D), lambda w: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_heads, N, N), const3, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wb, N, D), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (wb, N, 3 * D), lambda w: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_heads, N, N), const3, memory_space=pltpu.VMEM
            ),
        ],
        compiler_params=_cparams("arbitrary"),
        interpret=interpret,
    )(qkv, bias.astype(qkv.dtype), g)
    return dqkv, db


#: largest all-heads f32 score footprint the small-N bwd kernel accepts
#: before switching to the q-tiled large-N kernels (stage-2 N=1024).
_BWD_MAX_SCORE_BYTES = 6 * 1024 * 1024

#: q-tile rows for the large-N backward kernels.
_BWD_BLOCK_Q = 256


def _bwd_tile_math(q, k, v, b, gh, scale):
    """Shared per-(head, q-tile) backward math.  All f32 intermediates
    stay in VMEM.  Returns (dq, dk_partial, dv_partial, ds)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N)
    # dp is independent of s — issuing its matmul BEFORE the softmax
    # lets the MXU fill while the VPU normalizes (the round-4b
    # software-pipeline lever; identical numerics, pure reorder).
    # dp[nq, nk] = sum_d g[nq, d] v[nk, d]
    dp = jax.lax.dot_general(
        gh, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + b
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = p.astype(v.dtype)
    # dv[nk, d] = sum_nq p[nq, nk] g[nq, d]
    dv = jax.lax.dot_general(
        pv, gh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - t)
    dsv = ds.astype(v.dtype)
    dq = jax.lax.dot_general(
        dsv, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dsv, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    return dq, dk, dv, ds


def _bwd_k1_kernel(q_ref, k_ref, v_ref, b_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, *, scale: float):
    qt = pl.program_id(2)
    dq, dk, dv, _ = _bwd_tile_math(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
        b_ref[0].astype(jnp.float32), g_ref[0, 0], scale,
    )
    dq_ref[0, 0] = dq

    @pl.when(qt == 0)
    def _init():
        dk_ref[0, 0] = dk
        dv_ref[0, 0] = dv

    @pl.when(qt != 0)
    def _accum():
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv


def _bwd_k2_kernel(q_ref, k_ref, v_ref, b_ref, g_ref, db_ref, *,
                   scale: float):
    w = pl.program_id(2)
    _, _, _, ds = _bwd_tile_math(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
        b_ref[0].astype(jnp.float32), g_ref[0, 0], scale,
    )

    @pl.when(w == 0)
    def _init():
        db_ref[0] = ds

    @pl.when(w != 0)
    def _accum():
        db_ref[0] += ds


def _attention_bwd_qtiled_pallas(
    q, k, v, bias, g, scale, block_q=_BWD_BLOCK_Q, interpret=False
):
    """Head-major q-tiled attention backward for large N (stage 2).

    Two pallas_calls, because the two accumulations need opposite grid
    nesting: dk/dv accumulate across q-tiles (K1: grid (H, W, QT), qt
    fastest, dk/dv blocks resident per (h, w)) while d_bias accumulates
    across windows (K2: grid (H, QT, W), w fastest, db block resident
    per (h, qt)).  Each recomputes the (BQ, N) f32 score tile in VMEM —
    the XLA autodiff instead stores/reads (W, H, N, N)-sized probs and
    dscore tensors in HBM (the measured ~250 ms of the round-4 train
    profile).  All blocks slice leading dims only, so head-major layout
    carries no Mosaic lane constraints.

    Returns (dq, dk, dv, d_bias) with f32 dq/dk/dv and f32 d_bias.
    """
    W, H, N, hd = q.shape
    BQ = min(block_q, N)
    while N % BQ:
        BQ //= 2
    QT = N // BQ
    bias_in = bias.astype(jnp.float32)
    k1 = pl.pallas_call(
        functools.partial(_bwd_k1_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
        ],
        grid=(H, W, QT),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ, N), lambda h, w, qt: (h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
        interpret=interpret,
    )
    dq, dk, dv = k1(q, k, v, bias_in, g)
    k2 = pl.pallas_call(
        functools.partial(_bwd_k2_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        grid=(H, QT, W),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, qt, w: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, qt, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, qt, w: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ, N), lambda h, qt, w: (h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, qt, w: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BQ, N), lambda h, qt, w: (h, qt, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
        interpret=interpret,
    )
    db = k2(q, k, v, bias_in, g)
    return dq, dk, dv, db


def _attention_qkv_bwd_large(qkv, bias, g, scale, num_heads,
                             interpret=False):
    """Large-N (W, N, 3D)-layout backward: stage the tensors head-major
    with cheap XLA transposes (~0.5 ms vs the ~250 ms they replace),
    run the q-tiled kernels, and interleave the cotangent back."""
    W, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    x = qkv.reshape(W, N, num_heads, 3, hd)
    q = x[:, :, :, 0].transpose(0, 2, 1, 3)  # (W, H, N, hd)
    k = x[:, :, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, :, 2].transpose(0, 2, 1, 3)
    gh = g.reshape(W, N, num_heads, hd).transpose(0, 2, 1, 3)
    if BWD_MERGED:
        dq, dk, dv, db = _attention_bwd_merged_pallas(
            q, k, v, bias, gh, scale, interpret=interpret
        )
    else:
        dq, dk, dv, db = _attention_bwd_qtiled_pallas(
            q, k, v, bias, gh, scale, interpret=interpret
        )
    dqkv = jnp.stack([dq, dk, dv], axis=3)  # (W, H, N, 3, hd)
    dqkv = dqkv.transpose(0, 2, 1, 3, 4).reshape(W, N, 3 * D)
    return dqkv.astype(qkv.dtype), db


def _qkv_bwd(scale, num_heads, residuals, g):
    qkv, bias = residuals
    W, N, D3 = qkv.shape

    def xla_bwd(qkv, bias, g):
        _, vjp = jax.vjp(
            lambda a, b: _attention_qkv_fused_xla(a, b, scale, num_heads),
            qkv,
            bias,
        )
        return vjp(g)

    if num_heads * N * N * 4 > _BWD_MAX_SCORE_BYTES:
        def pallas_bwd_large(qkv, bias, g):
            dqkv, db = _attention_qkv_bwd_large(
                qkv, bias, g, scale, num_heads
            )
            return dqkv, db.astype(bias.dtype)

        return jax.lax.platform_dependent(
            qkv, bias, g, cpu=xla_bwd, default=pallas_bwd_large
        )

    def pallas_bwd(qkv, bias, g):
        dqkv, db = _attention_qkv_bwd_pallas(qkv, bias, g, scale, num_heads)
        return dqkv, db.astype(bias.dtype)

    return jax.lax.platform_dependent(
        qkv, bias, g, cpu=xla_bwd, default=pallas_bwd
    )


window_attention_qkv.defvjp(_qkv_fwd, _qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def window_attention_qkv_xla(qkv, bias, scale: float, num_heads: int):
    """Hybrid: the plain XLA einsum attention FORWARD (the measured-best
    stage-2 forward — four Pallas forward designs lost to it,
    docs/performance.md) with the Pallas attention BACKWARD.

    The primal trace is identical to the inline einsum formulation the
    model used before (same ops, same dtypes), so inference programs are
    unchanged; only vjp-transformed programs differ — the backward stops
    storing/re-reading the (W, H, N, N)-sized probs + dscore tensors in
    HBM (the dominant line of the round-4 train-step profile).
    """
    return _attention_qkv_fused_xla(qkv, bias, scale, num_heads)


def _qkvx_fwd(qkv, bias, scale, num_heads):
    return (
        window_attention_qkv_xla(qkv, bias, scale, num_heads),
        (qkv, bias),
    )


window_attention_qkv_xla.defvjp(_qkvx_fwd, _qkv_bwd)


def supports_pallas() -> bool:
    """Pallas TPU kernels need a TPU-ish backend; CPU tests use the XLA
    fallback instead."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fully-fused block kernel (round 3): LN + qkv GEMM + attention + out-proj
# in ONE pallas_call, for the small-N stages (1 and 3) where one window's
# whole attention fits a grid cell with no q-tiling and a single head
# chunk.  What it removes vs the qkv-kernel path (per-fusion profile,
# docs/performance.md round-3 chapter): the (W, N, 3D) qkv tensor's HBM
# write+read (stage 1: 1.5 GB/block), the ~4 ms layout-convert copies
# XLA materializes to feed the pallas_call, the f32 LN round-trip, and
# the separate proj GEMM's input read.  Stage 2 keeps XLA: its N=1024
# windows would need q-tiling, and re-projecting k/v per q-tile costs
# more than the saved traffic (the residency conflict that sank three
# stage-2 kernel designs).
# ---------------------------------------------------------------------------

#: NOTE on all module-level knobs in this file (FUSED_BLOCK_WB,
#: FB_SW_PIPELINE, FB_HALF_PIPELINE, S2_*, CLIP_SW_PIPELINE, ...): they
#: are read at TRACE time inside kernel builders, so flipping one after
#: a jit program is cached has NO effect on that program — A/B toggling
#: must use a fresh jit trace per setting (a new jitted callable, or
#: distinct closed-over config as the experiment scripts do).
#: windows per fused-block grid cell (benchmarks sweep).
FUSED_BLOCK_WB = 4
#: software-pipeline the fused-block kernel's window loop (issue window
#: w+1's score matmul before window w's softmax — the stage-2 lever
#: applied to stages 1/3).  Engages only when WB >= 2.  MEASURED
#: NEGATIVE e2e (873.4 vs 880.7 img/s): the per-window loop forfeits
#: the batched-dot efficiency.
FB_SW_PIPELINE = False
#: lighter variant: split the ONE batched score dot in two halves and
#: interleave their softmaxes — keeps MXU batching.
FB_HALF_PIPELINE = False


def _fused_block_kernel(
    x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ab_ref, o_ref, *, scale: float, hd: int, num_heads: int, eps: float,
):
    WB, N, C = x_ref.shape
    D = num_heads * hd
    x = x_ref[...].reshape(WB * N, C)

    # LayerNorm (f32 stats, bf16 out) — never leaves VMEM
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ls_ref[0].astype(jnp.float32)
        + lb_ref[0].astype(jnp.float32)
    ).astype(x.dtype)

    qkv = (
        jax.lax.dot_general(
            ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bqkv_ref[0]
    ).reshape(WB, N, 3 * D)

    def slot_w(w, s):
        return jnp.stack(
            [
                qkv[w, :, h * 3 * hd + s * hd : h * 3 * hd + (s + 1) * hd]
                for h in range(num_heads)
            ],
            axis=0,
        )  # (H, N, hd)

    ab = ab_ref[...].astype(jnp.float32)  # (H, N, N)

    if FB_SW_PIPELINE and WB >= 2:
        # per-window lookahead: window w+1's score matmul issues before
        # window w's softmax so the MXU and VPU overlap (the measured
        # stage-2 lever, exp_r4_s2pipe).
        def score(w):
            s = jax.lax.dot_general(
                slot_w(w, 0), slot_w(w, 1), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, N, N)
            return s * scale + ab

        s_cur = score(0)
        for w in range(WB):
            s_nxt = score(w + 1) if w + 1 < WB else None
            m = jnp.max(s_cur, axis=-1, keepdims=True)
            p = jnp.exp(s_cur - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            v = slot_w(w, 2)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, N, hd)
            o_cat = jnp.concatenate(
                [o[h] for h in range(num_heads)], axis=-1
            ).astype(x.dtype)  # (N, D)
            out = (
                jax.lax.dot_general(
                    o_cat, wproj_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bproj_ref[0].astype(jnp.float32)
            )
            o_ref[w] = out.astype(o_ref.dtype)
            s_cur = s_nxt
        return

    def slot(s):
        return jnp.stack(
            [
                qkv[w, :, h * 3 * hd + s * hd : h * 3 * hd + (s + 1) * hd]
                for w in range(WB)
                for h in range(num_heads)
            ],
            axis=0,
        )  # (WB*H, N, hd)

    q, k, v = slot(0), slot(1), slot(2)
    abw = jnp.concatenate([ab] * WB, axis=0)

    def sdot(sl):
        return (
            jax.lax.dot_general(
                q[sl], k[sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + abw[sl]
        )

    def smax(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def odot(p, sl):
        return jax.lax.dot_general(
            p.astype(v.dtype), v[sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    G = q.shape[0]
    if FB_HALF_PIPELINE and G >= 2:
        # split the batched score dot in two and interleave: the second
        # half's score matmul (MXU) issues before the first half's
        # softmax (VPU) — keeps the batched-dot efficiency the
        # per-window FB_SW_PIPELINE variant forfeited.
        h1 = slice(0, G // 2)
        h2 = slice(G // 2, G)
        s_a = sdot(h1)
        s_b = sdot(h2)
        o = jnp.concatenate(
            [odot(smax(s_a), h1), odot(smax(s_b), h2)], axis=0
        )  # (WB*H, N, hd)
    else:
        s = sdot(slice(None))  # (WB*H, N, N) f32
        o = odot(smax(s), slice(None))  # (WB*H, N, hd)
    o_cat = jnp.concatenate(
        [
            jnp.concatenate(
                [o[w * num_heads + h] for h in range(num_heads)], axis=-1
            )
            for w in range(WB)
        ],
        axis=0,
    ).astype(x.dtype)  # (WB*N, D)
    out = (
        jax.lax.dot_general(
            o_cat, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[0].astype(jnp.float32)
    )
    o_ref[...] = out.reshape(WB, N, C).astype(o_ref.dtype)


#: VMEM budget for the fused-block kernel's (WB*H, N, N) f32 score
#: stack; WB auto-sizes under it (stage 3's H=18 at WB=4 is 18.9 MB —
#: past the ~16 MB scoped-VMEM limit, the measured compile-crash mode).
FUSED_BLOCK_SCORE_BYTES = 8 * 1024 * 1024


def _fused_block_pallas(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale, num_heads, eps, block_w=None, interpret=False,
):
    W, N, C = x.shape
    D = w_proj.shape[0]
    hd = D // num_heads
    wb = block_w or FUSED_BLOCK_WB
    score_bytes = num_heads * N * N * 4
    wb = max(1, min(wb, FUSED_BLOCK_SCORE_BYTES // score_bytes))
    while W % wb:
        wb -= 1
    dt = x.dtype
    args = (
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w_qkv.astype(dt),
        b_qkv.reshape(1, 3 * D).astype(dt),
        w_proj.astype(dt),
        b_proj.reshape(1, C).astype(jnp.float32),
        bias.astype(dt),
    )
    const = lambda w: (0, 0)
    const3 = lambda w: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(
            _fused_block_kernel, scale=scale, hd=hd,
            num_heads=num_heads, eps=eps,
        ),
        out_shape=jax.ShapeDtypeStruct((W, N, C), dt),
        grid=(W // wb,),
        in_specs=[
            pl.BlockSpec(
                (wb, N, C), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, 3 * D), const, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads, N, N), const3, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (wb, N, C), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=_cparams("arbitrary"),
        interpret=interpret,
    )(*args)


def _fused_block_xla(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale, num_heads, eps, attn_fn=None,
):
    W, N, C = x.shape
    D = w_proj.shape[0]
    hd = D // num_heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
        + ln_bias.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = (
        jnp.einsum(
            "wnc,ck->wnk", ln, w_qkv.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + b_qkv.astype(x.dtype)
    )
    if attn_fn is None:
        o = _attention_qkv_fused_xla(qkv, bias, scale, num_heads)
    else:
        o = attn_fn(qkv, bias, scale, num_heads)
    return (
        jnp.einsum(
            "wnd,dc->wnc", o, w_proj.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + b_proj.astype(x.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_block_attention(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale: float, num_heads: int, eps: float = 1e-5,
):
    """proj(attention(LN(x))) + b_proj for independent windows, fully
    fused on TPU (residual add stays outside so DropPath semantics are
    untouched).

    Args:
      x: (W, N, C) pre-LN window tokens.
      ln_scale, ln_bias: (C,) LayerNorm params.
      w_qkv: (C, 3D) TinyViT channel layout (head h at [h*3hd, (h+1)*3hd),
        q/k/v slots of hd within); b_qkv (3D,).
      w_proj: (D, C); b_proj (C,).
      bias: (H, N, N) additive attention bias.
    """
    return jax.lax.platform_dependent(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
        cpu=functools.partial(
            _fused_block_xla, scale=scale, num_heads=num_heads, eps=eps
        ),
        default=functools.partial(
            _fused_block_pallas, scale=scale, num_heads=num_heads, eps=eps
        ),
    )


def _fb_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
            scale, num_heads, eps):
    return (
        fused_block_attention(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
            scale, num_heads, eps,
        ),
        (x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias),
    )


#: Round-5 (VERDICT r4 #2): hand-roll the fused-block backwards instead
#: of jax.vjp over the full forward.  The vjp form re-traces the WHOLE
#: primal — including pieces whose outputs the cotangent never uses (the
#: final proj GEMM in _fb_bwd; the entire XLA attention forward in
#: _fb_s2_bwd, the round-4b profile's 53.4 ms "bwd-attn XLA recompute"
#: line) — and XLA was observed not to DCE them through the nested
#: custom_vjp call.  The hand-rolled form recomputes only what the
#: cotangent rules consume.  Trace-time knob (fresh jit per setting).
HANDROLLED_FB_BWD = False


def _ln_qkv_prefix(x, ln_scale, ln_bias, w_qkv, b_qkv, eps):
    """LayerNorm + qkv GEMM — the exact _fused_block_xla/_fb_s2_xla
    prefix trace, split out so the hand-rolled backwards can vjp just
    the prefix (bit-identical: autodiff is compositional)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
        + ln_bias.astype(jnp.float32)
    ).astype(x.dtype)
    return (
        jnp.einsum(
            "wnc,ck->wnk", ln, w_qkv.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + b_qkv.astype(x.dtype)
    )


def _fb_bwd_vjp(scale, num_heads, eps, res, g):
    # Recompute through window_attention_qkv (NOT the raw XLA attention):
    # on TPU that recomputes the attention middle with the fast forward
    # kernel and differentiates it with the Pallas backward kernel — no
    # (W, H, N, N) f32 score materialization in HBM.  The LN/qkv/proj
    # GEMMs differentiate as plain XLA GEMMs (already MXU-shaped).  On
    # CPU window_attention_qkv lowers to the XLA attention, making this
    # numerically the old recompute path.
    _, vjp = jax.vjp(
        lambda *a: _fused_block_xla(
            *a, scale, num_heads, eps, attn_fn=window_attention_qkv
        ),
        *res,
    )
    return vjp(g)


def _fb_bwd(scale, num_heads, eps, res, g):
    if not HANDROLLED_FB_BWD:
        return _fb_bwd_vjp(scale, num_heads, eps, res, g)
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias = res
    qkv, prefix_vjp = jax.vjp(
        functools.partial(_ln_qkv_prefix, eps=eps),
        x, ln_scale, ln_bias, w_qkv, b_qkv,
    )
    # The attention output IS a residual here (proj weight grad), so the
    # middle recompute stays — through the fast forward (Pallas on TPU).
    ao, attn_vjp = jax.vjp(
        lambda a, b: window_attention_qkv(a, b, scale, num_heads),
        qkv, bias,
    )
    # Hand-rolled proj cotangents (the primal out = ao @ w_proj + b_proj
    # is never recomputed): same dtype chain autodiff would produce —
    # bf16-preferred dots, convert-transpose back to the param dtypes.
    wp_c = w_proj.astype(x.dtype)
    dao = jnp.einsum(
        "wnc,dc->wnd", g, wp_c, preferred_element_type=x.dtype
    )
    dw_proj = jnp.einsum(
        "wnd,wnc->dc", ao, g, preferred_element_type=x.dtype
    ).astype(w_proj.dtype)
    db_proj = jnp.sum(g, axis=(0, 1)).astype(b_proj.dtype)
    dqkv, dbias = attn_vjp(dao)
    dx, dls, dlb, dw_qkv, db_qkv = prefix_vjp(dqkv)
    return dx, dls, dlb, dw_qkv, db_qkv, dw_proj, db_proj, dbias


fused_block_attention.defvjp(_fb_fwd, _fb_bwd)


# ---------------------------------------------------------------------------
# Stage-2 no-proj fused block (round 4, VERDICT #3 attempt #5).
#
# The four earlier stage-2 kernel designs lost e2e to XLA's windowed
# scores+softmax+probs@v mega-fusions (docs/performance.md).  Their shared
# bind: the full (H, N, N) bias cannot be VMEM-resident (25 MB bf16 at
# H=12, N=1024 > the 16 MB scoped limit), and every chunking that makes it
# resident either refetches x/bias per chunk or needs cross-chunk output
# accumulation whose grid order conflicts with bias residency.
#
# This design cuts the conflict by fusing LN + qkv GEMM + attention but
# NOT the out-projection: grid (head_chunk, window) with window innermost,
# so the (hb, N, N) bf16 bias chunk AND the (C, hb*3hd) qkv weight chunk
# stay VMEM-resident across all windows; each chunk computes its own qkv
# *columns* (no duplicated GEMM FLOPs — only the cheap VPU LayerNorm is
# recomputed per chunk) and writes its heads' attention output slice
# directly, so no cross-chunk accumulation exists and the out-proj runs
# as a separate XLA GEMM exactly as in the hybrid path.  What the fusion
# removes vs the XLA stage-2 path is the (W, N, 3D) qkv tensor's HBM
# round trip (~2.4 GB/layer at B=512) at the cost of re-reading x per
# chunk (~1.2 GB with 3 chunks).
#
# VMEM accounting at stage-2 shapes (hb=4, N=1024, C=384, bq=256):
# bias chunk 8.4 MB bf16 + x 0.75 + LN f32 transient ~1.5 + qkv 0.75 +
# per-head (bq, N) f32 score/prob tiles 2 x 1 MB + out 0.25 + weights
# 0.3 -> ~14 MB.  Heads iterate sequentially inside the chunk to keep
# the score stacks at (bq, N) instead of (hb*bq, N) (S2_HEAD_BATCHED
# flips this for A/B measurement).
# ---------------------------------------------------------------------------

#: q rows per score tile inside the stage-2 no-proj kernel.  MEASURED
#: e2e at B=512 production shapes: serial bq=512 = 213.2 panos/s beat
#: serial bq=256 (208.7, tools/exp_r4_s2noproj.py) — but with the
#: round-4b software pipeline the optimum inverts: pipelined bq=128 =
#: 25.81 ms/block vs serial bq=512's 28.81 (bq=64 29.8, bq=256 26.8,
#: bq=512+VMEM-raise 27.7) — short tiles give the scheduler
#: interleavable MXU/VPU chains.  e2e: 878.4 img/s vs 855.2, numerics
#: EXACT (tools/exp_r4_s2pipe.py + /tmp sweep logs).
S2_BLOCK_Q = 128
#: the serial (S2_SW_PIPELINE=False) fallback's own default — its
#: measured optimum (bq=512 = 213.2 panos/s) differs from the pipelined
#: path's (see _fb_s2_pallas).
S2_SERIAL_BLOCK_Q = 512
#: batch the chunk's heads into one dot_general (True) or loop heads
#: sequentially with per-head score tiles (False, VMEM-lean default).
S2_HEAD_BATCHED = False
#: heads per chunk (n_chunks = num_heads // hb).  hb=12 with
#: VMEM_LIMIT_BYTES raised keeps the FULL expanded bias resident and
#: reads x once — the residency the four round-3 designs needed.
S2_HEAD_BLOCK = 4
#: software-pipeline the head/q-tile loop: issue step i+1's score
#: matmul (MXU) before step i's softmax (VPU) so the independent units
#: overlap — the round-4b structural roofline puts the kernel's
#: serialized MXU+VPU sum exactly at its measured 25.6 ms/block, with
#: ~10 ms/block reclaimable by overlap.  MEASURED: at bq=128 the
#: pipeline wins 37.3 -> 25.8 ms/block standalone; default ON.
S2_SW_PIPELINE = True
#: score-matmul lookahead distance (resident (bq, N) f32 tiles =
#: depth+1; 0.5 MB each at bq=128).  MEASURED standalone one-block:
#: depth 1/2/3 = 25.95/29.23/34.65 ms — deeper lookahead loses to
#: register/VMEM pressure; 1 is optimal.
S2_PIPELINE_DEPTH = 1


def _fb_s2_kernel(
    x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, ab_hbm, o_ref,
    ab_ref, dma_sem, *,
    scale: float, hd: int, hb: int, eps: float, block_q: int,
    head_batched: bool,
):
    N, C = x_ref.shape[1], x_ref.shape[2]
    hc = pl.program_id(0)

    # Manual single-buffered bias residency: the (hb, N, N) bf16 chunk is
    # 8.4 MB at stage-2 shapes — a regular input block would be DOUBLE-
    # buffered by the pipeline (16.8 MB > the 16 MB scoped-VMEM limit, the
    # measured compile-crash mode).  Bias stays in HBM (ANY) and is DMA'd
    # into one VMEM scratch only when the head chunk changes (once per W
    # inner iterations).
    @pl.when(pl.program_id(1) == 0)
    def _load_bias():
        cp = pltpu.make_async_copy(
            ab_hbm.at[pl.dslice(hc * hb, hb)], ab_ref, dma_sem
        )
        cp.start()
        cp.wait()

    x = x_ref[0]

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ls_ref[0].astype(jnp.float32)
        + lb_ref[0].astype(jnp.float32)
    ).astype(x.dtype)

    qkv = (
        jax.lax.dot_general(
            ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bqkv_ref[0]
    )  # (N, hb*3hd)

    nq = N // block_q
    if head_batched:
        q = jnp.stack(
            [qkv[:, h * 3 * hd : h * 3 * hd + hd] for h in range(hb)]
        )
        k = jnp.stack(
            [
                qkv[:, h * 3 * hd + hd : h * 3 * hd + 2 * hd]
                for h in range(hb)
            ]
        )
        v = jnp.stack(
            [
                qkv[:, h * 3 * hd + 2 * hd : h * 3 * hd + 3 * hd]
                for h in range(hb)
            ]
        )
        for qt in range(nq):
            rows = slice(qt * block_q, (qt + 1) * block_q)
            s = jax.lax.dot_general(
                q[:, rows], k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (hb, bq, N)
            s = s * scale + ab_ref[:, rows].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (hb, bq, hd)
            o_ref[0, rows, :] = jnp.concatenate(
                [o[h] for h in range(hb)], axis=-1
            ).astype(o_ref.dtype)
    elif S2_SW_PIPELINE:
        # software pipeline: issue step i+D's score matmul before step
        # i's softmax so the MXU fills while the VPU normalizes.
        steps = [(h, qt) for h in range(hb) for qt in range(nq)]
        depth = min(S2_PIPELINE_DEPTH, len(steps) - 1)

        def score(i):
            h, qt = steps[i]
            c0 = h * 3 * hd
            rows = slice(qt * block_q, (qt + 1) * block_q)
            s = jax.lax.dot_general(
                qkv[rows, c0 : c0 + hd],
                qkv[:, c0 + hd : c0 + 2 * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return s * scale + ab_ref[h, rows].astype(jnp.float32)

        pending = [score(i) for i in range(depth)]
        for i, (h, qt) in enumerate(steps):
            if i + depth < len(steps):
                pending.append(score(i + depth))
            s_cur = pending.pop(0)
            rows = slice(qt * block_q, (qt + 1) * block_q)
            m = jnp.max(s_cur, axis=-1, keepdims=True)
            p = jnp.exp(s_cur - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            c0 = h * 3 * hd
            v = qkv[:, c0 + 2 * hd : c0 + 3 * hd]
            o_ref[0, rows, h * hd : (h + 1) * hd] = jnp.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
    else:
        for h in range(hb):
            c0 = h * 3 * hd
            q = qkv[:, c0 : c0 + hd]
            k = qkv[:, c0 + hd : c0 + 2 * hd]
            v = qkv[:, c0 + 2 * hd : c0 + 3 * hd]
            for qt in range(nq):
                rows = slice(qt * block_q, (qt + 1) * block_q)
                s = jax.lax.dot_general(
                    q[rows], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (bq, N)
                s = s * scale + ab_ref[h, rows].astype(jnp.float32)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o_ref[0, rows, h * hd : (h + 1) * hd] = jnp.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)


def _fb_s2_pallas(
    x, ln_scale, ln_bias, w_qkv, b_qkv, bias, scale, num_heads, eps,
    head_block=None, block_q=None, head_batched=None, interpret=False,
):
    W, N, C = x.shape
    D3 = w_qkv.shape[1]
    D = D3 // 3
    hd = D // num_heads
    hb = select_head_block(num_heads, hd, head_block or S2_HEAD_BLOCK)
    # The bq optimum depends on the loop schedule: 128 for the pipelined
    # path (short interleavable MXU/VPU chains) but 512 for the serial
    # fallback (213.2 vs 208.7 panos/s at bq=256, tools/exp_r4_s2noproj)
    # — so the default derives from S2_SW_PIPELINE rather than silently
    # pairing the fallback with the pipeline's tile size.
    if block_q is None:
        block_q = S2_BLOCK_Q if S2_SW_PIPELINE else S2_SERIAL_BLOCK_Q
    block_q = min(block_q, N)
    while N % block_q:
        block_q //= 2
    if head_batched is None:
        head_batched = S2_HEAD_BATCHED
    dt = x.dtype
    n_chunks = num_heads // hb
    cw = 3 * hd * hb
    args = (
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w_qkv.astype(dt),
        b_qkv.reshape(1, D3).astype(dt),
        bias.astype(dt),
    )
    const = lambda hc, w: (0, 0)
    return pl.pallas_call(
        functools.partial(
            _fb_s2_kernel, scale=scale, hd=hd, hb=hb, eps=eps,
            block_q=block_q, head_batched=head_batched,
        ),
        out_shape=jax.ShapeDtypeStruct((W, N, D), dt),
        grid=(n_chunks, W),
        in_specs=[
            pl.BlockSpec(
                (1, N, C), lambda hc, w: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, cw), lambda hc, w: (0, hc), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, cw), lambda hc, w: (0, hc), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, N, hb * hd), lambda hc, w: (w, 0, hc),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, N, N), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(*args)


def _fb_s2_xla(
    x, ln_scale, ln_bias, w_qkv, b_qkv, bias, scale, num_heads, eps,
    attn_fn=None,
):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
        + ln_bias.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = (
        jnp.einsum(
            "wnc,ck->wnk", ln, w_qkv.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + b_qkv.astype(x.dtype)
    )
    if attn_fn is None:
        return _attention_qkv_fused_xla(qkv, bias, scale, num_heads)
    return attn_fn(qkv, bias, scale, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_block_attention_noproj(
    x, ln_scale, ln_bias, w_qkv, b_qkv, bias,
    scale: float, num_heads: int, eps: float = 1e-5,
):
    """attention(qkv(LN(x))) for independent windows — the stage-2
    no-proj fused block.  Returns the pre-projection (W, N, D) attention
    output; the caller runs the out-projection (so quantized proj sites
    and the hybrid training path stay untouched).

    Same parameter conventions as fused_block_attention, minus w_proj /
    b_proj.
    """
    return jax.lax.platform_dependent(
        x, ln_scale, ln_bias, w_qkv, b_qkv, bias,
        cpu=functools.partial(
            _fb_s2_xla, scale=scale, num_heads=num_heads, eps=eps
        ),
        default=functools.partial(
            _fb_s2_pallas, scale=scale, num_heads=num_heads, eps=eps
        ),
    )


def _fb_s2_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, bias, scale,
               num_heads, eps):
    return (
        fused_block_attention_noproj(
            x, ln_scale, ln_bias, w_qkv, b_qkv, bias, scale, num_heads,
            eps,
        ),
        (x, ln_scale, ln_bias, w_qkv, b_qkv, bias),
    )


def _fb_s2_bwd_vjp(scale, num_heads, eps, res, g):
    # Recompute through window_attention_qkv_xla: the XLA forward trace
    # (measured-best at stage-2 shapes) differentiates the LN/qkv GEMMs
    # as plain XLA while the attention middle gets the Pallas q-tiled
    # backward — identical to the hybrid training path this op replaces.
    _, vjp = jax.vjp(
        lambda *a: _fb_s2_xla(
            *a, scale, num_heads, eps, attn_fn=window_attention_qkv_xla
        ),
        *res,
    )
    return vjp(g)


def _fb_s2_bwd(scale, num_heads, eps, res, g):
    if not HANDROLLED_FB_BWD:
        return _fb_s2_bwd_vjp(scale, num_heads, eps, res, g)
    # Hand-rolled (round 5): no-proj means the attention output is NOT a
    # residual of anything — the vjp form's recompute of the XLA
    # attention forward (scores+softmax+probs@v at N=1024) is pure
    # waste.  Recompute only the LN+qkv prefix and call the attention
    # cotangent rule (_qkv_bwd: the Pallas merged backward on TPU)
    # directly — identical numerics, strictly fewer ops.
    x, ln_scale, ln_bias, w_qkv, b_qkv, bias = res
    qkv, prefix_vjp = jax.vjp(
        functools.partial(_ln_qkv_prefix, eps=eps),
        x, ln_scale, ln_bias, w_qkv, b_qkv,
    )
    dqkv, dbias = _qkv_bwd(scale, num_heads, (qkv, bias), g)
    dx, dls, dlb, dw_qkv, db_qkv = prefix_vjp(dqkv)
    return dx, dls, dlb, dw_qkv, db_qkv, dbias


fused_block_attention_noproj.defvjp(_fb_s2_fwd, _fb_s2_bwd)


# ---------------------------------------------------------------------------
# Merged large-N backward (round 4, follow-up): K1+K2 recompute the same
# (BQ, N) score/prob tiles — one pass can emit dq/dk/dv AND d_bias if the
# d_bias output block is indexed by head only: with grid (H, W, QT) it
# stays resident across the whole (w, qt) inner sweep of its head and
# accumulates via pl.when, while dk/dv accumulate across qt exactly as in
# K1.  Halves the recompute matmul FLOPs and the q/k/v/g HBM refetches of
# the two-kernel design.
# ---------------------------------------------------------------------------

#: route _attention_qkv_bwd_large through the merged one-pass kernel.
#: MEASURED e2e train step (v5e, B=16, 12,647-cell SuperGuessr, 2x each,
#: tools/exp_r4_bwdmerge.py): merged 597.4 ms = **26.8 panos/s** (8.8%
#: train MFU) vs two-kernel 619.7-620.1 ms = 25.8 (8.5%), bit-identical
#: losses.  Default ON.
BWD_MERGED = True


def _bwd_merged_kernel(q_ref, k_ref, v_ref, b_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, db_ref, *, scale: float):
    w = pl.program_id(1)
    qt = pl.program_id(2)
    dq, dk, dv, ds = _bwd_tile_math(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
        b_ref[0].astype(jnp.float32), g_ref[0, 0], scale,
    )
    dq_ref[0, 0] = dq

    @pl.when(qt == 0)
    def _init_kv():
        dk_ref[0, 0] = dk
        dv_ref[0, 0] = dv

    @pl.when(qt != 0)
    def _accum_kv():
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv

    rows = pl.dslice(qt * ds.shape[0], ds.shape[0])

    @pl.when(w == 0)
    def _init_db():
        db_ref[0, rows] = ds

    @pl.when(w != 0)
    def _accum_db():
        db_ref[0, rows] += ds


#: q-tile rows for the MERGED large-N backward.  MEASURED e2e train
#: B=16 (tools/exp_r4_vmem.py): BQ=512 = 427.7 ms = 37.4 panos/s vs
#: BQ=256 = 444.3 ms = 36.0 (+3.8%) — halves the per-head k/v refetch
#: rounds; needs the raised per-kernel VMEM limit below (d_bias (N, N)
#: f32 residency + (BQ, N) stacks exceed the 16 MB default).
_BWD_MERGED_BLOCK_Q = 512
#: per-kernel Mosaic VMEM limit for the merged backward; a per-kernel
#: raise transits the relay (probe_v64), unlike XLA_FLAGS.
_BWD_MERGED_VMEM = 64 * 1024 * 1024


def _attention_bwd_merged_pallas(
    q, k, v, bias, g, scale, block_q=None, interpret=False
):
    """One-pass (dq, dk, dv, d_bias) for large N; see module note."""
    W, H, N, hd = q.shape
    BQ = min(block_q or _BWD_MERGED_BLOCK_Q, N)
    while N % BQ:
        BQ //= 2
    QT = N // BQ
    bias_in = bias.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_merged_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
            jax.ShapeDtypeStruct((W, H, N, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        ],
        grid=(H, W, QT),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ, N), lambda h, w, qt: (h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, BQ, hd), lambda h, w, qt: (w, h, qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, N, hd), lambda h, w, qt: (w, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # full-head d_bias block: index constant across (w, qt) so it
            # stays resident for the whole inner sweep of its head
            pl.BlockSpec(
                (1, N, N), lambda h, w, qt: (h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES or _BWD_MERGED_VMEM,
        ),
        interpret=interpret,
    )(q, k, v, bias_in, g)


# ---------------------------------------------------------------------------
# 4D fused-block kernel (round 4b): same math as fused_block_attention,
# but consuming the raw (B, H, W, C) feature map.  The stage-1 call site
# previously materialized window_partition / window_unpartition
# transposes around the kernel (~19 ms of copy fusions at B=512 in the
# round-4b profile: 2 transposes + 4 reshapes over the 805 MB stage-1
# map).  Here the partition IS the BlockSpec: grid (B, H/w, nW/wb) with
# input/output blocks of wb horizontally-consecutive windows
# (1, w, wb*w, C) — the pipeline's strided DMA replaces the transposes.
# LN/qkv run on the block's rows in map order (row-independent ops);
# per-window token vectors are built by in-kernel (w, w, C) -> (N, C)
# reshapes, which are sublane-aligned collapses (w multiple of 8... w=16
# at stage 1).
# ---------------------------------------------------------------------------


def _fb4d_kernel(
    x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ab_ref, o_ref, *, scale: float, hd: int, num_heads: int, eps: float,
    window: int,
):
    _, w, WW, C = x_ref.shape
    wb = WW // w
    N = w * w
    D = num_heads * hd
    x = x_ref[0].reshape(w * WW, C)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (
        xc * jax.lax.rsqrt(var + eps) * ls_ref[0].astype(jnp.float32)
        + lb_ref[0].astype(jnp.float32)
    ).astype(x.dtype)

    qkv = (
        jax.lax.dot_general(
            ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bqkv_ref[0]
    ).reshape(w, WW, 3 * D)

    def slot(s):
        return jnp.stack(
            [
                qkv[
                    :, wi * w : (wi + 1) * w,
                    h * 3 * hd + s * hd : h * 3 * hd + (s + 1) * hd,
                ].reshape(N, hd)
                for wi in range(wb)
                for h in range(num_heads)
            ],
            axis=0,
        )  # (wb*H, N, hd)

    q, k, v = slot(0), slot(1), slot(2)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (wb*H, N, N) f32
    ab = ab_ref[...].astype(jnp.float32)  # (H, N, N)
    s = s * scale + jnp.concatenate([ab] * wb, axis=0)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (wb*H, N, hd)
    o_cat = jnp.concatenate(
        [
            jnp.concatenate(
                [o[wi * num_heads + h] for h in range(num_heads)], axis=-1
            )
            for wi in range(wb)
        ],
        axis=0,
    ).astype(x.dtype)  # (wb*N, D)
    out = (
        jax.lax.dot_general(
            o_cat, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)
    outw = out.reshape(wb, w, w, C)
    for wi in range(wb):
        o_ref[0, :, wi * w : (wi + 1) * w, :] = outw[wi]


def _fb4d_pallas(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale, num_heads, eps, window, block_w=None, interpret=False,
):
    B, H, Wd, C = x.shape
    w = window
    N = w * w
    D = w_proj.shape[0]
    hd = D // num_heads
    nw = Wd // w
    wb = block_w or FUSED_BLOCK_WB
    score_bytes = num_heads * N * N * 4
    wb = max(1, min(wb, FUSED_BLOCK_SCORE_BYTES // score_bytes))
    while nw % wb:
        wb -= 1
    dt = x.dtype
    args = (
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w_qkv.astype(dt),
        b_qkv.reshape(1, 3 * D).astype(dt),
        w_proj.astype(dt),
        b_proj.reshape(1, C).astype(jnp.float32),
        bias.astype(dt),
    )
    const = lambda b, i, j: (0, 0)
    const3 = lambda b, i, j: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(
            _fb4d_kernel, scale=scale, hd=hd, num_heads=num_heads,
            eps=eps, window=w,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Wd, C), dt),
        grid=(B, H // w, nw // wb),
        in_specs=[
            pl.BlockSpec(
                (1, w, wb * w, C), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads, N, N), const3, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, w, wb * w, C), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
        interpret=interpret,
    )(*args)


def _window_partition(x, w):
    B, H, Wd, C = x.shape
    x = x.reshape(B, H // w, w, Wd // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def _window_unpartition(x, w, hw):
    H, Wd = hw
    B = x.shape[0] // ((H // w) * (Wd // w))
    x = x.reshape(B, H // w, Wd // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, Wd, -1)


def _fb4d_xla(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale, num_heads, eps, window, attn_fn=None,
):
    windows = _window_partition(x, window)
    out = _fused_block_xla(
        windows, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
        scale, num_heads, eps, attn_fn=attn_fn,
    )
    return _window_unpartition(out, window, (x.shape[1], x.shape[2]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_block_attention_4d(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
    scale: float, num_heads: int, window: int, eps: float = 1e-5,
):
    """fused_block_attention over the raw (B, H, W, C) map: the window
    partition lives in the BlockSpec index map instead of materialized
    transposes.  Requires H % window == 0 == W % window.  Same parameter
    conventions as fused_block_attention; returns (B, H, W, C)."""
    return jax.lax.platform_dependent(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
        cpu=functools.partial(
            _fb4d_xla, scale=scale, num_heads=num_heads, eps=eps,
            window=window,
        ),
        default=functools.partial(
            _fb4d_pallas, scale=scale, num_heads=num_heads, eps=eps,
            window=window,
        ),
    )


def _fb4d_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
              scale, num_heads, window, eps):
    return (
        fused_block_attention_4d(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias,
            scale, num_heads, window, eps,
        ),
        (x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias),
    )


def _fb4d_bwd(scale, num_heads, window, eps, res, g):
    # Same hybrid recompute as _fb_bwd (XLA GEMMs + Pallas attention
    # backward via window_attention_qkv); the partition transposes
    # differentiate as free XLA reshapes.
    _, vjp = jax.vjp(
        lambda *a: _fb4d_xla(
            *a, scale, num_heads, eps, window,
            attn_fn=window_attention_qkv,
        ),
        *res,
    )
    return vjp(g)


fused_block_attention_4d.defvjp(_fb4d_fwd, _fb4d_bwd)
