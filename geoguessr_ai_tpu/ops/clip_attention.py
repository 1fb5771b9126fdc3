"""Fused self-attention for the CLIP tower, as a Pallas TPU kernel.

Round-1 measurements (docs/performance.md) located the CLIP-L/14-336 gap:
the MLP stack runs at ~91% MFU but the attention stack at ~37%, dominated
by the (B, H, N, N) f32 score/prob tensors round-tripping HBM and by
layout transposes around the head axis.  A first q-tiled port (pad-to-640
+ head-major transposes + per-q-tile k/v refetch over a (16, 5, 256)
grid) measured 203 vs 298 img/s e2e — the boundary cost more than the
kernel saved.

This kernel fixes both failure modes:

* **Token-major fused-qkv input** (B, N, 3D) — exactly what one fused
  projection GEMM emits; no transposes or padding at the boundary.
  Channel layout is the flax DenseGeneral convention: q = [0, D),
  k = [D, 2D), v = [2D, 3D), head h at columns [h*hd, (h+1)*hd).
* **One grid cell per (image, head-chunk)** — k/v for the chunk are
  fetched once and stay in VMEM for the whole N x N attention; the f32
  score tile never exists in HBM.  Heads are processed HEAD_BLOCK at a
  time through batched dot_general (one batch dim, per Mosaic's matmul
  constraint), sized so the f32 score block stays under the VMEM budget:
  HEAD_BLOCK=2 at N=577 is 2*577^2*4 = 2.7 MB.
* **Native N** — no sequence padding: Mosaic pads partial tiles with
  zeros internally, which is exact here (zero-padded contraction depth
  adds nothing; lane-masked reductions ignore pad lanes).

Reference behavior: HF CLIPVisionModel self-attention
(/root/reference/pretrain/clip_embedder.py via transformers); numerics
validated against the XLA path in tests/test_clip_attention.py.

Training uses a custom VJP whose backward recomputes attention with
plain XLA ops (forward stays on the fast path; backward correctness
over speed — pretraining freezes the vision tower anyway, reference
pretrain_idun.py:220-239).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: heads per grid cell; f32 scores are (HEAD_BLOCK, N, N).
HEAD_BLOCK = 2
#: images per grid cell (benchmarks sweep this; scores scale with it).
IMG_BLOCK = 1
#: grid dimension semantics for the pallas_call.
DIMENSION_SEMANTICS = ("arbitrary", "arbitrary")
#: software-pipeline the (image, head) loop: issue unit u+1's score
#: matmul before unit u's softmax so MXU and VPU overlap (the round-4b
#: stage-2 lever applied to CLIP).
CLIP_SW_PIPELINE = False


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hd: int):
    # Blocks arrive channel-sliced per head-chunk by the BlockSpec index
    # maps (static DMA slices — no dynamic lane indexing in-kernel).
    # IB images x HB heads stack into ONE batched dot (Mosaic allows one
    # matmul batch dim) so each MXU dispatch carries more work.
    IB = q_ref.shape[0]

    if CLIP_SW_PIPELINE:
        hb = q_ref.shape[-1] // hd
        units = [(i, h) for i in range(IB) for h in range(hb)]

        def score(u):
            i, h = units[u]
            cols = slice(h * hd, (h + 1) * hd)
            return (
                jax.lax.dot_general(
                    q_ref[i, :, cols], k_ref[i, :, cols],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # (N, N) f32

        s_cur = score(0)
        for u, (i, h) in enumerate(units):
            s_nxt = score(u + 1) if u + 1 < len(units) else None
            m = jnp.max(s_cur, axis=-1, keepdims=True)
            p = jnp.exp(s_cur - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            cols = slice(h * hd, (h + 1) * hd)
            v = v_ref[i, :, cols]
            o_ref[i, :, cols] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            s_cur = s_nxt
        return

    def heads(ref):
        hb = ref.shape[-1] // hd
        return jnp.stack(
            [
                ref[i, :, h * hd : (h + 1) * hd]
                for i in range(IB)
                for h in range(hb)
            ],
            axis=0,
        )  # (IB*HB, N, hd)

    q = heads(q_ref)
    k = heads(k_ref)
    v = heads(v_ref)

    s = jax.lax.dot_general(
        q,
        k,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (IB*HB, N, N) f32 — lives only in VMEM
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (IB*HB, N, hd)
    hb = o.shape[0] // IB
    for i in range(IB):
        for h in range(hb):
            o_ref[i, :, h * hd : (h + 1) * hd] = o[i * hb + h].astype(
                o_ref.dtype
            )


def _flash_pallas(
    qkv, scale, num_heads, head_block, img_block=None, interpret=False
):
    B, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    cw = head_block * hd  # channel width per chunk
    n_chunks = num_heads // head_block
    if img_block is None:
        img_block = IMG_BLOCK
    while B % img_block:
        img_block -= 1
    # q/k/v are channel-block views of the SAME fused qkv array: chunk hc
    # of q sits at channel block hc, of k at n_chunks + hc, etc.
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid=(B // img_block, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc: (b, 0, hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc, _n=n_chunks: (b, 0, _n + hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc, _n=n_chunks: (b, 0, 2 * _n + hc),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (img_block, N, cw),
            lambda b, hc: (b, 0, hc),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=DIMENSION_SEMANTICS,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _flash_proj_kernel(
    q_ref, k_ref, v_ref, w_ref, o_ref, acc_ref, *,
    scale: float, hd: int, n_chunks: int,
):
    """Attention for one head-chunk PLUS its slice of the out-projection.

    Each (image, head-chunk) cell computes o_chunk (N, cw) like
    _flash_kernel, then immediately contracts it with the chunk's rows of
    the out-projection weight ((cw, D) resident in VMEM) and accumulates
    the f32 partial sum in scratch — the (B, N, D) attention output never
    exists in HBM and the out-proj GEMM rides the same dispatch.  The
    accumulator is written out on the LAST chunk (TPU grid is sequential;
    the chunk axis is innermost)."""
    IB = q_ref.shape[0]
    hc = pl.program_id(1)

    def heads(ref):
        hb = ref.shape[-1] // hd
        return jnp.stack(
            [
                ref[i, :, h * hd : (h + 1) * hd]
                for i in range(IB)
                for h in range(hb)
            ],
            axis=0,
        )

    q = heads(q_ref)
    k = heads(k_ref)
    v = heads(v_ref)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (IB*HB, N, hd)
    hb = o.shape[0] // IB
    w = w_ref[...]  # (cw, D)
    for i in range(IB):
        o_chunk = jnp.concatenate(
            [o[i * hb + h] for h in range(hb)], axis=-1
        ).astype(w.dtype)  # (N, cw)
        partial = jax.lax.dot_general(
            o_chunk, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, D)

        @pl.when(hc == 0)
        def _init():
            acc_ref[i] = partial

        @pl.when(hc != 0)
        def _acc():
            acc_ref[i] = acc_ref[i] + partial

    @pl.when(hc == n_chunks - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _flash_proj_pallas(
    qkv, w_proj, scale, num_heads, head_block, img_block=None,
    interpret=False,
):
    B, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    cw = head_block * hd
    n_chunks = num_heads // head_block
    if img_block is None:
        img_block = IMG_BLOCK
    while B % img_block:
        img_block -= 1
    return pl.pallas_call(
        functools.partial(
            _flash_proj_kernel, scale=scale, hd=hd, n_chunks=n_chunks
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid=(B // img_block, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc: (b, 0, hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc, _n=n_chunks: (b, 0, _n + hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (img_block, N, cw),
                lambda b, hc, _n=n_chunks: (b, 0, 2 * _n + hc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cw, D), lambda b, hc: (hc, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (img_block, N, D), lambda b, hc: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((img_block, N, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=DIMENSION_SEMANTICS,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, w_proj)


def _flash_proj_xla(qkv, w_proj, scale, num_heads):
    o = _flash_xla(qkv, scale, num_heads)
    return jax.lax.dot_general(
        o, w_proj.astype(o.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=o.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def clip_attention_proj(
    qkv, w_proj, scale: float, num_heads: int, head_block: int = HEAD_BLOCK
):
    """Fused softmax(q k^T * scale) v @ W_out (out-proj folded into the
    kernel; bias/residual stay outside).  Args as clip_attention plus
    w_proj (D, D) with rows in the kernel's h*hd+d channel order."""
    return jax.lax.platform_dependent(
        qkv,
        w_proj,
        cpu=functools.partial(
            _flash_proj_xla, scale=scale, num_heads=num_heads
        ),
        default=functools.partial(
            _flash_proj_pallas,
            scale=scale,
            num_heads=num_heads,
            head_block=head_block,
        ),
    )


def _proj_fwd(qkv, w_proj, scale, num_heads, head_block):
    return (
        clip_attention_proj(qkv, w_proj, scale, num_heads, head_block),
        (qkv, w_proj),
    )


def _proj_bwd(scale, num_heads, head_block, res, g):
    qkv, w_proj = res
    _, vjp = jax.vjp(
        lambda t, w: _flash_proj_xla(t, w, scale, num_heads), qkv, w_proj
    )
    return vjp(g)


clip_attention_proj.defvjp(_proj_fwd, _proj_bwd)


def _flash_xla(qkv, scale, num_heads):
    B, N, D3 = qkv.shape
    D = D3 // 3
    hd = D // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, num_heads, hd)
    k = k.reshape(B, N, num_heads, hd)
    v = v.reshape(B, N, num_heads, hd)
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return o.reshape(B, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def clip_attention(
    qkv, scale: float, num_heads: int, head_block: int = HEAD_BLOCK
):
    """softmax(q k^T * scale) v over a fused token-major qkv tensor.

    Args:
      qkv: (B, N, 3D) — channel layout [q | k | v], head h of each at
        columns [h*hd, (h+1)*hd).
      scale: score scale (1/sqrt(hd)).
      num_heads: H; D = qkv.shape[-1] // 3 must divide by it.
      head_block: heads per grid cell (must divide num_heads).

    Returns: (B, N, D) attention output in qkv.dtype.
    """
    return jax.lax.platform_dependent(
        qkv,
        cpu=functools.partial(_flash_xla, scale=scale, num_heads=num_heads),
        default=functools.partial(
            _flash_pallas,
            scale=scale,
            num_heads=num_heads,
            head_block=head_block,
        ),
    )


def _fwd(qkv, scale, num_heads, head_block):
    return clip_attention(qkv, scale, num_heads, head_block), qkv


def _bwd(scale, num_heads, head_block, qkv, g):
    _, vjp = jax.vjp(
        lambda t: _flash_xla(t, scale, num_heads), qkv
    )
    return vjp(g)


clip_attention.defvjp(_fwd, _bwd)
