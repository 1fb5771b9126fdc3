"""CLIP vision transformer in Flax (ViT-L/14-336 preset).

Re-design of the backbone the reference consumes via HF
``CLIPVisionModel.from_pretrained("openai/clip-vit-large-patch14-336")``
(/root/reference/pretrain/clip_embedder.py, config.py:6).  TPU-first: NHWC
patchify via a single conv, bf16 compute with f32 LayerNorms, quick-GELU as
in CLIP, static 577-token sequence (24x24 patches + CLS) that XLA tiles onto
the MXU.

The reference's embedding convention is the mean over
``last_hidden_state`` tokens (clip_embedder.py:63-66); ``__call__`` returns
both the full token sequence and the pooled (post-LN CLS) output so every
consumer pattern is covered.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    #: Fused Pallas attention (ops/clip_attention): one fused qkv GEMM ->
    #: token-major kernel (k/v resident per (image, head-chunk) cell, f32
    #: scores only in VMEM, native N — no padding/transposes at the
    #: boundary).  Param tree matches nn.MultiHeadDotProductAttention
    #: exactly.  MEASURED (v5e, B=256 e2e, bf16): 368 vs 298 img/s
    #: (+24%), min cosine 0.99990 vs the XLA path — DEFAULT ON.  (CPU
    #: lowers to the XLA einsum via lax.platform_dependent, so tests and
    #: host-side init are unaffected.)  Round-1's simple q-tiled port
    #: (pad-to-640, head-major transposes, per-q-tile k/v refetch)
    #: measured 203 img/s and was replaced by this design.
    pallas_attention: bool = True
    #: Fold the out-projection GEMM into the attention kernel (per-chunk
    #: (cw, D) partial GEMMs accumulated in f32 VMEM scratch — the
    #: (B, N, D) attention output never round-trips HBM).  Measured e2e
    #: before flipping the default.
    pallas_fuse_proj: bool = False
    #: heads per kernel grid cell ((HB, N, N) f32 scores in VMEM).
    #: Measured B=256: hb4 695 ms == hb8 (859 XLA, 713 hb2).
    pallas_head_block: int = 4
    #: int8 GEMM path (ops/quant.py) for the MLP (and, on the Pallas
    #: attention path, the qkv/out projections) — inference-only.
    #: MEASURED (v5e, B=256): LOSES for now — 285 img/s (XLA attn) and
    #: 331 (flash attn) vs 368 bf16 flash: the dynamic per-tensor
    #: activation abs-max adds an HBM pass per GEMM that outweighs the
    #: int8 MXU rate.  Opt-in until quantization is fused into producer
    #: epilogues (docs/performance.md).
    quantize_gemms: bool = False

    @staticmethod
    def vit_l_14_336(**overrides) -> "CLIPVisionConfig":
        return CLIPVisionConfig(**overrides)

    @staticmethod
    def vit_b_32_224(**overrides) -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=224,
            patch_size=32,
            hidden_size=768,
            num_layers=12,
            num_heads=12,
            mlp_dim=3072,
            **overrides,
        )

    @staticmethod
    def test_tiny(**overrides) -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=56,
            patch_size=14,
            hidden_size=64,
            num_layers=2,
            num_heads=2,
            mlp_dim=128,
            **overrides,
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1


class CLIPVisionOutput(NamedTuple):
    last_hidden_state: jax.Array  # (B, 1+P, D)
    pooler_output: jax.Array  # (B, D) post-LN CLS token


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _ProjParams(nn.Module):
    """Param holder with nn.DenseGeneral's tree layout (kernel + bias) so
    the fused-qkv path shares checkpoints with the stock MHA module.

    Init matches DenseGeneral exactly: the initializer runs on the
    COLLAPSED 2D (fan_in, fan_out) shape and is reshaped — so a fresh
    init is bit-identical to the stock MHA path (n_in_axes leading dims
    are fan-in, the rest fan-out)."""

    kernel_shape: tuple
    bias_shape: tuple
    n_in_axes: int = 1

    @nn.compact
    def __call__(self):
        def kernel_init(rng, shape, dtype):
            import numpy as _np

            fan_in = int(_np.prod(shape[: self.n_in_axes]))
            fan_out = int(_np.prod(shape[self.n_in_axes :]))
            flat = nn.initializers.lecun_normal()(
                rng, (fan_in, fan_out), dtype
            )
            return flat.reshape(shape)

        kernel = self.param(
            "kernel", kernel_init, self.kernel_shape, jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, self.bias_shape, jnp.float32
        )
        return kernel, bias


class _PallasSelfAttention(nn.Module):
    """Self-attention with nn.MultiHeadDotProductAttention's exact param
    tree (query/key/value/out DenseGeneral) but the score/softmax/value
    contraction running in the fused Pallas kernel (ops/clip_attention.py):
    ONE fused qkv GEMM emits the token-major (B, N, 3D) tensor the kernel
    consumes directly — no head-axis transposes or sequence padding at the
    boundary (the measured failure mode of the round-1 q-tiled port,
    docs/performance.md) — and the (HB, N, N) f32 score tile lives only in
    VMEM instead of round-tripping a (B, H, N, N) f32 tensor through HBM
    (the measured 37%-MFU gap of the XLA attention stack)."""

    num_heads: int
    dtype: Any
    head_block: int = 2
    quantize: bool = False
    fuse_proj: bool = False

    @nn.compact
    def __call__(self, x):
        from geoguessr_ai_tpu.ops.clip_attention import (
            clip_attention,
            clip_attention_proj,
        )

        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        qk, qb = _ProjParams((D, H, hd), (H, hd), name="query")()
        kk, kb = _ProjParams((D, H, hd), (H, hd), name="key")()
        vk, vb = _ProjParams((D, H, hd), (H, hd), name="value")()
        ok, ob = _ProjParams((H, hd, D), (D,), n_in_axes=2, name="out")()

        # (D, H, hd) -> (D, D) flattens (h, d) -> h*hd + d: exactly the
        # kernel's channel convention.
        w_qkv = jnp.concatenate(
            [qk.reshape(D, D), kk.reshape(D, D), vk.reshape(D, D)], axis=1
        ).astype(self.dtype)
        b_qkv = jnp.concatenate(
            [qb.reshape(D), kb.reshape(D), vb.reshape(D)]
        ).astype(self.dtype)
        if self.quantize:
            from geoguessr_ai_tpu.ops.quant import int8_einsum_nc_cd

            qkv = int8_einsum_nc_cd(
                x,
                w_qkv.astype(jnp.float32),
                bias=b_qkv,
                out_dtype=self.dtype,
            )
        else:
            qkv = (
                jnp.einsum(
                    "bnc,ck->bnk", x, w_qkv,
                    preferred_element_type=self.dtype,
                )
                + b_qkv
            )
        if self.fuse_proj and not self.quantize:
            return (
                clip_attention_proj(
                    qkv,
                    ok.reshape(D, D).astype(self.dtype),
                    hd**-0.5,
                    H,
                    self.head_block,
                )
                + ob.astype(self.dtype)
            )
        o = clip_attention(qkv, hd**-0.5, H, self.head_block)  # (B, N, D)
        if self.quantize:
            from geoguessr_ai_tpu.ops.quant import int8_einsum_nc_cd

            return int8_einsum_nc_cd(
                o, ok.reshape(D, D), bias=ob, out_dtype=self.dtype
            )
        return (
            jnp.einsum(
                "bnd,dk->bnk",
                o,
                ok.reshape(D, D).astype(self.dtype),
                preferred_element_type=self.dtype,
            )
            + ob.astype(self.dtype)
        )


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.dtype

        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1"
        )(x.astype(jnp.float32)).astype(dtype)
        if cfg.pallas_attention:
            hb = cfg.pallas_head_block
            while cfg.num_heads % hb:
                hb -= 1
            h = _PallasSelfAttention(
                num_heads=cfg.num_heads,
                dtype=dtype,
                head_block=hb,
                quantize=cfg.quantize_gemms,
                fuse_proj=cfg.pallas_fuse_proj,
                name="self_attn",
            )(h)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads,
                dtype=dtype,
                deterministic=True,
                name="self_attn",
            )(h, h)
        x = x + h

        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2"
        )(x.astype(jnp.float32)).astype(dtype)
        if cfg.quantize_gemms:
            from geoguessr_ai_tpu.ops.quant import int8_einsum_nc_cd

            fc1_k, fc1_b = _ProjParams(
                (cfg.hidden_size, cfg.mlp_dim), (cfg.mlp_dim,),
                name="mlp_fc1",
            )()
            fc2_k, fc2_b = _ProjParams(
                (cfg.mlp_dim, cfg.hidden_size), (cfg.hidden_size,),
                name="mlp_fc2",
            )()
            h = int8_einsum_nc_cd(h, fc1_k, bias=fc1_b, out_dtype=dtype)
            h = quick_gelu(h)
            h = int8_einsum_nc_cd(h, fc2_k, bias=fc2_b, out_dtype=dtype)
        else:
            h = nn.Dense(cfg.mlp_dim, dtype=dtype, name="mlp_fc1")(h)
            h = quick_gelu(h)
            h = nn.Dense(cfg.hidden_size, dtype=dtype, name="mlp_fc2")(h)
        return x + h


class _ConvKernel(nn.Module):
    """Parameter holder with nn.Conv's tree layout ({kernel}) so the
    GEMM patchify shares checkpoints/converters with a plain conv."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class CLIPVisionTower(nn.Module):
    """CLIP image encoder: conv patchify + CLS + learned pos emb + pre-LN
    transformer + final LayerNorm."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> CLIPVisionOutput:
        cfg = self.config
        dtype = cfg.dtype
        B = pixel_values.shape[0]

        # Patchify as an explicit space-to-depth + GEMM: a stride-p VALID
        # pxp conv is exactly a (B, P, p*p*3) @ (p*p*3, D) matmul.
        # Measured e2e-neutral vs nn.Conv on v5e (298 img/s either way —
        # patch embed is ~0.2% of CLIP-L FLOPs, unlike TinyViT's hot 1x1
        # convs where the GEMM lowering was 2x); kept for the simpler
        # lowering.  The parameter keeps the conv kernel tree layout
        # ({patch_embedding: {kernel: (p, p, 3, D)}}) so HF weight
        # conversion (models/torch_convert.py:67) is unchanged.
        p = cfg.patch_size
        grid = cfg.image_size // p
        kernel = _ConvKernel(
            (p, p, 3, cfg.hidden_size), name="patch_embedding"
        )()
        patches = (
            pixel_values.astype(dtype)
            .reshape(B, grid, p, grid, p, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, grid * grid, p * p * 3)
        )
        x = jnp.einsum(
            "bpk,kd->bpd",
            patches,
            kernel.reshape(p * p * 3, cfg.hidden_size).astype(dtype),
        )

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            cls.astype(dtype), (B, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.seq_len, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos[None].astype(dtype)

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm"
        )(x.astype(jnp.float32)).astype(dtype)

        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, name=f"layer{i}")(x)

        last_hidden = x
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            name="post_layernorm",
        )(x[:, 0].astype(jnp.float32))
        return CLIPVisionOutput(
            last_hidden_state=last_hidden, pooler_output=pooled
        )


def clip_mean_token_embedding(out: CLIPVisionOutput) -> jax.Array:
    """The reference's embedding convention: mean over all tokens of the
    last hidden state (clip_embedder.py:63-66)."""
    return jnp.mean(out.last_hidden_state.astype(jnp.float32), axis=1)
