"""CLIP text tower + full contrastive CLIP model in Flax.

Completes the CLIP pair for contrastive geo-pretraining (the reference
fine-tunes HF ``CLIPModel`` with synthetic captions, pretrain_idun.py:
205-299, freezing everything except ``visual_projection`` and
``logit_scale``).  Causal-mask transformer, EOT-token pooling, learned
projections, temperature-scaled symmetric InfoNCE loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoguessr_ai_tpu.models.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionTower,
    quick_gelu,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def vit_l_text(**overrides) -> "CLIPTextConfig":
        return CLIPTextConfig(**overrides)

    @staticmethod
    def test_tiny(**overrides) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=128,
            max_length=16,
            hidden_size=64,
            num_layers=2,
            num_heads=2,
            mlp_dim=128,
            **overrides,
        )


class CLIPTextLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        dtype = cfg.dtype
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1"
        )(x.astype(jnp.float32)).astype(dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads,
            dtype=dtype,
            deterministic=True,
            name="self_attn",
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2"
        )(x.astype(jnp.float32)).astype(dtype)
        h = nn.Dense(cfg.mlp_dim, dtype=dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Causal transformer over BPE token ids; pooled output = EOT token
    (highest token id == end-of-text in CLIP's vocab)."""

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        cfg = self.config
        dtype = cfg.dtype
        B, T = input_ids.shape

        tok = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
            jnp.float32,
        )
        x = tok + pos[None, :T].astype(dtype)

        causal = nn.make_causal_mask(input_ids)
        for i in range(cfg.num_layers):
            x = CLIPTextLayer(cfg, name=f"layer{i}")(x, causal)

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            name="final_layer_norm",
        )(x.astype(jnp.float32))
        # EOT pooling: position of the max token id per sequence.
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return x, pooled


class CLIPOutput(NamedTuple):
    loss: Optional[jax.Array]
    logits_per_image: jax.Array
    logits_per_text: jax.Array
    image_embeds: jax.Array
    text_embeds: jax.Array


class CLIPModel(nn.Module):
    """Vision + text towers with projections and learned logit scale."""

    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig
    projection_dim: int = 768

    @nn.compact
    def __call__(
        self,
        pixel_values: jax.Array,
        input_ids: jax.Array,
        return_loss: bool = True,
    ) -> CLIPOutput:
        vis = CLIPVisionTower(self.vision_config, name="vision_model")(
            pixel_values
        )
        _, text_pooled = CLIPTextTower(self.text_config, name="text_model")(
            input_ids
        )

        image_embeds = nn.Dense(
            self.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            name="visual_projection",
        )(vis.pooler_output)
        text_embeds = nn.Dense(
            self.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            name="text_projection",
        )(text_pooled)

        image_embeds = image_embeds / jnp.linalg.norm(
            image_embeds, axis=-1, keepdims=True
        )
        text_embeds = text_embeds / jnp.linalg.norm(
            text_embeds, axis=-1, keepdims=True
        )

        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(jnp.log(1 / 0.07)),
            (),
            jnp.float32,
        )
        scale = jnp.exp(logit_scale)
        logits_per_text = text_embeds @ image_embeds.T * scale
        logits_per_image = logits_per_text.T

        loss = None
        if return_loss:
            labels = jnp.arange(logits_per_text.shape[0])
            li = -jnp.mean(
                jnp.take_along_axis(
                    jax.nn.log_softmax(logits_per_image, axis=-1),
                    labels[:, None],
                    axis=-1,
                )
            )
            lt = -jnp.mean(
                jnp.take_along_axis(
                    jax.nn.log_softmax(logits_per_text, axis=-1),
                    labels[:, None],
                    axis=-1,
                )
            )
            loss = (li + lt) / 2.0
        return CLIPOutput(
            loss=loss,
            logits_per_image=logits_per_image,
            logits_per_text=logits_per_text,
            image_embeds=image_embeds,
            text_embeds=text_embeds,
        )
