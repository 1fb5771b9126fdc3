"""SuperGuessr: geocell classification head over a vision backbone.

TPU-first re-design of the reference model (/root/reference/models/
super_guessr.py).  Differences from the reference that are architectural,
not behavioral:

  * The module holds parameters only (backbone + fusion + cell layer) and
    returns embeddings/logits; prediction decoding and losses are pure
    functions taking the centroid table as an explicit array.  This keeps
    the jitted train step functional and lets the same params serve train,
    eval and serving without the reference's `serving`/`training` branches.
  * The centroid table is loaded once from the .npz artifact
    (geocells/manager.py) instead of unpickling 112 country files in
    __init__ (reference super_guessr.py:72-83).
  * Panorama view folding (B, V, H, W, C) -> (B*V, ...) is a free reshape
    feeding one large batched backbone call — the MXU-friendly layout.

Behavioral contract preserved (reference line refs in the functions below):
view-mean or hierarchical attention fusion, linear cell layer, argmax ->
centroid (lng, lat) decode, top-k candidates, haversine-smoothed soft CE or
hard CE.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoguessr_ai_tpu.config import NUM_ATTENTION_HEADS, NUM_CANDIDATES
from geoguessr_ai_tpu.geo import haversine_matrix, smooth_labels
from geoguessr_ai_tpu.models.outputs import ModelOutput, TopK
from geoguessr_ai_tpu.models.positional import PositionalEncoder


class SuperGuessr(nn.Module):
    """Backbone + view fusion + geocell linear layer.

    Attributes:
      backbone: a Flax module mapping (N, H, W, C) -> (N, D) pooled
        embeddings (e.g. models.tinyvit.TinyViT), or None to run directly on
        precomputed embeddings (reference base_model=None mode).
      num_cells: size of the geocell classifier.
      panorama: whether inputs carry a 4-view axis.
      hierarchical: fuse views with PE + self-attention instead of mean
        (reference super_guessr.py:89-99, :340-345).
    """

    num_cells: int
    backbone: Optional[nn.Module] = None
    panorama: bool = True
    hierarchical: bool = False
    embed_dim: int = 576
    num_attention_heads: int = NUM_ATTENTION_HEADS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        pixel_values: Optional[jax.Array] = None,
        embedding: Optional[jax.Array] = None,
        train: bool = False,
        view_mask: Optional[jax.Array] = None,
    ):
        """Returns (embedding, logits).

        Args:
          pixel_values: (B, V, H, W, C) if panorama else (B, H, W, C),
            NHWC float.
          embedding: (B, V, D) / (B, D) precomputed embeddings when
            backbone is None.
          train: enables backbone BN updates / dropout.
          view_mask: optional (B, V) 1/0 mask of real panorama views —
            padded/failed views are excluded from fusion instead of
            averaging black frames in (the reference pads with zero
            images and averages them, LocalGeoMapDataset :107-128; the
            mask is strictly better and optional for parity).

        Returns:
          embedding: (B, V, D) per-view (panorama) or (B, D).
          logits: (B, num_cells) float32.
        """
        if self.backbone is not None:
            assert pixel_values is not None, (
                "pixel_values must be supplied when a backbone is present"
            )
            if self.panorama:
                B, V = pixel_values.shape[:2]
                flat = pixel_values.reshape((B * V,) + pixel_values.shape[2:])
                emb = self.backbone(flat, train=train)
                embedding = emb.reshape(B, V, -1)
            else:
                embedding = self.backbone(pixel_values, train=train)
        else:
            assert embedding is not None, (
                "embedding must be supplied when backbone is None"
            )

        if self.panorama:
            emb_f32 = embedding.astype(jnp.float32)
            if view_mask is not None:
                emb_f32 = emb_f32 * view_mask.astype(jnp.float32)[..., None]
            if self.hierarchical:
                x = PositionalEncoder(self.embed_dim, name="pos_encoder")(
                    emb_f32,
                    deterministic=not train,
                )
                attn_mask = None
                if view_mask is not None:
                    # keys of padded views are masked out for every query
                    m = view_mask.astype(bool)
                    attn_mask = m[:, None, None, :] & jnp.ones(
                        (1, 1, m.shape[1], 1), bool
                    )
                x = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_attention_heads,
                    dropout_rate=0.1,
                    deterministic=not train,
                    dtype=self.dtype,
                    name="self_attn",
                )(x.astype(self.dtype), x.astype(self.dtype), mask=attn_mask)
                x = x.astype(jnp.float32)
                if view_mask is not None:
                    # view 0 may itself be padding — pool the attention
                    # outputs of real views instead of blindly taking
                    # token 0 (the reference's x[:, 0], :344-345)
                    m = view_mask.astype(jnp.float32)
                    denom = jnp.clip(jnp.sum(m, axis=1), 1.0, None)
                    fused = jnp.sum(x * m[..., None], axis=1) / denom[:, None]
                else:
                    fused = x[:, 0]
            elif view_mask is not None:
                denom = jnp.clip(
                    jnp.sum(view_mask.astype(jnp.float32), axis=1), 1.0, None
                )
                fused = jnp.sum(emb_f32, axis=1) / denom[:, None]
            else:
                fused = jnp.mean(emb_f32, axis=1)
        else:
            fused = embedding.astype(jnp.float32)

        logits = nn.Dense(
            self.num_cells, dtype=jnp.float32, name="cell_layer"
        )(fused)
        return embedding, logits


# ---------------------------------------------------------------------------
# Pure decode / loss functions
# ---------------------------------------------------------------------------


def decode_predictions(
    logits: jax.Array,
    centroids: jax.Array,
    num_candidates: int = NUM_CANDIDATES,
):
    """argmax -> centroid (lng, lat) + top-k candidates.

    Reference behavior: super_guessr.py:354-365.

    Args:
      logits: (B, num_cells).
      centroids: (num_cells, 2) float32 (lng, lat).

    Returns:
      (geocell_probs, preds_geocell, preds_LLH, topk)
    """
    probs = jax.nn.softmax(logits, axis=-1)
    preds = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    pred_lnglat = jnp.take(centroids, preds, axis=0)
    top_vals, top_idx = jax.lax.top_k(probs, num_candidates)
    return probs, preds, pred_lnglat, TopK(top_vals, top_idx.astype(jnp.int32))


def smoothed_soft_ce(
    logits: jax.Array, coords_lnglat: jax.Array, centroids: jax.Array
) -> jax.Array:
    """Haversine-smoothed soft cross-entropy.

    targets = normalize(exp(-(d - d_min)/65km)) over geocell centroids,
    loss = mean over batch of -sum(targets * log_softmax(logits)).
    Reference behavior: super_guessr.py:372-380 + models/utils.py:20-32.

    Args:
      logits: (B, num_cells).
      coords_lnglat: (B, 2) ground-truth (lng, lat) degrees.
      centroids: (num_cells, 2).
    """
    distances = haversine_matrix(coords_lnglat, centroids)
    soft = smooth_labels(distances)
    soft = soft / jnp.clip(
        jnp.sum(soft, axis=-1, keepdims=True), 1e-12, None
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft * log_probs, axis=-1))


def hard_ce(logits: jax.Array, labels_clf: jax.Array) -> jax.Array:
    """Standard CE on geocell indices (reference super_guessr.py:383)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        log_probs, labels_clf[:, None].astype(jnp.int32), axis=-1
    )
    return -jnp.mean(picked)


def forward(
    model: SuperGuessr,
    variables,
    centroids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    embedding: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    labels_clf: Optional[jax.Array] = None,
    should_smooth_labels: bool = True,
    num_candidates: int = NUM_CANDIDATES,
    train: bool = False,
    rngs=None,
    mutable=False,
):
    """Full reference-forward semantics returning a ModelOutput.

    Mirrors SuperGuessr.forward (super_guessr.py:268-395): backbone -> fusion
    -> logits -> decode, plus smoothed/hard CE when labels are given.  Pure
    function of (variables, inputs) — jit/pmap/pjit friendly.
    """
    out = model.apply(
        variables,
        pixel_values=pixel_values,
        embedding=embedding,
        train=train,
        rngs=rngs,
        mutable=mutable,
    )
    new_state = None
    if mutable:
        (embedding_out, logits), new_state = out
    else:
        embedding_out, logits = out

    _, preds, pred_lnglat, topk = decode_predictions(
        logits, centroids, num_candidates
    )

    loss = None
    if should_smooth_labels and labels is not None:
        loss = smoothed_soft_ce(logits, labels, centroids)
    elif labels_clf is not None:
        loss = hard_ce(logits, labels_clf)

    result = ModelOutput(
        loss=loss,
        loss_clf=loss,
        preds_LLH=pred_lnglat,
        preds_geocell=preds,
        top5_geocells=topk,
        embedding=embedding_out,
    )
    return (result, new_state) if mutable else result
