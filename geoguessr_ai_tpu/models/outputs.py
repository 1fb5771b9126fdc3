"""Model output container.

JAX-native equivalent of the reference ModelOutput namedtuple
(models/utils.py:12-17) — a NamedTuple of arrays, so it is a pytree and flows
through jit/grad/shard_map unchanged.
"""

from typing import NamedTuple, Optional

import jax


class TopK(NamedTuple):
    """Mirror of torch.topk's (values, indices) pair."""

    values: jax.Array  # (B, k) probabilities
    indices: jax.Array  # (B, k) int32 geocell indices


class ModelOutput(NamedTuple):
    """Forward-pass results (field names match the reference contract)."""

    loss: Optional[jax.Array]  # scalar
    loss_clf: Optional[jax.Array]  # scalar
    preds_LLH: jax.Array  # (B, 2) predicted (lng, lat)
    preds_geocell: jax.Array  # (B,) int32 argmax cell
    top5_geocells: TopK  # top-k candidates
    embedding: jax.Array  # (B, C) or (B, V, C) view embeddings
