"""Sinusoidal positional encoding.

Reference behavior: models/layers/positional_encoder.py — standard
transformer sin/cos table added residually, followed by dropout.  Here the
table is computed on the fly (it is tiny: up to max_len x d_model) and closed
over by jit, instead of being stored as a frozen torch Parameter.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32):
    """(max_len, d_model) table: sin on even dims, cos on odd dims."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-jnp.log(10000.0) / d_model)
    )
    angles = position * div_term  # (max_len, ceil(d/2))
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : d_model // 2]))
    return pe.astype(dtype)


class PositionalEncoder(nn.Module):
    """Residual sinusoidal PE + dropout over a (B, T, C) sequence."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 1000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        seq_len = x.shape[1]
        pe = sinusoidal_table(self.max_len, self.d_model, x.dtype)
        x = x + pe[None, :seq_len, :]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
