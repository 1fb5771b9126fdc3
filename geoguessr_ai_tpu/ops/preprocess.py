"""Fused on-device preprocessing.

The reference preprocesses on host and even resizes twice (PIL Resize(336)
then F.interpolate to 512, main_coordinator_idun.py:38-44 + :299-318 — a
known inefficiency flagged in SURVEY.md §3.1).  Here the host ships raw
uint8 pixels once (4x less PCIe traffic than float32) and a single jitted
program does resize -> scale -> normalize -> dtype-cast in fused XLA
kernels right next to the model forward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("out_size", "dtype", "antialias")
)
def fused_preprocess(
    images_u8: jax.Array,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    out_size: int,
    dtype=jnp.bfloat16,
    antialias: bool = True,
) -> jax.Array:
    """uint8 (..., H, W, 3) -> normalized `dtype` (..., out, out, 3).

    Bilinear resize (antialiased when downscaling, matching PIL semantics
    closely enough for training) fused with (x/255 - mean)/std.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) != (out_size, out_size):
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        x = jax.image.resize(
            x,
            (x.shape[0], out_size, out_size, 3),
            method="bilinear",
            antialias=antialias,
        )
        x = x.reshape(lead + (out_size, out_size, 3))
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return ((x - mean_a) / std_a).astype(dtype)
