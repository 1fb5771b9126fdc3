"""Interpret-mode guard for the experimental fused-MBConv kernel."""

import numpy as np
import pytest


def test_fused_mbconv_matches_xla_interpret():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from geoguessr_ai_tpu.ops.experimental import fused_mbconv as M

    rng = np.random.default_rng(0)
    B, H, W, C, E = 2, 32, 128, 96, 384
    args = [
        jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
        for s in [(B, H, W, C), (C, E), (E,), (3, 3, E), (E,), (E, C), (C,)]
    ]
    want = M.xla_mbconv(*args)
    with pltpu.force_tpu_interpret_mode():
        got = M.fused_mbconv(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )
