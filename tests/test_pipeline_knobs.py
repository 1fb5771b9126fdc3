"""Parity for the round-4b software-pipeline knobs (interpret mode).

The ADOPTED defaults (S2_SW_PIPELINE=True, S2_BLOCK_Q=128) are covered
by the standard kernel tests; these pin the OPT-IN variants
(FB_SW_PIPELINE / FB_HALF_PIPELINE / CLIP_SW_PIPELINE and the serial
stage-2 fallback) so the measured-negative-but-kept paths don't rot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geoguessr_ai_tpu.ops import clip_attention as CA
from geoguessr_ai_tpu.ops import window_attention as WA


@pytest.fixture
def fb_args():
    rng = np.random.default_rng(0)
    W, N, C, heads = 4, 256, 64, 4
    x = jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.float32)
    return (
        (
            x,
            jnp.ones((C,)),
            jnp.zeros((C,)),
            jnp.asarray(rng.normal(0, 0.1, (C, 3 * C)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, (3 * C,)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.5, (heads, N, N)), jnp.float32),
        ),
        (C // heads) ** -0.5,
        heads,
    )


@pytest.mark.parametrize("knob", ["FB_SW_PIPELINE", "FB_HALF_PIPELINE"])
def test_fused_block_pipeline_knobs_parity(fb_args, knob):
    args, scale, heads = fb_args
    with pltpu.force_tpu_interpret_mode():
        ref = WA._fused_block_pallas(*args, scale, heads, 1e-5, block_w=2)
        old = getattr(WA, knob)
        try:
            setattr(WA, knob, True)
            out = WA._fused_block_pallas(
                *args, scale, heads, 1e-5, block_w=2
            )
        finally:
            setattr(WA, knob, old)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_s2_serial_fallback_matches_pipelined():
    rng = np.random.default_rng(1)
    W, N, C, heads = 3, 256, 64, 4
    hd = C // heads
    args = (
        jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.float32),
        jnp.ones((C,)),
        jnp.zeros((C,)),
        jnp.asarray(rng.normal(0, 0.1, (C, 3 * C)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (3 * C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.5, (heads, N, N)), jnp.float32),
    )
    with pltpu.force_tpu_interpret_mode():
        pipe = WA._fb_s2_pallas(
            *args, hd**-0.5, heads, 1e-5, head_block=2, block_q=128
        )
        old = WA.S2_SW_PIPELINE
        try:
            WA.S2_SW_PIPELINE = False
            serial = WA._fb_s2_pallas(
                *args, hd**-0.5, heads, 1e-5, head_block=2, block_q=128
            )
        finally:
            WA.S2_SW_PIPELINE = old
    np.testing.assert_allclose(
        np.asarray(pipe), np.asarray(serial), atol=1e-5, rtol=1e-5
    )


def test_clip_pipeline_knob_parity():
    rng = np.random.default_rng(2)
    B, N, heads, hd = 2, 64, 4, 16
    D = heads * hd
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = CA._flash_pallas(
            qkv, hd**-0.5, heads, head_block=2, interpret=True
        )
        old = CA.CLIP_SW_PIPELINE
        try:
            CA.CLIP_SW_PIPELINE = True
            out = CA._flash_pallas(
                qkv, hd**-0.5, heads, head_block=2, interpret=True
            )
        finally:
            CA.CLIP_SW_PIPELINE = old
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
