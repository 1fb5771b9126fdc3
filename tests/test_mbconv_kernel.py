"""Fused-MBConv Pallas kernel parity tests (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
from geoguessr_ai_tpu.ops.mbconv import (
    _mbconv_pallas,
    _mbconv_xla,
    fold_bn,
)


def _random_case(rng, B=2, H=8, W=8, C=16, E=64, dt=jnp.float32):
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), dt)
    w1 = jnp.asarray(rng.normal(0, 0.2, (C, E)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, E)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.2, (E, C)), jnp.float32)
    sb = []
    for dim in (E, E, C):
        g = jnp.asarray(rng.uniform(0.5, 1.5, (dim,)), jnp.float32)
        be = jnp.asarray(rng.normal(0, 0.1, (dim,)), jnp.float32)
        m = jnp.asarray(rng.normal(0, 0.1, (dim,)), jnp.float32)
        v = jnp.asarray(rng.uniform(0.5, 2.0, (dim,)), jnp.float32)
        sb.append(fold_bn(g, be, m, v))
    (s1, b1), (s2, b2), (s3, b3) = sb
    return x, w1, s1, b1, w2, s2, b2, w3, s3, b3


@pytest.mark.parametrize("tile_h", [2, 4, 8])
def test_pallas_matches_xla_interpret(tile_h):
    rng = np.random.default_rng(0)
    args = _random_case(rng)
    ref = _mbconv_xla(*args, exact=False)
    with pltpu.force_tpu_interpret_mode():
        out = _mbconv_pallas(*args, exact=False, tile_h=tile_h)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_pallas_matches_xla_interpret_bf16():
    rng = np.random.default_rng(1)
    args = _random_case(rng, H=6, W=6, dt=jnp.bfloat16)
    ref = np.asarray(_mbconv_xla(*args, exact=False), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            _mbconv_pallas(*args, exact=False, tile_h=3), np.float32
        )
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_model_fused_mbconv_matches_baseline():
    """fused_mbconv=True (CPU platform branch = folded-XLA composition)
    matches the stock ConvBN stage-0 path through the full model, and
    the parameter trees are checkpoint-interchangeable."""
    cfg = TinyViTConfig.test_tiny()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)

    base = TinyViT(dataclasses.replace(cfg, dtype=jnp.float32))
    v = base.init(jax.random.PRNGKey(0), x)
    fused = TinyViT(
        dataclasses.replace(cfg, dtype=jnp.float32, fused_mbconv=True)
    )
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        vf
    )
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape

    # perturb BN stats so the fold is non-trivial
    bs = jax.tree.map(
        lambda a: a + 0.05 * np.abs(rng.normal(0, 1, a.shape)).astype(a.dtype),
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": bs}
    ref = np.asarray(base.apply(v, x))
    out = np.asarray(fused.apply(v, x))
    cos = float(
        np.sum(ref * out)
        / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
    )
    assert cos > 0.9999
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_model_fused_mbconv_train_mode_falls_back():
    """train=True must take the stock path (BN batch stats) even with
    the flag on — outputs match the baseline trainer exactly."""
    cfg = TinyViTConfig.test_tiny()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    base = TinyViT(dataclasses.replace(cfg, dtype=jnp.float32))
    fused = TinyViT(
        dataclasses.replace(cfg, dtype=jnp.float32, fused_mbconv=True)
    )
    v = base.init(jax.random.PRNGKey(0), x)
    ref, refstats = base.apply(v, x, train=True, mutable=["batch_stats"])
    out, outstats = fused.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    for a, b in zip(
        jax.tree_util.tree_leaves(refstats),
        jax.tree_util.tree_leaves(outstats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
