"""4D fused-block kernel parity (interpret mode on CPU) + model wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
from geoguessr_ai_tpu.ops.window_attention import (
    _fb4d_pallas,
    _fb4d_xla,
    fused_block_attention_4d,
)


def _case(rng, B=2, H=16, Wd=32, C=32, heads=2, window=16):
    D = C
    x = jnp.asarray(rng.normal(0, 1, (B, H, Wd, C)), jnp.float32)
    ls = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    lb = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
    wq = jnp.asarray(rng.normal(0, 0.1, (C, 3 * D)), jnp.float32)
    bq = jnp.asarray(rng.normal(0, 0.1, (3 * D,)), jnp.float32)
    wp = jnp.asarray(rng.normal(0, 0.1, (D, C)), jnp.float32)
    bp = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
    N = window * window
    bias = jnp.asarray(rng.normal(0, 0.5, (heads, N, N)), jnp.float32)
    hd = D // heads
    return (x, ls, lb, wq, bq, wp, bp, bias), hd**-0.5, heads, window


def test_fb4d_pallas_matches_xla_interpret():
    rng = np.random.default_rng(0)
    args, scale, heads, window = _case(rng)
    ref = _fb4d_xla(*args, scale, heads, 1e-5, window)
    with pltpu.force_tpu_interpret_mode():
        out = _fb4d_pallas(*args, scale, heads, 1e-5, window, block_w=2)
        out1 = _fb4d_pallas(*args, scale, heads, 1e-5, window, block_w=1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_fb4d_grads_match_partition_path():
    """The custom VJP (partition + hybrid recompute) matches jax.grad of
    the plain partition composition."""
    from geoguessr_ai_tpu.ops.window_attention import (
        _fused_block_xla,
        _window_partition,
        _window_unpartition,
    )

    rng = np.random.default_rng(1)
    args, scale, heads, window = _case(rng, B=1, H=16, Wd=16, C=16, heads=2)

    def via_4d(*a):
        return jnp.sum(
            fused_block_attention_4d(*a, scale, heads, window) ** 2
        )

    def via_partition(*a):
        wins = _window_partition(a[0], window)
        out = _fused_block_xla(wins, *a[1:], scale, heads, 1e-5)
        return jnp.sum(
            _window_unpartition(out, window, a[0].shape[1:3]) ** 2
        )

    g1 = jax.grad(via_4d, argnums=(0, 3, 5))(*args)
    g2 = jax.grad(via_partition, argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def _model_cfg(**kw):
    # stage 1 at 32x32 with window 16 -> multi-window fused-block stage
    return TinyViTConfig(
        image_size=128,
        embed_dims=(16, 32, 64, 80),
        depths=(1, 2, 1, 1),
        num_heads=(1, 2, 4, 5),
        window_sizes=(16, 16, 8, 4),
        dtype=jnp.float32,
        **kw,
    )


def test_model_fused_block_4d_matches_partition_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)), jnp.float32)
    base = TinyViT(_model_cfg())
    m4d = TinyViT(_model_cfg(fused_block_4d=True))
    v = base.init(jax.random.PRNGKey(0), x)
    v4 = m4d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v4
    )
    ref = np.asarray(base.apply(v, x))
    out = np.asarray(m4d.apply(v, x))
    # CPU platform branch runs the identical partition composition
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    # train mode: grads flow and match
    def loss(m):
        def f(p):
            return jnp.sum(
                m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )[0]
                ** 2
            )

        return jax.grad(f)(v["params"])

    g1 = jax.tree_util.tree_leaves(loss(base))
    g2 = jax.tree_util.tree_leaves(loss(m4d))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )
