"""Fused CLIP attention kernel (ops/clip_attention.py) correctness.

The Pallas kernel body runs here in interpreter mode (Mosaic is
TPU-only); numerics must match the XLA reference path, including at the
production head-count/sequence ratios (odd N = 577-style unaligned
shapes, scaled down for CPU speed)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.ops.clip_attention import (
    _flash_pallas,
    _flash_xla,
    clip_attention,
)


def _rand_qkv(B, N, D, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (B, N, 3 * D)), dtype)


def test_kernel_matches_xla_aligned():
    qkv = _rand_qkv(2, 128, 64)
    want = _flash_xla(qkv, 0.25, num_heads=4)
    got = _flash_pallas(qkv, 0.25, num_heads=4, head_block=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_kernel_matches_xla_unaligned_n():
    """N=73 mirrors the production N=577 (not a lane multiple)."""
    qkv = _rand_qkv(2, 73, 32, seed=1)
    want = _flash_xla(qkv, 32**-0.5, num_heads=4)
    got = _flash_pallas(
        qkv, 32**-0.5, num_heads=4, head_block=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_kernel_head_block_variants():
    qkv = _rand_qkv(1, 64, 64, seed=2)
    want = _flash_xla(qkv, 0.3, num_heads=8)
    for hb in (1, 2, 4, 8):
        got = _flash_pallas(
            qkv, 0.3, num_heads=8, head_block=hb, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5, err_msg=hb
        )


def test_custom_vjp_grad_matches_xla():
    qkv = _rand_qkv(1, 48, 32, seed=3)

    def loss_k(t):
        return jnp.sum(clip_attention(t, 0.25, 4) ** 2)

    def loss_ref(t):
        return jnp.sum(_flash_xla(t, 0.25, 4) ** 2)

    g_k = jax.grad(loss_k)(qkv)
    g_r = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_r), atol=1e-4, rtol=1e-4
    )


def test_clip_tower_pallas_opt_in_same_tree_and_numbers():
    """Model level: fused-qkv projection path preserves the stock MHA
    param tree and numerics (XLA fallback on CPU)."""
    from geoguessr_ai_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    cfg = dataclasses.replace(
        CLIPVisionConfig(), image_size=112, num_layers=2, dtype=jnp.float32
    )
    m0 = CLIPVisionTower(dataclasses.replace(cfg, pallas_attention=False))
    m1 = CLIPVisionTower(dataclasses.replace(cfg, pallas_attention=True))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 112, 112, 3)), jnp.float32
    )
    v = m0.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x)
    )
    r0 = m0.apply(v, x)
    r1 = m1.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(r1.pooler_output),
        np.asarray(r0.pooler_output),
        atol=2e-5,
        rtol=1e-5,
    )


def test_kernel_img_block_variants():
    qkv = _rand_qkv(4, 64, 64, seed=5)
    want = _flash_xla(qkv, 0.3, num_heads=8)
    for ib in (1, 2, 4):
        got = _flash_pallas(
            qkv, 0.3, num_heads=8, head_block=2, img_block=ib,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
            err_msg=str(ib),
        )


def test_fused_proj_kernel_matches_xla_interpret():
    """clip_attention_proj (out-projection folded into the kernel with a
    VMEM f32 accumulator) matches the XLA attention + separate GEMM."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.ops.clip_attention import (
        _flash_proj_pallas,
        _flash_proj_xla,
    )

    rng = np.random.default_rng(3)
    B, N, H, hd = 2, 61, 4, 16
    D = H * hd
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (D, D)), jnp.float32)
    want = np.asarray(_flash_proj_xla(qkv, w, hd**-0.5, H))
    got = np.asarray(
        _flash_proj_pallas(
            qkv, w, hd**-0.5, H, head_block=2, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fused_proj_module_matches_unfused():
    """CLIPVisionTower with pallas_fuse_proj=True equals the unfused
    tower numerically (CPU lowers both to the XLA path; the param tree
    is unchanged)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    cfg = dataclasses.replace(
        CLIPVisionConfig.test_tiny(), dtype=jnp.float32,
        pallas_attention=True,
    )
    cfg2 = dataclasses.replace(cfg, pallas_fuse_proj=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    m1, m2 = CLIPVisionTower(cfg), CLIPVisionTower(cfg2)
    v = m1.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m1.apply(v, x).pooler_output)
    b = np.asarray(m2.apply(v, x).pooler_output)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
