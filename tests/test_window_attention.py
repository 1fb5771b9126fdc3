"""Pallas window-attention parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _setup(W, H, N, hd, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(W, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(W, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(W, H, N, hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize("variant", ["qtiled", "batched"])
def test_pallas_kernels_match_xla_interpret(variant):
    from jax.experimental.pallas import tpu as pltpu

    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 8, 2, 256, 32
    q, k, v, bias = _setup(W, H, N, hd)
    scale = hd**-0.5
    want = np.asarray(wa._attention_xla(q, k, v, bias, scale))
    with pltpu.force_tpu_interpret_mode():
        if variant == "qtiled":
            got = wa._attention_qtiled(q, k, v, bias, scale, block_q=128)
        else:
            got = wa._attention_batched(q, k, v, bias, scale, block_w=4)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-2)


def test_qkv_fused_kernel_matches_xla_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 4, 12, 256, 32
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    scale = hd**-0.5
    want = np.asarray(wa._attention_qkv_fused_xla(qkv, bias, scale, H))
    with pltpu.force_tpu_interpret_mode():
        got = wa._attention_qkv_fused_pallas(qkv, bias, scale, H)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-2)


def test_qkv_fused_custom_vjp_matches_xla_grad():
    from jax.experimental.pallas import tpu as pltpu

    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 2, 3, 128, 32
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    scale = hd**-0.5

    def loss_ref(qkv, bias):
        return jnp.sum(
            wa._attention_qkv_fused_xla(qkv, bias, scale, H) ** 2
        )

    def loss_pallas(qkv, bias):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                wa.window_attention_qkv(qkv, bias, scale, H) ** 2
            )

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1))(qkv, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2
        )


def test_custom_vjp_backward_matches_xla_grad():
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 2, 1, 128, 32
    q, k, v, bias = _setup(W, H, N, hd, seed=1)
    scale = hd**-0.5

    def loss_ref(q, k, v, bias):
        return jnp.sum(wa._attention_xla(q, k, v, bias, scale) ** 2)

    # the custom-vjp path's backward recomputes via the same XLA formula,
    # so its gradients must match exactly
    from jax.experimental.pallas import tpu as pltpu

    def loss_pallas(q, k, v, bias):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(wa.window_attention(q, k, v, bias, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2
        )


def test_clip_pallas_attention_opt_in_matches_default():
    """CLIPVisionConfig.pallas_attention=True: same param tree, same
    numbers (XLA fallback on CPU exercises the pad+mask plumbing)."""
    import dataclasses

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
        atol=1e-4,
        rtol=1e-4,
    )


def test_select_head_block_lane_rule():
    """Mosaic lane constraint: the qkv channel block (3*hd*hb) must be
    128-divisible or span all heads (full width is always legal)."""
    from geoguessr_ai_tpu.ops.window_attention import select_head_block

    # hd=32 (TinyViT): 96*hb % 128 == 0 iff hb % 4 == 0
    assert select_head_block(12, 32, 4) == 4
    assert select_head_block(12, 32, 8) == 4  # 8 does not divide 12
    assert select_head_block(12, 32, 3) == 12  # no valid hb <= 3 -> full
    assert select_head_block(6, 32, 4) == 6  # 6 % 4 != 0 -> full
    assert select_head_block(18, 32, 4) == 18
    # hd=64 (CLIP-ish): 192*hb % 128 == 0 iff hb even
    assert select_head_block(16, 64, 4) == 4
    assert select_head_block(16, 64, 3) == 2
    # selected block always satisfies the constraint or is full
    for H in (3, 5, 6, 12, 16, 18):
        for hd in (16, 32, 64):
            for req in (1, 2, 3, 4, 8):
                hb = select_head_block(H, hd, req)
                assert H % hb == 0
                assert (3 * hd * hb) % 128 == 0 or hb == H


def test_fused_block_kernel_interpret_matches_xla():
    """fused_block_attention (LN+qkv+attention+proj in one kernel): the
    pallas interpret path matches the XLA composition."""
    import functools

    import jax.numpy as jnp

    from geoguessr_ai_tpu.ops.window_attention import (
        _fused_block_pallas,
        _fused_block_xla,
    )

    rng = np.random.default_rng(0)
    W, N, C, H = 6, 128, 32, 2
    hd = C // H
    x = jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.float32)
    args = (
        x,
        jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C, 3 * C)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (3 * C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32),
    )
    want = np.asarray(_fused_block_xla(*args, hd**-0.5, H, 1e-5))
    got = np.asarray(
        _fused_block_pallas(
            *args, hd**-0.5, H, 1e-5, block_w=2, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fused_block_model_matches_default():
    """TinyViT with fused_block_stages set equals the default model
    numerically, at a geometry where the fused branch ACTUALLY engages
    (it requires lane-aligned N: stage-1 window 16 at 16x16 resolution
    -> N=256; the plain test_tiny windows give N=4/16 and would skip the
    branch, making the comparison vacuous).  Param tree unchanged, and
    gradients flow through the custom VJP."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

    import dataclasses

    cfg = dataclasses.replace(
        TinyViTConfig.test_tiny(dtype=jnp.float32),
        window_sizes=(2, 16, 4, 2),
    )
    cfg2 = dataclasses.replace(cfg, fused_block_stages=(1,))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    m1, m2 = TinyViT(cfg), TinyViT(cfg2)
    v = m1.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v2
    )
    a = np.asarray(m1.apply(v, x))
    b = np.asarray(m2.apply(v, x))
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)

    # gradients through the fused path's custom VJP match the default
    def loss1(p):
        return m1.apply({**v, "params": p}, x).sum()

    def loss2(p):
        return m2.apply({**v, "params": p}, x).sum()

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    for la, lb in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=1e-3, rtol=1e-2
        )


@pytest.mark.parametrize(
    "W,H,N,hd,stack_bytes",
    [
        (4, 6, 256, 32, None),  # stage-1-like, all heads in one group
        (2, 18, 128, 32, 64 * 1024),  # stage-3-like head count, forces
        # the in-kernel head-group loop (hg < H) incl. an uneven tail
    ],
)
def test_qkv_bwd_kernel_matches_xla_grad_interpret(
    W, H, N, hd, stack_bytes, monkeypatch
):
    """The Pallas attention-backward kernel (round 4: d_qkv + d_bias in
    one VMEM pass) must match the XLA recompute-vjp cotangents."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    if stack_bytes is not None:
        monkeypatch.setattr(wa, "_BWD_STACK_BYTES", stack_bytes)
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(W, N, H * hd)), jnp.float32)
    scale = hd**-0.5

    _, vjp = jax.vjp(
        lambda a, b: wa._attention_qkv_fused_xla(a, b, scale, H), qkv, bias
    )
    want_dqkv, want_db = vjp(g)
    got_dqkv, got_db = wa._attention_qkv_bwd_pallas(
        qkv, bias, g, scale, H, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_dqkv), np.asarray(want_dqkv), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_db), np.asarray(want_db), atol=5e-3, rtol=1e-2
    )


def test_qkv_bwd_kernel_window_blocks_interpret():
    """wb > 1 (multi-window grid cells) and the sequential d_bias
    accumulation across grid steps."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 6, 2, 128, 32
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(W, N, H * hd)), jnp.float32)
    scale = hd**-0.5
    _, vjp = jax.vjp(
        lambda a, b: wa._attention_qkv_fused_xla(a, b, scale, H), qkv, bias
    )
    want_dqkv, want_db = vjp(g)
    got_dqkv, got_db = wa._attention_qkv_bwd_pallas(
        qkv, bias, g, scale, H, block_w=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_dqkv), np.asarray(want_dqkv), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_db), np.asarray(want_db), atol=5e-3, rtol=1e-2
    )


def test_fused_block_grads_unchanged_after_bwd_reroute():
    """_fb_bwd now recomputes through window_attention_qkv; on CPU that
    is the same XLA attention, so fused_block_attention grads must equal
    direct jax.grad of the XLA composition (guards the reroute)."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 2, 2, 128, 32
    C = H * hd
    rng = np.random.default_rng(9)
    args = (
        jnp.asarray(rng.normal(size=(W, N, C)), jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32),
    )
    scale = hd**-0.5

    def loss_custom(*a):
        return jnp.sum(wa.fused_block_attention(*a, scale, H) ** 2)

    def loss_ref(*a):
        return jnp.sum(wa._fused_block_xla(*a, scale, H, 1e-5) ** 2)

    g_c = jax.grad(loss_custom, argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2
        )


def test_qtiled_bwd_large_matches_xla_grad_interpret():
    """Large-N (stage-2-shaped, scaled down) q-tiled backward kernels:
    dqkv + d_bias must match the XLA recompute-vjp cotangents, including
    dk/dv accumulation across q-tiles (QT>1) and d_bias accumulation
    across windows."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 3, 2, 512, 32
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(W, N, H * hd)), jnp.float32)
    scale = hd**-0.5
    _, vjp = jax.vjp(
        lambda a, b: wa._attention_qkv_fused_xla(a, b, scale, H), qkv, bias
    )
    want_dqkv, want_db = vjp(g)
    got_dqkv, got_db = wa._attention_qkv_bwd_large(
        qkv, bias, g, scale, H, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_dqkv), np.asarray(want_dqkv), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_db), np.asarray(want_db), atol=5e-3, rtol=1e-2
    )


def test_hybrid_op_forward_and_grads_match_inline_xla():
    """window_attention_qkv_xla: primal identical to the inline einsum
    attention; CPU grads equal plain autodiff of the same formula."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 2, 3, 128, 32
    rng = np.random.default_rng(12)
    qkv = jnp.asarray(rng.normal(size=(W, N, 3 * H * hd)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    scale = hd**-0.5
    want = wa._attention_qkv_fused_xla(qkv, bias, scale, H)
    got = wa.window_attention_qkv_xla(qkv, bias, scale, H)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )

    def loss_ref(a, b):
        return jnp.sum(wa._attention_qkv_fused_xla(a, b, scale, H) ** 2)

    def loss_hybrid(a, b):
        return jnp.sum(wa.window_attention_qkv_xla(a, b, scale, H) ** 2)

    g_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_h = jax.grad(loss_hybrid, argnums=(0, 1))(qkv, bias)
    for a, b in zip(g_h, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


@pytest.mark.parametrize(
    "head_batched,head_block",
    [(False, None), (True, None), (False, 12)],
)
def test_fb_s2_kernel_interpret_matches_xla(head_batched, head_block):
    """fused_block_attention_noproj (stage-2 LN+qkv+attention, no proj):
    the pallas interpret path matches the XLA composition at a stage-2-
    like geometry (H=12, hd=32 -> head chunks of 4, 3 chunks), in
    head-sequential and head-batched variants plus the hb=12 all-heads
    chunk (full bias residency — measured LOSING e2e but kept as a
    supported knob)."""
    import jax.numpy as jnp

    from geoguessr_ai_tpu.ops.window_attention import (
        _fb_s2_pallas,
        _fb_s2_xla,
    )

    rng = np.random.default_rng(0)
    W, N, H, hd = 3, 256, 12, 16
    C = 128
    D = H * hd
    scale = hd**-0.5
    x = jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.float32)
    args = (
        x,
        jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (C, 3 * D)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (3 * D,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32),
    )
    want = np.asarray(_fb_s2_xla(*args, scale, H, 1e-5))
    got = np.asarray(
        _fb_s2_pallas(
            *args, scale, H, 1e-5, block_q=128,
            head_batched=head_batched, head_block=head_block,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fb_s2_model_matches_default_and_grads():
    """TinyViT with fused_block_noproj_stages (the round-4 DEFAULT)
    equals the plain-modules path numerically at a geometry where the
    branch engages (N=256), with an unchanged param tree and matching
    gradients (the custom VJP recomputes through the hybrid XLA-fwd
    path).  noproj is explicitly disabled on the baseline config since
    it became the default."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

    cfg = dataclasses.replace(
        TinyViTConfig.test_tiny(dtype=jnp.float32),
        window_sizes=(2, 2, 16, 2),
        fused_block_noproj_stages=(),
    )
    cfg2 = dataclasses.replace(cfg, fused_block_noproj_stages=(2,))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    m1, m2 = TinyViT(cfg), TinyViT(cfg2)
    v = m1.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v2
    )
    a = np.asarray(m1.apply(v, x))
    b = np.asarray(m2.apply(v, x))
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)

    def loss1(p):
        return m1.apply({**v, "params": p}, x).sum()

    def loss2(p):
        return m2.apply({**v, "params": p}, x).sum()

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    for la, lb in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=1e-3, rtol=1e-2
        )


def test_bwd_merged_matches_two_kernel_interpret():
    """The merged one-pass large-N backward (dq/dk/dv + d_bias in one
    grid) matches the two-kernel K1/K2 design in interpret mode."""
    import jax.numpy as jnp

    from geoguessr_ai_tpu.ops.window_attention import (
        _attention_bwd_merged_pallas,
        _attention_bwd_qtiled_pallas,
    )

    rng = np.random.default_rng(0)
    W, H, N, hd = 3, 4, 256, 16
    scale = hd**-0.5
    q = jnp.asarray(rng.normal(0, 1, (W, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (W, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (W, H, N, hd)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (W, H, N, hd)), jnp.float32)
    ref = _attention_bwd_qtiled_pallas(
        q, k, v, b, g, scale, block_q=128, interpret=True
    )
    got = _attention_bwd_merged_pallas(
        q, k, v, b, g, scale, block_q=128, interpret=True
    )
    for name, a, bb in zip(("dq", "dk", "dv", "db"), ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4,
            err_msg=name,
        )


def test_handrolled_fb_bwds_match_vjp_path():
    """Round-5 HANDROLLED_FB_BWD: the hand-rolled fused-block backwards
    (prefix-vjp + direct cotangent rules, no discarded primal recompute)
    must reproduce the jax.vjp-over-full-forward grads for BOTH the
    proj'd and the no-proj ops."""
    from geoguessr_ai_tpu.ops import window_attention as wa

    W, H, N, hd = 2, 2, 128, 32
    C = H * hd
    rng = np.random.default_rng(11)
    common = (
        jnp.asarray(rng.normal(size=(W, N, C)), jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32),
    )
    proj = (
        jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)), jnp.float32),
    )
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.1, jnp.float32)
    scale = hd**-0.5

    def loss_fb(*a):
        return jnp.sum(
            wa.fused_block_attention(*a[:5], *proj, a[5], scale, H) ** 2
        )

    def loss_s2(*a):
        return jnp.sum(
            wa.fused_block_attention_noproj(*a, scale, H) ** 2
        )

    old = wa.HANDROLLED_FB_BWD
    try:
        wa.HANDROLLED_FB_BWD = False
        ref_fb = jax.grad(loss_fb, argnums=tuple(range(6)))(*common, bias)
        ref_s2 = jax.grad(loss_s2, argnums=tuple(range(6)))(*common, bias)
        wa.HANDROLLED_FB_BWD = True
        got_fb = jax.grad(loss_fb, argnums=tuple(range(6)))(*common, bias)
        got_s2 = jax.grad(loss_s2, argnums=tuple(range(6)))(*common, bias)
    finally:
        wa.HANDROLLED_FB_BWD = old
    for a, b in zip(got_fb, ref_fb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
    for a, b in zip(got_s2, ref_s2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
