"""Model shape/semantics tests on tiny configs (CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoguessr_ai_tpu.models import (
    CLIPVisionConfig,
    CLIPVisionTower,
    SuperGuessr,
    TinyViT,
    TinyViTConfig,
    clip_mean_token_embedding,
    decode_predictions,
    forward,
    hard_ce,
    smoothed_soft_ce,
)

NUM_CELLS = 37


@pytest.fixture(scope="module")
def tinyvit_tiny():
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = TinyViT(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_tinyvit_shapes(tinyvit_tiny):
    cfg, model, variables = tinyvit_tiny
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3)
    )
    emb = model.apply(variables, x)
    assert emb.shape == (2, cfg.embed_dim)
    assert jnp.isfinite(emb).all()


def test_tinyvit_train_mode_updates_bn(tinyvit_tiny):
    cfg, model, variables = tinyvit_tiny
    x = jax.random.normal(
        jax.random.PRNGKey(2), (2, cfg.image_size, cfg.image_size, 3)
    )
    emb, new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert emb.shape == (2, cfg.embed_dim)
    # running stats moved away from init
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_clip_tower_shapes():
    cfg = CLIPVisionConfig.test_tiny(dtype=jnp.float32)
    model = CLIPVisionTower(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.last_hidden_state.shape == (2, cfg.seq_len, cfg.hidden_size)
    assert out.pooler_output.shape == (2, cfg.hidden_size)
    emb = clip_mean_token_embedding(out)
    assert emb.shape == (2, cfg.hidden_size)


def _super_guessr_setup(hierarchical=False):
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = SuperGuessr(
        num_cells=NUM_CELLS,
        backbone=TinyViT(cfg),
        panorama=True,
        hierarchical=hierarchical,
        embed_dim=cfg.embed_dim,
        dtype=jnp.float32,
    )
    x = jnp.zeros((2, 4, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x)
    return cfg, model, variables


def test_super_guessr_panorama_forward():
    cfg, model, variables = _super_guessr_setup()
    x = jax.random.normal(
        jax.random.PRNGKey(3), (2, 4, cfg.image_size, cfg.image_size, 3)
    )
    emb, logits = model.apply(variables, pixel_values=x)
    assert emb.shape == (2, 4, cfg.embed_dim)
    assert logits.shape == (2, NUM_CELLS)


def test_super_guessr_hierarchical_forward():
    cfg, model, variables = _super_guessr_setup(hierarchical=True)
    x = jax.random.normal(
        jax.random.PRNGKey(4), (2, 4, cfg.image_size, cfg.image_size, 3)
    )
    emb, logits = model.apply(variables, pixel_values=x)
    assert logits.shape == (2, NUM_CELLS)
    assert jnp.isfinite(logits).all()


def test_super_guessr_embedding_only_mode():
    model = SuperGuessr(
        num_cells=NUM_CELLS, backbone=None, panorama=True, embed_dim=16,
        dtype=jnp.float32,
    )
    e = jax.random.normal(jax.random.PRNGKey(5), (3, 4, 16))
    variables = model.init(jax.random.PRNGKey(0), embedding=e)
    emb, logits = model.apply(variables, embedding=e)
    assert logits.shape == (3, NUM_CELLS)
    # mean fusion: logits of mean-embedding equal fused path
    fused = e.mean(axis=1)
    kernel = variables["params"]["cell_layer"]["kernel"]
    bias = variables["params"]["cell_layer"]["bias"]
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(fused @ kernel + bias), atol=1e-5
    )


def test_decode_predictions_centroid_lookup():
    centroids = jnp.array(
        [[10.0, 60.0], [150.0, -30.0], [-78.0, 0.0]], dtype=jnp.float32
    )
    logits = jnp.array([[0.1, 5.0, 0.2], [4.0, 0.0, 0.0]])
    probs, preds, lnglat, topk = decode_predictions(logits, centroids, 2)
    np.testing.assert_array_equal(np.asarray(preds), [1, 0])
    np.testing.assert_allclose(
        np.asarray(lnglat), [[150.0, -30.0], [10.0, 60.0]]
    )
    assert topk.indices.shape == (2, 2)
    assert np.asarray(topk.indices)[0, 0] == 1


def test_smoothed_soft_ce_prefers_correct_cell():
    centroids = jnp.array(
        [[10.0, 60.0], [150.0, -30.0], [-78.0, 0.0]], dtype=jnp.float32
    )
    coords = jnp.array([[10.0, 60.0]])  # exactly at cell 0
    good = jnp.array([[10.0, 0.0, 0.0]])
    bad = jnp.array([[0.0, 10.0, 0.0]])
    assert float(smoothed_soft_ce(good, coords, centroids)) < float(
        smoothed_soft_ce(bad, coords, centroids)
    )


def test_hard_ce_matches_manual():
    logits = jnp.array([[1.0, 2.0, 3.0], [3.0, 1.0, 0.0]])
    labels = jnp.array([2, 0])
    want = -np.mean(
        [
            jax.nn.log_softmax(logits[0])[2],
            jax.nn.log_softmax(logits[1])[0],
        ]
    )
    np.testing.assert_allclose(float(hard_ce(logits, labels)), want, rtol=1e-6)


def test_forward_wrapper_model_output():
    cfg, model, variables = _super_guessr_setup()
    centroids = jnp.asarray(
        np.random.default_rng(0).uniform(-60, 60, (NUM_CELLS, 2)),
        dtype=jnp.float32,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(6), (2, 4, cfg.image_size, cfg.image_size, 3)
    )
    labels = jnp.array([[10.0, 50.0], [-50.0, -10.0]])
    out = forward(
        model,
        variables,
        centroids,
        pixel_values=x,
        labels=labels,
        should_smooth_labels=True,
    )
    assert out.loss is not None and jnp.isfinite(out.loss)
    assert out.preds_LLH.shape == (2, 2)
    assert out.top5_geocells.indices.shape == (2, 5)
    assert out.embedding.shape == (2, 4, cfg.embed_dim)


def test_dw_shifted_lowering_parity():
    """DW_SHIFTED (strided-slice depthwise lowering) matches the conv
    path on the same params (opt-in knob; measured slower e2e on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import geoguessr_ai_tpu.models.tinyvit as tv

    cfg = tv.TinyViTConfig.test_tiny(dtype=jnp.float32)
    m = tv.TinyViT(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m.apply(v, x))
    tv.DW_SHIFTED = True
    try:
        assert jax.tree_util.tree_structure(
            m.init(jax.random.PRNGKey(0), x)
        ) == jax.tree_util.tree_structure(v)
        b = np.asarray(m.apply(v, x))
    finally:
        tv.DW_SHIFTED = False
    np.testing.assert_allclose(a, b, atol=5e-6)


def test_window_partition_unpartition_inverse():
    """Partition/unpartition are exact inverses for every (H, W, window)
    combination the deployed configs use — these lower to pure reshapes
    XLA fuses away, so a silent transpose bug here would scramble every
    window's tokens."""
    import numpy as np

    from geoguessr_ai_tpu.models.tinyvit import (
        window_partition,
        window_unpartition,
    )

    rng = np.random.default_rng(0)
    for H, W, w in ((64, 64, 16), (32, 32, 32), (16, 16, 16), (8, 8, 2)):
        x = jnp.asarray(rng.normal(size=(2, H, W, 5)), jnp.float32)
        windows = window_partition(x, w)
        assert windows.shape == (2 * (H // w) * (W // w), w * w, 5)
        back = window_unpartition(windows, w, (H, W))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        # window 0 of batch 0 is exactly the top-left wxw patch, row-major
        np.testing.assert_array_equal(
            np.asarray(windows[0].reshape(w, w, 5)),
            np.asarray(x[0, :w, :w, :]),
        )


def test_tiny_vit_family_presets_param_counts():
    """The three timm family geometries (5m/11m/21m) the reference's
    finetune pipeline selects from (train_tinyvit_timm.py model names)
    initialize with the expected parameter counts (shape-only)."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

    expected = {
        "tiny_vit_5m_224": (5.0e6, 5.8e6),
        "tiny_vit_11m_224": (10.5e6, 11.5e6),
        "tiny_vit_21m_512": (20.5e6, 21.5e6),
    }
    for name, (lo, hi) in expected.items():
        cfg = getattr(TinyViTConfig, name)()
        model = TinyViT(cfg)
        shapes = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32),
        )
        n = sum(
            int(np.prod(a.shape))
            for a in jax.tree_util.tree_leaves(shapes["params"])
        )
        assert lo < n < hi, f"{name}: {n} params outside [{lo}, {hi}]"
