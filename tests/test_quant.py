"""int8 GEMM path accuracy gates (round-2 VERDICT #3).

The acceptance bar: cosine(int8 embeddings, bf16/f32 embeddings) > 0.99
on the fixture panoramas, with the param tree unchanged (the int8 path
quantizes the same f32 params in-graph — no checkpoint format change)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.ops.quant import int8_matmul, quantize_symmetric

FIXTURES = sorted(
    glob.glob(
        os.path.join(os.path.dirname(__file__), "fixtures", "heading=*.jpg")
    )
)


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.5, (64, 32)), jnp.float32)
    q, s = quantize_symmetric(w, axis=1)
    assert q.dtype == jnp.int8
    assert s.shape == (1, 32)
    deq = q.astype(jnp.float32) * s
    # per-channel max error bounded by half a quantization step
    step = np.asarray(s).reshape(-1)
    err = np.abs(np.asarray(deq - w))
    assert (err <= step[None, :] * 0.5 + 1e-7).all()


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (128, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (256, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    want = np.asarray(x @ w + b)
    got = np.asarray(int8_matmul(x, w, bias=b, out_dtype=jnp.float32))
    # relative error at int8 resolution
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.max() < 0.08, rel.max()
    c = (got * want).sum() / (
        np.linalg.norm(got) * np.linalg.norm(want)
    )
    assert c > 0.999


def _fixture_batch(image_size):
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg

    views = np.stack(
        [decode_jpeg(open(p, "rb").read(), image_size) for p in FIXTURES]
    )
    return jnp.asarray(views, jnp.float32) / 255.0


def test_tinyvit_int8_cosine_gate_on_fixtures():
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    cfgq = TinyViTConfig.test_tiny(dtype=jnp.float32, quantize_gemms=True)
    model, modelq = TinyViT(cfg), TinyViT(cfgq)
    x = _fixture_batch(cfg.image_size)
    v = model.init(jax.random.PRNGKey(0), x)
    a = np.asarray(model.apply(v, x))
    b = np.asarray(modelq.apply(v, x))
    c = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert c.min() > 0.99, c


def test_tinyvit_static_int8_calibrate_then_gate():
    """Static-calibrated path (round-3 VERDICT #1): a 'calibrate' forward
    is numerically EXACT vs bf16 and records per-site abs-max; the
    'static' forward using those scales passes the cosine gate with no
    in-graph data-dependent reduction."""
    import dataclasses

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = TinyViT(cfg)
    model_cal = TinyViT(dataclasses.replace(cfg, quant_mode="calibrate"))
    model_q = TinyViT(dataclasses.replace(cfg, quant_mode="static"))
    x = _fixture_batch(cfg.image_size)
    v = model.init(jax.random.PRNGKey(0), x)
    a = np.asarray(model.apply(v, x))

    out_cal, mut = model_cal.apply(v, x, mutable=["act_stats"])
    np.testing.assert_allclose(np.asarray(out_cal), a, rtol=1e-6)
    stats = calibrate_act_stats(
        lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"]),
        v,
        [x, x * 0.5],
    )
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves and all(float(s) > 0 for s in leaves)

    b = np.asarray(model_q.apply({**v, "act_scales": stats}, x))
    c = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert c.min() > 0.99, c

    # uncalibrated static init must still run (default scale) and the
    # param tree must be unchanged vs the bf16 model
    vq = model_q.init(jax.random.PRNGKey(0), x)
    assert set(vq) >= {"params", "act_scales"}
    assert jax.tree_util.tree_structure(
        vq["params"]
    ) == jax.tree_util.tree_structure(v["params"])


def test_clip_int8_cosine_gate_on_fixtures():
    import dataclasses

    from geoguessr_ai_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    cfg = dataclasses.replace(
        CLIPVisionConfig.test_tiny(), image_size=112, dtype=jnp.float32
    )
    model = CLIPVisionTower(cfg)
    modelq = CLIPVisionTower(
        dataclasses.replace(cfg, quantize_gemms=True, pallas_attention=True)
    )
    x = _fixture_batch(cfg.image_size)
    v = model.init(jax.random.PRNGKey(0), x)
    a = np.asarray(model.apply(v, x).pooler_output)
    b = np.asarray(modelq.apply(v, x).pooler_output)
    c = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert c.min() > 0.99, c


def test_int8_static_conv_matches_float():
    """ops.quant.int8_static_conv (round-5 conv-emitter int8) matches the
    float conv to int8 resolution, incl. stride/padding/per-channel
    weight scales."""
    from geoguessr_ai_tpu.ops.quant import int8_static_conv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 12)), jnp.float32)
    amax = jnp.max(jnp.abs(x))
    got = np.asarray(
        int8_static_conv(x, w, amax, stride=2, padding=1,
                         out_dtype=jnp.float32)
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    c = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert c > 0.999, c


def test_tinyvit_conv_emitter_int8_and_dw_site_gate():
    """Round-5 campaign paths (VERDICT r4 #1): CONV_INT8_EMITTER keeps
    the conv-emitter lowering for quantized conv sites, and quant site
    "dw" stores the dw-conv inputs int8.  Gates: calibrate forward is
    exact, static forward passes the cosine bar, param tree unchanged."""
    import dataclasses

    from geoguessr_ai_tpu.models import tinyvit as tv
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    old = tv.CONV_INT8_EMITTER
    tv.CONV_INT8_EMITTER = True
    try:
        cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
        model = TinyViT(cfg)
        model_cal = TinyViT(dataclasses.replace(cfg, quant_mode="calibrate"))
        sites = ("conv", "qkv", "proj", "fc1", "fc2", "dw", "dwout", "stem",
                 "localdw")
        model_q = TinyViT(
            dataclasses.replace(cfg, quant_mode="static", quant_sites=sites)
        )
        x = _fixture_batch(cfg.image_size)
        v = model.init(jax.random.PRNGKey(0), x)
        a = np.asarray(model.apply(v, x))
        out_cal, _ = model_cal.apply(v, x, mutable=["act_stats"])
        np.testing.assert_allclose(np.asarray(out_cal), a, rtol=1e-5)
        stats = calibrate_act_stats(
            lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"]),
            v,
            [x, x * 0.5],
        )
        b = np.asarray(model_q.apply({**v, "act_scales": stats}, x))
        c = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert c.min() > 0.99, c
        vq = model_q.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            vq["params"]
        ) == jax.tree_util.tree_structure(v["params"])
    finally:
        tv.CONV_INT8_EMITTER = old


def test_fake_quant_ste_primal_and_gradient():
    """fake_quant_static_ste: primal == fake_quant_static bit-for-bit;
    VJP is the straight-through identity (round-5 train QAT-storage)."""
    from geoguessr_ai_tpu.ops.quant import (
        fake_quant_static,
        fake_quant_static_ste,
    )

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (64, 32)), jnp.float32
    )
    amax = jnp.asarray(2.5, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fake_quant_static_ste(x, amax)),
        np.asarray(fake_quant_static(x, amax)),
    )
    g = jax.grad(lambda a: fake_quant_static_ste(a, amax).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(g))
    # amax gets a zero cotangent (it is a calibration constant)
    ga = jax.grad(lambda a: fake_quant_static_ste(x, a).sum())(amax)
    assert float(ga) == 0.0


def test_tinyvit_train_quant_sites_gradient_flows():
    """A train step over the QAT-storage sites (TRAIN_QUANT_SITES) must
    produce finite, nonzero gradients for every param — the round()
    inside the storage sites would zero them without the STE."""
    import dataclasses

    from geoguessr_ai_tpu.models.tinyvit import (
        TRAIN_QUANT_SITES,
        TinyViT,
        TinyViTConfig,
    )
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = TinyViT(cfg)
    model_cal = TinyViT(dataclasses.replace(cfg, quant_mode="calibrate"))
    model_q = TinyViT(
        dataclasses.replace(
            cfg, quant_mode="static", quant_sites=TRAIN_QUANT_SITES
        )
    )
    x = _fixture_batch(cfg.image_size)
    v = model.init(jax.random.PRNGKey(0), x)
    stats = calibrate_act_stats(
        lambda vv, xx: model_cal.apply(vv, xx, mutable=["act_stats"]),
        v,
        [x],
    )

    def loss(params):
        out = model_q.apply(
            {**{**v, "params": params}, "act_scales": stats}, x
        )
        return (out.astype(jnp.float32) ** 2).mean()

    grads = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero >= 0.9 * len(leaves), (nonzero, len(leaves))


def test_train_step_with_qat_storage_sites():
    """End-to-end train_step with the QAT-storage backbone: calibrated
    act_scales ride TrainState.extra_variables into every apply; loss is
    finite and params actually move (STE gradient reaches the tower)."""
    import dataclasses

    from geoguessr_ai_tpu.config import OptimizerConfig
    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.models.tinyvit import (
        TRAIN_QUANT_SITES,
        TinyViT,
        TinyViTConfig,
    )
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step

    tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
    num_cells = 16
    centroids = jnp.asarray(
        np.random.default_rng(1).uniform(-60, 60, (num_cells, 2)),
        jnp.float32,
    )

    def make_model(tv_cfg):
        return SuperGuessr(
            num_cells=num_cells,
            backbone=TinyViT(tv_cfg),
            panorama=True,
            embed_dim=tv_cfg.embed_dim,
        )

    model = make_model(
        dataclasses.replace(
            tv, quant_mode="static", quant_sites=TRAIN_QUANT_SITES
        )
    )
    x0 = jnp.zeros((1, 4, tv.image_size, tv.image_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x0)
    cal_model = make_model(dataclasses.replace(tv, quant_mode="calibrate"))
    stats = calibrate_act_stats(
        lambda vv, xx: cal_model.apply(
            vv, pixel_values=xx, mutable=["act_stats"]
        ),
        {k: v for k, v in variables.items() if k != "act_scales"},
        [jnp.asarray(
            np.random.default_rng(0).normal(
                0, 1, (1, 4, tv.image_size, tv.image_size, 3)
            ),
            jnp.float32,
        )],
    )
    variables = {**variables, "act_scales": stats}
    state = create_train_state(model, variables, OptimizerConfig(), 10)
    assert state.extra_variables and "act_scales" in state.extra_variables
    rng = np.random.default_rng(2)
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(0, 1, (2, 4, tv.image_size, tv.image_size, 3)),
            jnp.float32,
        ),
        "coords": jnp.asarray(
            np.stack([rng.uniform(-170, 170, 2), rng.uniform(-60, 60, 2)],
                     axis=-1),
            jnp.float32,
        ),
    }
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = train_step(state, batch, centroids)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = train_step(state, batch, centroids)
    assert np.isfinite(float(metrics["loss"]))
    p_after = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))
    # extra_variables survive the step (the scales are carried, not lost)
    assert "act_scales" in state.extra_variables


def test_mlp_ln_handrolled_matches_layernorm():
    """MLP_LN_HANDROLLED: identical param tree; outputs match the
    nn.LayerNorm(dtype=f32) lowering (f32 stats; the normalize rounds
    once in compute dtype)."""
    import dataclasses

    from geoguessr_ai_tpu.models import tinyvit as tv
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    x = _fixture_batch(cfg.image_size)
    model = TinyViT(cfg)
    v = model.init(jax.random.PRNGKey(0), x)
    a = np.asarray(model.apply(v, x))
    old = tv.MLP_LN_HANDROLLED
    tv.MLP_LN_HANDROLLED = True
    try:
        model2 = TinyViT(dataclasses.replace(cfg))
        v2 = model2.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            v2["params"]
        ) == jax.tree_util.tree_structure(v["params"])
        b = np.asarray(model2.apply(v, x))
    finally:
        tv.MLP_LN_HANDROLLED = old
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_build_backbone_qat_storage_config():
    """BackboneConfig.qat_storage flips the tinyvit tower to the
    differentiable QAT-storage sites (static mode, TRAIN_QUANT_SITES)."""
    import dataclasses

    from geoguessr_ai_tpu.config import BackboneConfig
    from geoguessr_ai_tpu.models.tinyvit import TRAIN_QUANT_SITES
    from geoguessr_ai_tpu.train.coordinator import build_backbone

    bb, _, _, _ = build_backbone(
        dataclasses.replace(BackboneConfig.tinyvit(), qat_storage=True)
    )
    assert bb.config.quant_mode == "static"
    assert tuple(bb.config.quant_sites) == TRAIN_QUANT_SITES
    bb2, _, _, _ = build_backbone(BackboneConfig.tinyvit())
    assert bb2.config.quant_mode == "none"
