"""Weight-converter parity tests.

The CLIP test is a true numerical parity check: a randomly initialized HF
``CLIPVisionModel`` (transformers, CPU) is converted to our Flax tower and
both are run on the same input.  No network/weights needed.
"""

import numpy as np
import pytest

from geoguessr_ai_tpu.models.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionTower,
)
from geoguessr_ai_tpu.models.torch_convert import (
    clip_vision_from_hf,
    merge_params,
    super_guessr_head_from_reference,
)


def test_clip_parity_with_transformers():
    import jax.numpy as jnp
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel

    hf_cfg = HFConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf_model = CLIPVisionModel(hf_cfg).eval()

    cfg = CLIPVisionConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        mlp_dim=128,
        dtype=jnp.float32,
    )
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = clip_vision_from_hf(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    ours = CLIPVisionTower(cfg).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state),
        hf_out.last_hidden_state.numpy(),
        atol=2e-4,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours.pooler_output),
        hf_out.pooler_output.numpy(),
        atol=2e-4,
        rtol=1e-3,
    )


def test_super_guessr_head_conversion_shape_filter():
    rng = np.random.default_rng(1)
    sd = {
        "cell_layer.weight": rng.normal(size=(37, 16)).astype(np.float32),
        "cell_layer.bias": rng.normal(size=(37,)).astype(np.float32),
    }
    out = super_guessr_head_from_reference(sd, num_cells=37)
    assert out["cell_layer"]["kernel"].shape == (16, 37)
    # mismatched num_cells -> skipped (reference shape-filtered load)
    out2 = super_guessr_head_from_reference(sd, num_cells=99)
    assert "cell_layer" not in out2


def test_head_conversion_applies_to_model():
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import SuperGuessr

    rng = np.random.default_rng(2)
    sd = {
        "cell_layer.weight": rng.normal(size=(8, 16)).astype(np.float32),
        "cell_layer.bias": np.zeros(8, np.float32),
    }
    model = SuperGuessr(
        num_cells=8, backbone=None, panorama=True, embed_dim=16,
        dtype=jnp.float32,
    )
    e = jnp.asarray(rng.normal(size=(2, 4, 16)), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), embedding=e)
    overlay = super_guessr_head_from_reference(sd, num_cells=8)
    params = merge_params(variables["params"], overlay)
    emb, logits = model.apply({"params": params}, embedding=e)
    want = np.asarray(e.mean(axis=1)) @ sd["cell_layer.weight"].T
    np.testing.assert_allclose(np.asarray(logits), want, atol=1e-5)


def test_head_export_roundtrip():
    """Reverse interop: head params -> reference state dict -> back
    through the forward converter must be an identity."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import SuperGuessr
    from geoguessr_ai_tpu.models.torch_convert import (
        super_guessr_head_from_reference,
        super_guessr_head_to_reference,
    )

    model = SuperGuessr(
        num_cells=16, backbone=None, panorama=True, hierarchical=True,
        embed_dim=32, num_attention_heads=4, dtype=jnp.float32,
    )
    v = model.init(
        jax.random.PRNGKey(0), embedding=jnp.zeros((1, 4, 32))
    )
    sd = super_guessr_head_to_reference(
        v["params"], num_attention_heads=4
    )
    assert set(sd) == {
        "cell_layer.weight", "cell_layer.bias",
        "self_attn.in_proj_weight", "self_attn.in_proj_bias",
        "self_attn.out_proj.weight", "self_attn.out_proj.bias",
    }
    assert sd["cell_layer.weight"].shape == (16, 32)
    assert sd["self_attn.in_proj_weight"].shape == (96, 32)
    back = super_guessr_head_from_reference(
        sd, num_cells=16, num_attention_heads=4
    )
    for name in ("query", "key", "value", "out"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(back["self_attn"][name][leaf]),
                np.asarray(v["params"]["self_attn"][name][leaf]),
                atol=1e-7,
            )
    np.testing.assert_allclose(
        np.asarray(back["cell_layer"]["kernel"]),
        np.asarray(v["params"]["cell_layer"]["kernel"]),
        atol=1e-7,
    )


def test_export_checkpoint_tool_roundtrip(tmp_path):
    """Orbax checkpoint -> reference .pt -> loadable by the forward
    converters (full export pipeline, tools/export_checkpoint.py)."""
    import importlib.util
    import os

    import jax
    import jax.numpy as jnp
    import torch

    from geoguessr_ai_tpu.models import SuperGuessr, TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.train.checkpoints import (
        CheckpointConfig,
        CheckpointStore,
        load_torch_checkpoint,
    )
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.config import OptimizerConfig

    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = SuperGuessr(
        num_cells=8, backbone=TinyViT(cfg), panorama=True,
        embed_dim=cfg.embed_dim, dtype=jnp.float32,
    )
    v = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, 4, cfg.image_size, cfg.image_size, 3)),
    )
    state = create_train_state(model, v, OptimizerConfig(), 10)
    store = CheckpointStore(CheckpointConfig(directory=str(tmp_path)))
    store.save_epoch(jax.device_get(state), 0, 1.0, None)

    spec = importlib.util.spec_from_file_location(
        "export_checkpoint",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "export_checkpoint.py",
        ),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    out_pt = str(tmp_path / "model.pt")
    # test_tiny backbone -> export with its config (patch the production
    # config lookup for the test-size tower)
    import geoguessr_ai_tpu.models.tinyvit as tv_mod

    orig = tv_mod.TinyViTConfig.tiny_vit_21m_512
    tv_mod.TinyViTConfig.tiny_vit_21m_512 = staticmethod(
        lambda **kw: cfg
    )
    try:
        sd = tool.export(str(tmp_path / "best"), out_pt, "tinyvit", 16)
    finally:
        tv_mod.TinyViTConfig.tiny_vit_21m_512 = orig

    assert "cell_layer.weight" in sd
    assert any(k.startswith("base_model.backbone.") for k in sd)
    loaded = load_torch_checkpoint(out_pt)
    np.testing.assert_allclose(
        loaded["cell_layer.weight"],
        np.asarray(v["params"]["cell_layer"]["kernel"]).T,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        loaded["base_model.backbone.head.norm.weight"],
        np.asarray(v["params"]["backbone"]["norm_head"]["scale"]),
        atol=1e-7,
    )
