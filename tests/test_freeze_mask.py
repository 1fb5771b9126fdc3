"""backbone_freeze_mask policies (reference _freeze_params,
super_guessr.py:127-153): TinyViT keeps stage3 + its leading downsample +
norm_head trainable; CLIP keeps the LAST encoder layer + post_layernorm
trainable (encoder.layers[:-1] frozen); a no-match freeze must raise
instead of silently freezing the whole backbone."""

import jax
import jax.numpy as jnp
import pytest

from geoguessr_ai_tpu.models import (
    CLIPVisionConfig,
    CLIPVisionTower,
    SuperGuessr,
    TinyViT,
    TinyViTConfig,
)
from geoguessr_ai_tpu.train.state import backbone_freeze_mask


def _mask_by_child(params, mask):
    """child-module-name -> set of mask values among its leaves."""
    out = {}
    for (path, leaf), (_, m) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(mask),
    ):
        names = [getattr(p, "key", str(p)) for p in path]
        if "backbone" in names:
            i = names.index("backbone")
            child = names[i + 1]
            out.setdefault(child, set()).add(bool(m))
    return out


def test_tinyvit_last_stage_mask():
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = SuperGuessr(
        num_cells=8, backbone=TinyViT(cfg), panorama=False,
        embed_dim=cfg.embed_dim, dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    mask = backbone_freeze_mask(
        variables["params"], freeze_all_but_last_stage=True
    )
    by_child = _mask_by_child(variables["params"], mask)
    for child, vals in by_child.items():
        # timm's last stage includes its leading downsample
        # (ADVICE round-1: downsample2 must train alongside stage3)
        want = (
            child.startswith("stage3")
            or child.startswith("downsample2")
            or child == "norm_head"
        )
        assert vals == {want}, (child, vals)
    assert any(c.startswith("downsample2") for c in by_child)
    # head params outside the backbone always train
    head_mask = [
        bool(m)
        for (path, _), (_, m) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(mask),
        )
        if "backbone"
        not in [getattr(p, "key", str(p)) for p in path]
    ]
    assert all(head_mask)


def test_clip_last_layer_mask():
    cfg = CLIPVisionConfig.test_tiny()

    class _ClipEmbed(CLIPVisionTower):
        """Mean-token wrapper matching coordinator.build_backbone."""

        def __call__(self, pixel_values, train: bool = False):
            from geoguessr_ai_tpu.models import clip_mean_token_embedding

            return clip_mean_token_embedding(super().__call__(pixel_values))

    model = SuperGuessr(
        num_cells=8, backbone=_ClipEmbed(cfg), panorama=False,
        embed_dim=cfg.hidden_size, dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    mask = backbone_freeze_mask(
        variables["params"], freeze_all_but_last_stage=True
    )
    by_child = _mask_by_child(variables["params"], mask)
    last = f"layer{cfg.num_layers - 1}"
    trainable = {c for c, v in by_child.items() if v == {True}}
    frozen = {c for c, v in by_child.items() if v == {False}}
    assert last in trainable
    assert "post_layernorm" in trainable
    assert trainable == {last, "post_layernorm"}
    assert all(
        c.startswith("layer") or c in (
            "patch_embedding", "class_embedding", "position_embedding",
            "pre_layrnorm",
        )
        for c in frozen
    )
    # round-1 ADVICE regression: at least one backbone param must train
    assert trainable, "CLIP tower fully frozen"


def test_freeze_base_freezes_everything_in_backbone():
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = SuperGuessr(
        num_cells=8, backbone=TinyViT(cfg), panorama=False,
        embed_dim=cfg.embed_dim, dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    mask = backbone_freeze_mask(variables["params"], freeze_base=True)
    by_child = _mask_by_child(variables["params"], mask)
    assert all(v == {False} for v in by_child.values())


def test_no_match_raises():
    params = {"backbone": {"weird_module": {"kernel": jnp.zeros((2, 2))}}}
    with pytest.raises(ValueError, match="frozen"):
        backbone_freeze_mask(params, freeze_all_but_last_stage=True)
