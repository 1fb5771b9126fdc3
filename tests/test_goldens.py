"""Golden-file regression tests.

SURVEY.md §4 calls for golden-value tests on the fixture panorama.  With no
pretrained weights reachable offline, the goldens freeze THIS framework's
deterministic seed-0 outputs (CPU, f32, XLA attention path): any future
refactor that silently changes model numerics — layer order, norm
placement, fusion semantics — fails here.  Regenerate intentionally with
``python tests/test_goldens.py``.
"""

import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "model_goldens.npz"
)


def _compute_goldens(fixtures_dir):
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.data.pipeline import decode_jpeg
    from geoguessr_ai_tpu.models import (
        CLIPVisionConfig,
        CLIPVisionTower,
        SuperGuessr,
        TinyViT,
        TinyViTConfig,
        clip_mean_token_embedding,
    )
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )

    views = np.stack(
        [
            decode_jpeg(
                open(
                    os.path.join(fixtures_dir, f"heading={h:03d}.jpg"), "rb"
                ).read(),
                64,
            )
            for h in (0, 90, 180, 270)
        ]
    )
    px = fused_preprocess(
        jnp.asarray(views),
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        64,
        dtype=jnp.float32,
    )

    tv_cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    tv = TinyViT(tv_cfg)
    tv_vars = tv.init(jax.random.PRNGKey(0), px)
    tv_emb = np.asarray(tv.apply(tv_vars, px))

    clip_cfg = CLIPVisionConfig.test_tiny(dtype=jnp.float32)
    clip = CLIPVisionTower(clip_cfg)
    clip_px = fused_preprocess(
        jnp.asarray(views),
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        clip_cfg.image_size,
        dtype=jnp.float32,
    )
    clip_vars = clip.init(jax.random.PRNGKey(0), clip_px)
    clip_emb = np.asarray(
        clip_mean_token_embedding(clip.apply(clip_vars, clip_px))
    )

    sg = SuperGuessr(
        num_cells=16,
        backbone=TinyViT(tv_cfg),
        panorama=True,
        embed_dim=tv_cfg.embed_dim,
        dtype=jnp.float32,
    )
    sg_vars = sg.init(jax.random.PRNGKey(0), pixel_values=px[None])
    _, sg_logits = sg.apply(sg_vars, pixel_values=px[None])
    return {
        "tinyvit_emb": tv_emb,
        "clip_emb": clip_emb,
        "super_guessr_logits": np.asarray(sg_logits),
        "preprocessed_mean": np.asarray(px.mean(axis=(1, 2, 3))),
    }


def test_model_goldens(fixtures_dir):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens not generated yet")
    got = _compute_goldens(fixtures_dir)
    with np.load(GOLDEN_PATH) as z:
        for key in z.files:
            np.testing.assert_allclose(
                got[key],
                z[key],
                atol=5e-4,
                rtol=1e-3,
                err_msg=f"golden mismatch: {key}",
            )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    goldens = _compute_goldens(fixtures)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **goldens)
    print(f"wrote {GOLDEN_PATH}: {[k for k in goldens]}")
