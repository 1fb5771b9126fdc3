"""ServingEngine tests on CPU with the test-size backbone."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine():
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    orig = coord.build_backbone

    def tiny(cfg):
        tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
        return TinyViT(tv), TINYVIT_NORM_MEAN, TINYVIT_NORM_STD, tv.image_size

    coord.build_backbone = tiny
    try:
        yield ServingEngine(backbone="tinyvit")
    finally:
        coord.build_backbone = orig


def test_predict_images_four(engine, fixtures_dir):
    paths = [
        os.path.join(fixtures_dir, f"heading={h:03d}.jpg")
        for h in (0, 90, 180, 270)
    ]
    r = engine.predict_images(paths)
    assert -90 <= r.lat <= 90 and -180 <= r.lon <= 180
    assert len(r.top_ids) == 5
    assert abs(sum(r.top_probs) - sum(sorted(r.top_probs))) < 1e-6
    assert r.top_probs == sorted(r.top_probs, reverse=True)
    assert all(isinstance(c, str) for c in r.top_countries)
    # prediction must equal the top-1 cell centroid
    np.testing.assert_allclose(
        [r.lon, r.lat],
        engine.table.centroids[r.top_ids[0]],
        atol=1e-4,
    )


def test_predict_images_single_replicates(engine, fixtures_dir):
    p = os.path.join(fixtures_dir, "heading=000.jpg")
    r = engine.predict_images([p])
    assert len(r.top_ids) == 5
    with pytest.raises(ValueError):
        engine.predict_images([p, p])  # 2 images invalid (must be 1 or 4)


def test_predict_batch_deterministic(engine, fixtures_dir):
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    views = np.stack(
        [
            np.stack([decode_jpeg(blob, engine.image_size)] * 4)
            for _ in range(2)
        ]
    )
    r1, r2 = engine.predict_batch(views)
    assert r1.top_ids == r2.top_ids
    np.testing.assert_allclose(r1.embedding, r2.embedding, atol=1e-5)
