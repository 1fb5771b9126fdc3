"""run_inference library-surface test (tiny backbone, CPU)."""

import os

import numpy as np
import pytest


def test_run_inference_signature_and_result(fixtures_dir):
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    import inference
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

    orig = coord.build_backbone
    coord.build_backbone = lambda cfg: (
        TinyViT(TinyViTConfig.test_tiny(dtype=jnp.float32)),
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        64,
    )
    inference._ENGINES.clear()
    try:
        paths = [
            os.path.join(fixtures_dir, f"heading={h:03d}.jpg")
            for h in (0, 90, 180, 270)
        ]
        lat, lon, top_ids, top_probs = inference.run_inference(paths)
        assert -90 <= lat <= 90 and -180 <= lon <= 180
        assert len(top_ids) == len(top_probs) == 5
        assert all(0 <= p <= 1 for p in top_probs)
        # engine is cached: second call reuses it (reference rebuilds per
        # call site — explicitly avoided here, SURVEY.md §3.3)
        assert len(inference._ENGINES) == 1
        inference.run_inference(paths[:1])
        assert len(inference._ENGINES) == 1
    finally:
        coord.build_backbone = orig
        inference._ENGINES.clear()
