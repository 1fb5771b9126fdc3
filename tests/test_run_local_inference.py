"""run_local_inference wrapper test (tiny backbone, synthetic sqlite)."""

import os

import numpy as np
import pytest


def test_random_panorama_inference_record(tmp_path, fixtures_dir):
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        create_sqlite_from_records,
    )
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from run_local_inference import _run_random_panorama_inference

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    recs = []
    for i in range(20):
        lat, lon = float(rng.uniform(-50, 50)), float(rng.uniform(-170, 170))
        for h in (0, 90, 180, 270):
            recs.append(
                dict(
                    location_id=f"l{i:03d}",
                    lat=lat,
                    lon=lon,
                    heading=h,
                    image=blob,
                )
            )
    path = str(tmp_path / "ds.sqlite")
    create_sqlite_from_records(path, recs)

    orig = coord.build_backbone
    coord.build_backbone = lambda cfg: (
        TinyViT(TinyViTConfig.test_tiny(dtype=jnp.float32)),
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        64,
    )
    try:
        rec = _run_random_panorama_inference(sqlite_path=path, seed=1)
    finally:
        coord.build_backbone = orig

    assert {"gt_lat", "gt_lon", "pred_lat", "pred_lon", "distance_km",
            "score", "top1_prob", "top5"} <= set(rec)
    assert 0 <= rec["score"] <= 5000
    assert rec["distance_km"] >= 0
    assert len(rec["top5"]) == 5
    # score formula consistency: 5000 * exp(-d / 1492.7) rounded
    want = round(
        min(5000.0, 5000.0 * np.exp(-rec["distance_km"] / 1492.7))
    )
    assert abs(rec["score"] - want) <= 1

    # globe HTML renders for the record
    from geoguessr_ai_tpu.viz.globe import visualize_single_guess

    out = visualize_single_guess(
        rec["gt_lat"], rec["gt_lon"], rec["pred_lat"], rec["pred_lon"],
        rec["distance_km"], rec["score"], str(tmp_path / "g.html"),
    )
    assert os.path.getsize(out) > 1000
