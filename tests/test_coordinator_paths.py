"""Coordinator edge paths: periodic validation, hierarchical fusion,
discover_sqlite override."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def pano_df(fixtures_dir):
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        [
            {
                "location_id": f"l{i}",
                "lat": float(rng.uniform(-50, 50)),
                "lon": float(rng.uniform(-170, 170)),
                "headings": [0, 90, 180, 270],
                "images": [blob] * 4,
            }
            for i in range(32)
        ]
    )


def _tiny_train(cfg, pano_df, **kw):
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

    rng = np.random.default_rng(3)
    n = 8
    table = CentroidTable(
        centroids=rng.uniform(-60, 60, (n, 2)).astype(np.float32),
        country=np.array(["X"] * n),
        admin1=np.array(["Y"] * n),
        cell_id=np.array([str(i) for i in range(n)]),
    )
    orig = coord.build_backbone
    coord.build_backbone = lambda cfg: (
        TinyViT(TinyViTConfig.test_tiny(dtype=jnp.float32)),
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        64,
    )
    try:
        return coord.train(
            cfg, pano_df.iloc[:24], pano_df.iloc[24:], table, **kw
        )
    finally:
        coord.build_backbone = orig


def test_periodic_validation_runs(pano_df):
    from geoguessr_ai_tpu.config import (
        BackboneConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from geoguessr_ai_tpu.utils.logging import MetricsLogger

    logged = []

    class Probe(MetricsLogger):
        def __init__(self):
            super().__init__(stdout_every=1000)

        def log(self, metrics, step):
            logged.append(dict(metrics))
            super().log(metrics, step)

    cfg = TrainConfig(
        batch_size=8,
        num_epochs=1,
        eval_every_steps=2,  # fire mid-epoch validation
        log_every_steps=100,
        mesh=MeshConfig(data_parallel=8),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        model=ModelConfig(
            backbone=BackboneConfig(name="tinyvit", image_size=64, embed_dim=80)
        ),
    )
    summary = _tiny_train(cfg, pano_df, metrics_logger=Probe(), max_steps=3)
    # mid-epoch val at step 2 plus the end-of-epoch val
    val_logs = [m for m in logged if "val_loss" in m]
    assert len(val_logs) >= 2
    assert np.isfinite(summary["val_loss"])


def test_hierarchical_fusion_trains(pano_df):
    from geoguessr_ai_tpu.config import (
        BackboneConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )

    cfg = TrainConfig(
        batch_size=8,
        num_epochs=1,
        eval_every_steps=0,
        mesh=MeshConfig(data_parallel=8),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        model=ModelConfig(
            backbone=BackboneConfig(name="tinyvit", image_size=64, embed_dim=80),
            hierarchical=True,
        ),
    )
    summary = _tiny_train(cfg, pano_df, max_steps=2)
    assert np.isfinite(summary["monitored_value"])


def test_discover_sqlite_env_override(tmp_path, monkeypatch):
    from geoguessr_ai_tpu.train.coordinator import discover_sqlite

    p = tmp_path / "dataset_sqlite_x.sqlite"
    p.write_bytes(b"x")
    monkeypatch.setenv("DATASET_SQLITE_PATH", str(p))
    assert discover_sqlite() == str(p)
    monkeypatch.delenv("DATASET_SQLITE_PATH")
    with pytest.raises(FileNotFoundError):
        discover_sqlite(search_dirs=[str(tmp_path / "empty")])
