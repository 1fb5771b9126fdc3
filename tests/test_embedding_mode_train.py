"""Embedding-only head training through the REAL train() path (round-2
VERDICT #4/#10): backbone "none" + an embedding SQLite must drive the
full coordinator loop (reference finetune_on_embeddings,
training/train_modes.py:132-160) — previously a NotImplementedError
redirect."""

import numpy as np
import pytest

from geoguessr_ai_tpu.config import (
    BackboneConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from geoguessr_ai_tpu.data.sqlite_dataset import (
    create_sqlite_from_records,
    load_sqlite_panorama_dataset,
    split_train_val,
)
from geoguessr_ai_tpu.geocells.manager import CentroidTable

D = 32
K = 8


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(1)
    return CentroidTable(
        centroids=np.stack(
            [rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], axis=-1
        ).astype(np.float32),
        country=np.array(["X"] * K),
        admin1=np.array(["Y"] * K),
        cell_id=np.array([str(i) for i in range(K)]),
    )


@pytest.fixture(scope="module")
def embedding_dataset(tmp_path_factory, table):
    """Embeddings carry the cell signal: cell c's views cluster around a
    distinct direction, so the head can learn the mapping."""
    path = str(
        tmp_path_factory.mktemp("db") / "dataset_embed_quality.sqlite"
    )
    rng = np.random.default_rng(0)
    protos = rng.normal(0, 1, (K, D)).astype(np.float32)
    records = []
    for i in range(96):
        c = i % K
        lon, lat = table.centroids[c]
        for h in (0, 90, 180, 270):
            vec = protos[c] + rng.normal(0, 0.3, D).astype(np.float32)
            records.append(
                {
                    "location_id": f"loc{i:04d}",
                    "lat": float(lat + rng.normal(0, 0.05)),
                    "lon": float(lon + rng.normal(0, 0.05)),
                    "heading": h,
                    "embedding": vec.tobytes(),
                    "embedding_dim": D,
                }
            )
    create_sqlite_from_records(path, records, embedding=True)
    return path


def test_embedding_only_train_learns(embedding_dataset, table, tmp_path):
    import geoguessr_ai_tpu.train.coordinator as coord

    pano = load_sqlite_panorama_dataset(embedding_dataset)
    assert len(pano) == 96
    train_df, val_df = split_train_val(pano, 0.25)
    cfg = TrainConfig(
        seed=0,
        batch_size=24,
        num_epochs=6,
        eval_every_steps=0,
        log_every_steps=100,
        keep_last_n=1,
        early_stop_patience=100,
        optimizer=OptimizerConfig(learning_rate=5e-3),
        mesh=MeshConfig(data_parallel=8, model_parallel=1),
        model=ModelConfig(
            backbone=BackboneConfig(name="none", embed_dim=D),
            panorama=True,
        ),
    )
    summary = coord.train(
        cfg,
        train_df,
        val_df,
        table,
        checkpoint_dir=str(tmp_path / "ckpts"),
    )
    assert np.isfinite(summary["monitored_value"])
    # learnable signal: held-out top-1 clears 2x chance (chance = 1/8)
    assert summary["val_top1"] > 2.0 / K, summary
    assert summary["epoch/loss"] < np.log(K), summary
