"""Legacy-surface adapter tests: train_model signature + embedding-only
('finetune_on_embeddings') training mode."""

import numpy as np
import pytest


def test_embedding_only_training_mode():
    """Reference train_modes.finetune_on_embeddings: train the head on
    precomputed embeddings (SuperGuessr with backbone=None)."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
    from geoguessr_ai_tpu.models import SuperGuessr
    from geoguessr_ai_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        put_variables,
    )
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import make_sharded_steps

    num_cells, D = 16, 32
    mesh_cfg = MeshConfig(data_parallel=8)
    mesh = create_mesh(mesh_cfg)
    model = SuperGuessr(
        num_cells=num_cells, backbone=None, panorama=True, embed_dim=D,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(2, 4, D)), jnp.float32)
    variables = put_variables(
        model.init(jax.random.PRNGKey(0), embedding=e), mesh, mesh_cfg
    )
    state = create_train_state(
        model, variables, OptimizerConfig(learning_rate=1e-2), 10
    )
    centroids = jnp.asarray(
        rng.uniform(-60, 60, (num_cells, 2)), jnp.float32
    )
    jit_train, jit_eval = make_sharded_steps(mesh, mesh_cfg)
    batch = {
        "embedding": jnp.asarray(rng.normal(size=(16, 4, D)), jnp.float32),
        "coords": jnp.asarray(rng.uniform(-60, 60, (16, 2)), jnp.float32),
    }
    import jax as j

    batch = j.device_put(batch, batch_sharding(mesh, mesh_cfg))
    losses = []
    for _ in range(5):
        state, m = jit_train(state, batch, centroids)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_train_model_signature_adapts(tmp_path, fixtures_dir):
    """train_model accepts the reference-style kwargs and runs."""
    import os

    import jax.numpy as jnp
    import pandas as pd

    from geoguessr_ai_tpu.config import (
        BackboneConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.train.train_eval_loop import train_model

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    pano = pd.DataFrame(
        [
            {
                "location_id": f"l{i}",
                "lat": float(rng.uniform(-50, 50)),
                "lon": float(rng.uniform(-170, 170)),
                "headings": [0, 90, 180, 270],
                "images": [blob] * 4,
            }
            for i in range(16)
        ]
    )
    n = 8
    table = CentroidTable(
        centroids=rng.uniform(-60, 60, (n, 2)).astype(np.float32),
        country=np.array(["X"] * n),
        admin1=np.array(["Y"] * n),
        cell_id=np.array([str(i) for i in range(n)]),
    )
    cfg = TrainConfig(
        batch_size=8,
        eval_every_steps=0,
        mesh=MeshConfig(data_parallel=8),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        model=ModelConfig(
            backbone=BackboneConfig(name="tinyvit", image_size=64, embed_dim=80)
        ),
    )

    orig = coord.build_backbone

    def tiny_builder(_):
        from geoguessr_ai_tpu.config import (
            TINYVIT_NORM_MEAN,
            TINYVIT_NORM_STD,
        )

        tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
        return TinyViT(tv), TINYVIT_NORM_MEAN, TINYVIT_NORM_STD, tv.image_size

    coord.build_backbone = tiny_builder
    try:
        summary = train_model(
            model_cfg=cfg,
            train_dataset=pano.iloc[:12],
            val_dataset=pano.iloc[12:],
            centroid_table=table,
            num_epochs=1,
            batch_size=8,
            learning_rate=5e-4,
            max_steps=1,
        )
    finally:
        coord.build_backbone = orig
    assert np.isfinite(summary["monitored_value"])
    assert summary["global_step"] >= 1
