"""BASELINE config 4 end-to-end: ProtoRefiner + haversine-weighted geocell
training on a SQLite embedding dataset.

embedding SQLite -> head-only SuperGuessr training (smoothed soft-CE) ->
predictions -> prototype-bank refinement.  All on the CPU mesh.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_dataset(tmp_path_factory):
    """3 geocell regions; per-location panorama embeddings correlated with
    the region so the head can actually learn."""
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        create_sqlite_from_records,
    )

    rng = np.random.default_rng(0)
    centers = np.array([[10.0, 60.0], [150.0, -30.0], [-78.0, 0.0]])
    D = 32
    protos = rng.normal(size=(3, D)).astype(np.float32) * 3
    records = []
    for i in range(90):
        c = i % 3
        lon = float(centers[c, 0] + rng.normal() * 2)
        lat = float(centers[c, 1] + rng.normal() * 2)
        for h in (0, 90, 180, 270):
            e = (protos[c] + rng.normal(size=D).astype(np.float32)).astype(
                np.float32
            )
            records.append(
                {
                    "location_id": f"loc{i:04d}",
                    "lat": lat,
                    "lon": lon,
                    "heading": h,
                    "embedding": e.tobytes(),
                    "embedding_dim": D,
                }
            )
    path = str(tmp_path_factory.mktemp("emb") / "emb.sqlite")
    create_sqlite_from_records(path, records, embedding=True)
    return path, centers, protos


def test_embedding_training_and_refinement(emb_dataset):
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
    from geoguessr_ai_tpu.data.sqlite_dataset import read_embeddings
    from geoguessr_ai_tpu.models import SuperGuessr, decode_predictions
    from geoguessr_ai_tpu.models.proto_refiner import (
        ProtoRefiner,
        build_prototype_bank,
    )
    from geoguessr_ai_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        put_variables,
    )
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import make_sharded_steps

    path, centers, protos = emb_dataset
    df = read_embeddings(path)
    # group per location: panorama embedding = (V, D) stack
    pano = (
        df.sort_values(["location_id", "heading"])
        .groupby("location_id")
        .agg(
            lat=("lat", "first"),
            lon=("lon", "first"),
            embedding=("embedding", lambda s: np.stack(s.to_list())),
        )
        .reset_index()
    )
    D = pano["embedding"].iloc[0].shape[-1]

    centroids = jnp.asarray(centers, jnp.float32)
    mesh_cfg = MeshConfig(data_parallel=8)
    mesh = create_mesh(mesh_cfg)
    model = SuperGuessr(
        num_cells=3, backbone=None, panorama=True, embed_dim=D,
        dtype=jnp.float32,
    )
    e0 = jnp.zeros((1, 4, D))
    variables = put_variables(
        model.init(jax.random.PRNGKey(0), embedding=e0), mesh, mesh_cfg
    )
    state = create_train_state(
        model, variables, OptimizerConfig(learning_rate=5e-2), 10
    )
    jit_train, jit_eval = make_sharded_steps(mesh, mesh_cfg)

    # haversine-weighted (smoothed soft-CE) training on the embedding data
    embs = jnp.asarray(np.stack(pano["embedding"].to_list()), jnp.float32)
    coords = jnp.asarray(
        pano[["lon", "lat"]].to_numpy(np.float32), jnp.float32
    )
    batch = jax.device_put(
        {"embedding": embs[:80], "coords": coords[:80]},
        batch_sharding(mesh, mesh_cfg),
    )
    losses = []
    for _ in range(25):
        state, m = jit_train(state, batch, centroids)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8
    assert float(m["top1"]) > 0.8  # the head learned the 3 regions

    # serving decode + refinement
    test_embs = embs[80:]
    test_coords = np.asarray(coords[80:])
    emb_out, logits = model.apply(
        {"params": jax.device_get(state.params)}, embedding=test_embs
    )
    probs, preds, lnglat, topk = decode_predictions(logits, centroids, 3)

    proto_df = pd.DataFrame(
        [
            {
                "geocell_index": c,
                "cluster_id": 0,
                "count": 1,
                "indices": [c],
                "centroid_lat": centers[c, 1],
                "centroid_lng": centers[c, 0],
            }
            for c in range(3)
        ]
    )
    bank = build_prototype_bank(
        proto_df,
        {c: protos[c] for c in range(3)},
        {c: tuple(centers[c]) for c in range(3)},
        num_cells=3,
        embed_dim=D,
        max_protos=2,
    )
    refiner = ProtoRefiner(bank, topk=3)
    fused = np.asarray(test_embs.mean(axis=1))
    coords_out, cells, changed = refiner(
        fused,
        np.asarray(topk.indices),
        np.asarray(topk.values),
        np.asarray(lnglat),
    )
    # refined cells should match the ground-truth regions
    gt_cells = np.argmin(
        np.linalg.norm(
            test_coords[:, None, :] - centers[None, :, :], axis=-1
        ),
        axis=-1,
    )
    assert (cells == gt_cells).mean() > 0.8
