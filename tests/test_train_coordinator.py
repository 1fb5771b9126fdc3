"""End-to-end coordinator test: synthetic SQLite -> train -> checkpoint ->
resume, all on the 8-device CPU mesh with a tiny backbone."""

import os

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
from geoguessr_ai_tpu.train.checkpoints import (
    CheckpointConfig,
    CheckpointStore,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig

    # monkeypatch-free: use the "none"-style small backbone via image_size 64
    return TrainConfig(
        seed=0,
        batch_size=8,
        num_epochs=2,
        eval_every_steps=0,
        log_every_steps=10,
        keep_last_n=2,
        early_stop_patience=100,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        mesh=MeshConfig(data_parallel=8, model_parallel=1),
        model=ModelConfig(
            backbone=BackboneConfig(
                name="tinyvit", image_size=64, embed_dim=80
            ),
            panorama=True,
        ),
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, fixtures_dir):
    path = str(tmp_path_factory.mktemp("db") / "dataset_sqlite_e2e.sqlite")
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    records = []
    for i in range(24):
        lat = float(rng.uniform(-60, 60))
        lon = float(rng.uniform(-170, 170))
        for h in (0, 90, 180, 270):
            records.append(
                {
                    "location_id": f"loc{i:04d}",
                    "lat": lat,
                    "lon": lon,
                    "heading": h,
                    "image": blob,
                }
            )
    create_sqlite_from_records(path, records)
    return path


@pytest.fixture(scope="module")
def centroid_table():
    rng = np.random.default_rng(3)
    n = 16
    return CentroidTable(
        centroids=np.stack(
            [rng.uniform(-170, 170, n), rng.uniform(-60, 60, n)], axis=-1
        ).astype(np.float32),
        country=np.array(["X"] * n),
        admin1=np.array(["Y"] * n),
        cell_id=np.array([str(i) for i in range(n)]),
    )


def _tiny_train(tiny_cfg, dataset, centroid_table, ckpt_dir, max_steps):
    """Run train() with the test-size TinyViT by patching the builder."""
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

    orig = coord.build_backbone

    def tiny_builder(cfg):
        import dataclasses as dc

        tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
        if getattr(cfg, "qat_storage", False):
            # mirror the real build_backbone: QAT-storage flips the
            # backbone to static quant at the differentiable sites
            from geoguessr_ai_tpu.models.tinyvit import TRAIN_QUANT_SITES

            tv = dc.replace(
                tv, quant_mode="static", quant_sites=TRAIN_QUANT_SITES
            )
        return TinyViT(tv), TINYVIT_NORM_MEAN, TINYVIT_NORM_STD, tv.image_size

    coord.build_backbone = tiny_builder
    try:
        pano = load_sqlite_panorama_dataset(dataset)
        train_df, val_df = split_train_val(pano, 0.25)
        return coord.train(
            tiny_cfg,
            train_df,
            val_df,
            centroid_table,
            checkpoint_dir=ckpt_dir,
            max_steps=max_steps,
        )
    finally:
        coord.build_backbone = orig


def test_train_end_to_end_with_checkpoints(
    tiny_cfg, dataset, centroid_table, tmp_path
):
    ckpt_dir = str(tmp_path / "ckpts")
    summary = _tiny_train(tiny_cfg, dataset, centroid_table, ckpt_dir, 4)
    assert np.isfinite(summary["monitored_value"])
    assert summary["global_step"] >= 2
    # checkpoint layout: last + best + per-epoch dirs
    names = os.listdir(ckpt_dir)
    assert "last" in names and "best" in names
    assert any(n.startswith("epoch_") for n in names)

    # resume: second run starts from saved epoch AND saved global_step
    # (reference restores both, main_coordinator_idun.py:268-283) — step
    # numbering must continue from the checkpoint, not restart at 0
    summary2 = _tiny_train(tiny_cfg, dataset, centroid_table, ckpt_dir, 2)
    assert summary2["epoch"] >= summary["epoch"]
    assert summary2["global_step"] >= summary["global_step"] > 0


def test_checkpoint_store_topk_pruning(tmp_path):
    store = CheckpointStore(
        CheckpointConfig(directory=str(tmp_path), keep_top_k=2)
    )
    state = {"w": np.arange(4.0)}
    best = None
    for epoch, loss in enumerate([5.0, 3.0, 4.0, 2.0]):
        best = store.save_epoch(state, epoch, loss, best)
    assert best == 2.0
    kept = store.kept_epochs()
    # top-2 by min loss: epochs 3 (2.0) and 1 (3.0)
    assert kept == ["epoch_0001_3.000000", "epoch_0003_2.000000"]
    restored, meta = store.restore({"w": np.zeros(4)}, "best")
    np.testing.assert_array_equal(restored["w"], np.arange(4.0))
    assert float(meta["monitored_value"]) == 2.0


def test_checkpoint_store_async_save(tmp_path):
    """async_save=True: identical layout/semantics, background finalize."""
    store = CheckpointStore(
        CheckpointConfig(
            directory=str(tmp_path), keep_top_k=2, async_save=True
        )
    )
    best = None
    for epoch, loss in enumerate([5.0, 3.0, 4.0, float("nan"), 2.0]):
        state = {"w": np.full(4, float(epoch))}
        best = store.save_epoch(state, epoch, loss, best)
    store.wait_until_finished()
    assert best == 2.0
    assert store.kept_epochs() == [
        "epoch_0001_3.000000",
        "epoch_0004_2.000000",
    ]
    # 'last' reflects the newest save (epoch 4, via copy of the epoch dir)
    restored, meta = store.restore({"w": np.zeros(4)}, "last")
    np.testing.assert_array_equal(restored["w"], np.full(4, 4.0))
    assert int(meta["epoch"]) == 4
    # 'best' is the epoch-4 state too (2.0 < 3.0)
    restored, meta = store.restore({"w": np.zeros(4)}, "best")
    assert float(meta["monitored_value"]) == 2.0
    # NaN epoch went to 'last' only at the time (no epoch_0003_* dir)
    assert not any("0003" in n for n in os.listdir(str(tmp_path)))


def test_train_with_clip_backbone_and_freeze(
    tiny_cfg, dataset, centroid_table, tmp_path
):
    """train() over a CLIP tower with the reference finetune freeze
    (encoder.layers[:-1] frozen — the round-1 ADVICE bug path): frozen
    layers must not move, the last layer + head must."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        CLIP_NORM_MEAN,
        CLIP_NORM_STD,
        BackboneConfig,
        ModelConfig,
    )
    from geoguessr_ai_tpu.models import (
        CLIPVisionConfig,
        CLIPVisionTower,
        clip_mean_token_embedding,
    )

    class _ClipEmbed(CLIPVisionTower):
        def __call__(self, pixel_values, train: bool = False):
            return clip_mean_token_embedding(super().__call__(pixel_values))

    cv = dc.replace(CLIPVisionConfig.test_tiny(), dtype=jnp.float32)

    orig = coord.build_backbone

    def clip_builder(cfg):
        return _ClipEmbed(cv), CLIP_NORM_MEAN, CLIP_NORM_STD, cv.image_size

    coord.build_backbone = clip_builder
    captured = {}
    orig_create = coord.create_train_state

    def capture_state(model, variables, *a, **k):
        captured["init_params"] = jax.device_get(variables["params"])
        return orig_create(model, variables, *a, **k)

    coord.create_train_state = capture_state
    try:
        cfg = dc.replace(
            tiny_cfg,
            num_epochs=1,
            model=ModelConfig(
                backbone=BackboneConfig(
                    name="clip",
                    image_size=cv.image_size,
                    embed_dim=cv.hidden_size,
                    freeze_all_but_last_stage=True,
                ),
                panorama=True,
            ),
        )
        pano = load_sqlite_panorama_dataset(dataset)
        train_df, val_df = split_train_val(pano, 0.25)
        summary = coord.train(
            cfg, train_df, val_df, centroid_table,
            checkpoint_dir=str(tmp_path / "ck"), max_steps=2,
        )
    finally:
        coord.build_backbone = orig
        coord.create_train_state = orig_create

    assert np.isfinite(summary["monitored_value"])
    # verify via a fresh restore that frozen layers did not move
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        str(tmp_path / "ck" / "last")
    )
    p0 = captured["init_params"]
    p1 = restored["state"]["params"]
    last = f"layer{cv.num_layers - 1}"

    def changed(a, b):
        import jax as _jax

        return any(
            float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
            for x, y in zip(
                _jax.tree_util.tree_leaves(a), _jax.tree_util.tree_leaves(b)
            )
        )

    assert not changed(p0["backbone"]["layer0"], p1["backbone"]["layer0"])
    assert changed(p0["backbone"][last], p1["backbone"][last])
    assert changed(p0["cell_layer"], p1["cell_layer"])


def test_resume_matches_uninterrupted_training(
    tiny_cfg, dataset, centroid_table, tmp_path
):
    """Checkpoint/resume determinism: train 2 epochs straight vs train 1
    epoch, restart from the checkpoint, train the 2nd — final params
    must match (catches lost optimizer state / rng / epoch-seed drift)."""
    import dataclasses as dc

    import jax
    import orbax.checkpoint as ocp

    def params_after(ck, epochs_first, epochs_total):
        cfg = dc.replace(tiny_cfg, num_epochs=epochs_first)
        _tiny_train(cfg, dataset, centroid_table, ck, None)
        if epochs_first < epochs_total:
            cfg = dc.replace(tiny_cfg, num_epochs=epochs_total)
            _tiny_train(cfg, dataset, centroid_table, ck, None)
        restored = ocp.StandardCheckpointer().restore(
            os.path.join(ck, "last")
        )
        return restored["state"]["params"]

    a = params_after(str(tmp_path / "straight"), 2, 2)
    b = params_after(str(tmp_path / "resumed"), 1, 2)
    for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6, rtol=1e-5
        )


def test_train_qat_storage_calibrates_and_trains(
    tiny_cfg, dataset, centroid_table, tmp_path
):
    """train() with BackboneConfig(qat_storage=True): the coordinator
    calibrates the storage-site amaxes at startup (from the BUILT
    backbone's own config, not a hardcoded preset) and the QAT train
    loop runs finite end-to-end (round-5 train int8-storage lever)."""
    import dataclasses as dc

    cfg = dc.replace(
        tiny_cfg,
        num_epochs=1,
        model=dc.replace(
            tiny_cfg.model,
            backbone=dc.replace(tiny_cfg.model.backbone, qat_storage=True),
        ),
    )
    summary = _tiny_train(
        cfg, dataset, centroid_table, str(tmp_path / "qat"), 3
    )
    assert np.isfinite(summary["monitored_value"])
    assert summary["global_step"] >= 2
