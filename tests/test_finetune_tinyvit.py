"""Country-classification finetune pipeline test (tiny config, CPU)."""

import os

import numpy as np
import pandas as pd
import pytest


class _StubManager:
    """Geocell-manager stand-in: country by longitude sign."""

    def get_geocell_id(self, point):
        if point["longitude"] > 0:
            return "cell-e", "Eastland", "E1"
        return "cell-w", "Westland", "W1"


@pytest.fixture(scope="module")
def df(fixtures_dir):
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(24):
        lon = float(rng.uniform(1, 10) * (1 if i % 2 else -1))
        rows.append(
            {
                "location_id": f"l{i}",
                "lat": float(rng.uniform(-50, 50)),
                "lon": lon,
                "image": blob,
            }
        )
    return pd.DataFrame(rows)


def test_prepare_country_dataset(df):
    from geoguessr_ai_tpu.train.finetune_tinyvit import (
        prepare_country_dataset,
    )

    train_df, val_df, class_map = prepare_country_dataset(
        df, _StubManager(), min_count=2, val_fraction=0.25
    )
    assert set(class_map) == {"Eastland", "Westland"}
    assert len(train_df) + len(val_df) == 24
    # stratified: both classes in val
    assert set(val_df["country"]) == {"Eastland", "Westland"}


def test_finetune_and_extract(df, tmp_path):
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models import TinyViTConfig
    from geoguessr_ai_tpu.train.finetune_tinyvit import (
        FinetuneConfig,
        extract_embeddings_parquet,
        finetune,
        prepare_country_dataset,
    )

    train_df, val_df, class_map = prepare_country_dataset(
        df, _StubManager(), min_count=2, val_fraction=0.25
    )
    tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
    summary = finetune(
        train_df,
        val_df,
        num_classes=len(class_map),
        cfg=FinetuneConfig(batch_size=4, num_epochs=1, image_size=tv.image_size),
        tinyvit_config=tv,
        checkpoint_dir=str(tmp_path / "ck"),
        class_map=class_map,
        max_steps=3,
    )
    assert np.isfinite(summary["top1"])
    assert summary["best_checkpoint"] is not None
    assert os.path.exists(os.path.join(tmp_path, "ck", "class_map.json"))

    n = extract_embeddings_parquet(
        df.iloc[:6],
        str(tmp_path / "emb.parquet"),
        tinyvit_config=tv,
        params=summary["params"],
        batch_stats=summary["batch_stats"],
        batch_size=3,
    )
    assert n == 6
    out = pd.read_parquet(tmp_path / "emb.parquet")
    assert len(out.iloc[0]["embedding"]) == tv.embed_dim


def test_mmpretrain_export(tmp_path):
    """Reference finetune_tinyvit/mmpretrain_export.py:1-55: CSV manifests
    -> MMPretrain JSON annotations + label map."""
    import json

    import pandas as pd

    from geoguessr_ai_tpu.train.finetune_tinyvit import mmpretrain_export

    tr = tmp_path / "train.csv"
    va = tmp_path / "val.csv"
    pd.DataFrame(
        {"filepath": ["a.jpg", "b.jpg"], "country": ["Norway", "Japan"]}
    ).to_csv(tr, index=False)
    pd.DataFrame({"filepath": ["c.jpg"], "country": ["Japan"]}).to_csv(
        va, index=False
    )
    out = tmp_path / "mm"
    lmap = mmpretrain_export(str(tr), str(va), str(out))
    assert lmap == {"Japan": 0, "Norway": 1}
    train = json.load(open(out / "train.json"))
    assert train[0]["gt_label"] == 1 and train[1]["gt_label"] == 0
    assert all(r["img_path"].startswith("/") for r in train)
    val = json.load(open(out / "val.json"))
    assert val[0]["gt_label"] == 0  # shared label map
    assert json.load(open(out / "label_map.json")) == lmap
