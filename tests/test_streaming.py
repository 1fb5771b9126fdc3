"""Streaming-dataset tests over a file:// object store."""

import os

import numpy as np
import pytest

from geoguessr_ai_tpu.data.s3 import ObjectStore
from geoguessr_ai_tpu.data.streaming import GeoImageStream, PanoramaStream


@pytest.fixture()
def store(tmp_path, fixtures_dir):
    store = ObjectStore(f"file://{tmp_path}/bucket")
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    items = []
    rng = np.random.default_rng(0)
    for i in range(5):
        lat, lon = float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))
        headings = (0, 90, 180, 270) if i != 4 else (0, 90)  # one incomplete
        for h in headings:
            items.append((lat, lon, h, blob))
    store.write_manifest(store.upload_images(items, threads=2))
    store.merge_snapshot()
    return store


def test_geo_image_stream(store, tmp_path):
    stream = GeoImageStream(
        store, 64, cache_dir=str(tmp_path / "cache"), shard=0, num_shards=1
    )
    items = list(stream)
    assert len(items) == 18  # 4x4 + 2
    img, target = items[0]
    assert img.shape == (64, 64, 3)
    assert img.mean() > 10  # decoded, not placeholder
    assert set(target) >= {"lat", "lon", "location_id", "heading"}
    # cache populated; second pass served from disk
    assert len(os.listdir(tmp_path / "cache")) == 18
    items2 = list(stream)
    assert len(items2) == 18


def test_image_stream_sharding(store, tmp_path):
    a = list(
        GeoImageStream(
            store, 32, cache_dir=str(tmp_path / "c0"), shard=0, num_shards=2
        )
    )
    b = list(
        GeoImageStream(
            store, 32, cache_dir=str(tmp_path / "c1"), shard=1, num_shards=2
        )
    )
    assert len(a) + len(b) == 18
    assert abs(len(a) - len(b)) <= 1


def test_panorama_stream_complete_only(store, tmp_path):
    stream = PanoramaStream(
        store, 48, cache_dir=str(tmp_path / "cache"), shard=0, num_shards=1
    )
    panos = list(stream)
    assert len(panos) == 4  # the 2-heading location is dropped
    views, target = panos[0]
    assert views.shape == (4, 48, 48, 3)
    assert target["headings"] == [0, 90, 180, 270]
    assert len(stream) == 4


def test_missing_blob_black_placeholder(store, tmp_path):
    # delete one object to force the fallback
    df = store.load_latest_snapshot_df()
    row = df.iloc[0]
    from geoguessr_ai_tpu.data.s3 import image_key

    store.fs.rm(store._p(image_key(row["location_id"], row["heading"])))
    stream = GeoImageStream(
        store, 32, cache_dir=str(tmp_path / "cache"), shard=0, num_shards=1
    )
    imgs = [img for img, t in stream]
    assert any((img == 0).all() for img in imgs)
    assert sum(1 for img in imgs if img.mean() > 10) == 17
