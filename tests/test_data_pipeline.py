"""Data layer tests: SQLite round-trip, panorama grouping, decode, prefetch."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from geoguessr_ai_tpu.data.pipeline import (
    PanoramaBatchIterator,
    prefetch_to_device,
)
from geoguessr_ai_tpu.data.sqlite_dataset import (
    build_panorama_table,
    create_sqlite_from_records,
    load_sqlite_dataset,
    load_sqlite_panorama_dataset,
    read_embeddings,
    split_train_val,
)
from geoguessr_ai_tpu.ops.preprocess import fused_preprocess


@pytest.fixture(scope="module")
def fixture_blobs(fixtures_dir):
    blobs = {}
    for h in (0, 90, 180, 270):
        p = os.path.join(fixtures_dir, f"heading={h:03d}.jpg")
        with open(p, "rb") as f:
            blobs[h] = f.read()
    return blobs


@pytest.fixture(scope="module")
def sqlite_path(tmp_path_factory, fixture_blobs):
    """Synthetic raw-JPEG dataset: 6 locations x 4 headings."""
    path = str(tmp_path_factory.mktemp("db") / "dataset_sqlite_test.sqlite")
    rng = np.random.default_rng(0)
    records = []
    for i in range(6):
        lat = float(rng.uniform(-60, 60))
        lon = float(rng.uniform(-170, 170))
        for h in (0, 90, 180, 270):
            records.append(
                {
                    "location_id": f"loc{i:04d}",
                    "lat": lat,
                    "lon": lon,
                    "heading": h,
                    "capture_date": "2023-01",
                    "pano_id": f"pano{i}",
                    "batch_date": "2023-02",
                    "image": fixture_blobs[h],
                }
            )
    n = create_sqlite_from_records(path, records)
    assert n == 24
    return path


def test_sqlite_roundtrip_and_grouping(sqlite_path):
    df = load_sqlite_dataset(sqlite_path)
    assert len(df) == 24
    assert isinstance(df["image"].iloc[0], bytes)
    pano = build_panorama_table(df)
    assert len(pano) == 6
    assert pano.iloc[0].headings == [0, 90, 180, 270]
    assert all(len(r.images) == 4 for r in pano.itertuples())


def test_split_semantics(sqlite_path):
    pano = load_sqlite_panorama_dataset(sqlite_path)
    train, val = split_train_val(pano, 0.1)
    # no shuffle: train is the head, val the tail
    assert len(train) == 5 and len(val) == 1
    assert val.iloc[0].location_id == pano.iloc[-1].location_id


def test_batch_iterator_shapes_and_padding(sqlite_path):
    pano = load_sqlite_panorama_dataset(sqlite_path)
    it = PanoramaBatchIterator(
        pano, batch_size=4, image_size=128, decode_threads=2
    )
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b["pixel_values"].shape == (4, 4, 128, 128, 3)
    assert b["pixel_values"].dtype == np.uint8
    assert b["view_mask"].shape == (4, 4)
    assert (b["view_mask"] == 1.0).all()
    assert b["coords"].shape == (4, 2)
    # second batch padded from 2 real to 4
    assert batches[1]["num_real"] == 2
    # decoded content is a real photo, not zeros
    assert b["pixel_values"][0, 0].mean() > 10


def test_ragged_panorama_zero_padding(fixture_blobs):
    import pandas as pd

    pano = pd.DataFrame.from_records(
        [
            {
                "location_id": "a",
                "lat": 1.0,
                "lon": 2.0,
                "headings": [0, 90],
                "images": [fixture_blobs[0], fixture_blobs[90]],
            }
        ]
    )
    it = PanoramaBatchIterator(pano, batch_size=1, image_size=64)
    b = next(iter(it))
    np.testing.assert_array_equal(b["view_mask"][0], [1, 1, 0, 0])
    assert (b["pixel_values"][0, 2:] == 0).all()


def test_prefetch_to_device(sqlite_path):
    import jax

    pano = load_sqlite_panorama_dataset(sqlite_path)
    it = PanoramaBatchIterator(pano, batch_size=2, image_size=64)
    got = list(prefetch_to_device(it, depth=2))
    assert len(got) == 3
    assert isinstance(got[0]["pixel_values"], jax.Array)
    assert got[0]["pixel_values"].shape == (2, 4, 64, 64, 3)


def test_fused_preprocess_matches_manual():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 4, 64, 64, 3), dtype=np.uint8)
    mean = (0.5, 0.4, 0.3)
    std = (0.2, 0.25, 0.3)
    out = fused_preprocess(
        jnp.asarray(imgs), mean, std, 64, dtype=jnp.float32
    )
    want = (imgs.astype(np.float32) / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    # resize path: shapes only
    out2 = fused_preprocess(
        jnp.asarray(imgs), mean, std, 32, dtype=jnp.bfloat16
    )
    assert out2.shape == (2, 4, 32, 32, 3)
    assert out2.dtype == jnp.bfloat16


def test_embedding_sqlite_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "emb.sqlite")
    records = []
    for i in range(3):
        emb = rng.normal(size=576).astype(np.float32)
        records.append(
            {
                "location_id": f"loc{i}",
                "lat": 1.0,
                "lon": 2.0,
                "heading": 0,
                "embedding": emb.tobytes(),
                "embedding_dim": 576,
            }
        )
    create_sqlite_from_records(path, records, embedding=True)
    df = read_embeddings(path)
    assert len(df) == 3
    assert df["embedding"].iloc[0].shape == (576,)


def test_native_decoder_agrees_with_pil(fixture_blobs):
    from geoguessr_ai_tpu.data.native import jpeg as native_jpeg

    if not native_jpeg.available():
        pytest.skip("native decoder not built")
    import io

    from PIL import Image

    blob = fixture_blobs[0]
    nat = native_jpeg.decode_resize(blob, 512)
    pil = np.asarray(
        Image.open(io.BytesIO(blob)).convert("RGB").resize(
            (512, 512), Image.BILINEAR
        )
    )
    # DCT-domain downscale + bilinear differs slightly from PIL's box filter
    assert np.abs(nat.astype(int) - pil.astype(int)).mean() < 4.0
    # batch path: bad blob -> zeros, good blobs decoded
    out = native_jpeg.decode_batch([blob, b"notajpeg", blob], 128)
    assert out.shape == (3, 128, 128, 3)
    assert out[0].mean() > 10 and out[2].mean() > 10
    assert (out[1] == 0).all()
