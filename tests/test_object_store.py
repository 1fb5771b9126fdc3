"""ObjectStore tests over the file:// backend (same code path as s3://)."""

import os

import numpy as np
import pytest

from geoguessr_ai_tpu.data.s3 import ObjectStore, image_key, location_id


@pytest.fixture()
def store(tmp_path):
    return ObjectStore(f"file://{tmp_path}/bucket")


def test_location_id_is_stable_and_short():
    a = location_id(59.9139, 10.7522)
    b = location_id(59.9139, 10.7522)
    c = location_id(59.9139, 10.7523)
    assert a == b and a != c
    assert len(a) == 12
    # quantization: 1e-8 deg differences collapse
    assert location_id(59.91390000004, 10.7522) == a


def test_upload_manifest_snapshot_roundtrip(store, fixtures_dir):
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    items = [
        (59.9139, 10.7522, h, blob) for h in (0, 90, 180, 270)
    ] + [(63.4305, 10.3951, 0, blob)]
    manifest = store.upload_images(items, threads=4)
    assert len(manifest) == 5
    store.write_manifest(manifest)
    key = store.merge_snapshot()
    snap = store.load_latest_snapshot_df()
    assert len(snap) == 5
    # dedup on (location_id, heading): re-merge stays 5
    store.write_manifest(manifest)
    store.merge_snapshot()
    assert len(store.load_latest_snapshot_df()) == 5
    # image bytes readable via content address
    lid = location_id(59.9139, 10.7522)
    assert store.read_bytes(image_key(lid, 90)) == blob


def test_random_panorama_download(store, fixtures_dir, tmp_path):
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    items = [(59.9139, 10.7522, h, blob) for h in (0, 90, 180, 270)]
    # holdout data lives in its own prefix tree (no train/val leakage)
    store.write_manifest(store.upload_images(items), holdout=True)
    store.merge_snapshot(holdout=True)
    paths, lat, lon = store.download_random_panorama(
        str(tmp_path / "pano"), holdout=True, seed=0
    )
    assert len(paths) == 4
    assert abs(lat - 59.9139) < 1e-6
    assert all(os.path.getsize(p) > 0 for p in paths)


def test_checkpoint_registry(store, tmp_path):
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "weights.bin").write_bytes(b"abc")
    (ck / "sub").mkdir()
    (ck / "sub" / "meta.json").write_bytes(b"{}")
    store.upload_model_checkpoint(str(ck))
    import time as _t

    _t.sleep(1.1)  # distinct run_ts
    (ck / "weights.bin").write_bytes(b"def")
    store.upload_model_checkpoint(str(ck))
    runs = store.list_model_checkpoints()
    assert len(runs) == 2
    out = store.download_model_checkpoint(str(tmp_path / "dl"), 0)
    assert open(os.path.join(out, "weights.bin"), "rb").read() == b"def"
    out1 = store.download_model_checkpoint(str(tmp_path / "dl1"), 1)
    assert open(os.path.join(out1, "weights.bin"), "rb").read() == b"abc"


def test_sqlite_pointer_roundtrip(store, tmp_path):
    src = tmp_path / "d.sqlite"
    src.write_bytes(b"sqlite-bytes")
    store.publish_sqlite(str(src), "raw")
    out = store.download_latest_sqlite("raw", str(tmp_path / "out.sqlite"))
    assert open(out, "rb").read() == b"sqlite-bytes"


def test_holdout_snapshot_is_isolated(store, fixtures_dir):
    """Holdout snapshots must never absorb training manifests."""
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    store.write_manifest(
        store.upload_images([(10.0, 10.0, 0, blob)]), holdout=False
    )
    store.write_manifest(
        store.upload_images([(20.0, 20.0, 0, blob)]), holdout=True
    )
    store.merge_snapshot(holdout=False)
    store.merge_snapshot(holdout=True)
    train = store.load_latest_snapshot_df(holdout=False)
    hold = store.load_latest_snapshot_df(holdout=True)
    assert set(train["location_id"]) != set(hold["location_id"])
    assert len(hold) == 1 and float(hold.iloc[0]["lat"]) == 20.0


def test_location_id_reference_parity():
    """Byte-exact with the reference's make_location_id (>ii pack)."""
    import hashlib
    import struct

    lat, lon = 59.9139, 10.7522
    want = hashlib.sha1(
        b"geo:v1:"
        + struct.pack(">ii", int(round(lat * 1e7)), int(round(lon * 1e7)))
    ).hexdigest()[:12]
    assert location_id(lat, lon) == want
    with pytest.raises(ValueError):
        location_id(95.0, 0.0)


def test_download_climate_file(store, tmp_path):
    """Climate-raster fetch (reference backend/s3bucket.py:1399-1404):
    store key v1/climate/<name>, idempotent local cache, and
    enrich_dataframe self-provisions through the store."""
    payload = b"II*\x00fake-geotiff"
    store.write_bytes(
        "v1/climate/koppen_geiger_climatezones_1991_2020_1km.tif", payload
    )
    out = str(tmp_path / "koppen_geiger_climatezones_1991_2020_1km.tif")
    got = store.download_climate_file(out)
    assert got == out
    with open(out, "rb") as f:
        assert f.read() == payload
    # idempotent: a second call must not re-download (corrupt the store
    # copy; the cached local file short-circuits)
    store.write_bytes(
        "v1/climate/koppen_geiger_climatezones_1991_2020_1km.tif", b"XX"
    )
    assert store.download_climate_file(out) == out
    with open(out, "rb") as f:
        assert f.read() == payload


def test_enrich_dataframe_degrades_without_climate_store(tmp_path):
    """enrich_dataframe(store=...) must not fail when the store has no
    climate raster — captions just lose the climate clause."""
    import pandas as pd

    from geoguessr_ai_tpu.train.captions import enrich_dataframe

    empty = ObjectStore(f"file://{tmp_path}/empty_bucket")
    df = pd.DataFrame(
        {
            "lat": [59.9],
            "lon": [10.7],
            "batch_date": ["2024-06-01"],
        }
    )
    out = enrich_dataframe(df, store=empty)
    assert "climate_zone" not in out.columns
    assert out["month"].iloc[0] == "June"
