"""Snapshot -> raw SQLite build over a file:// store."""

import os

import numpy as np

from geoguessr_ai_tpu.data.s3 import ObjectStore
from geoguessr_ai_tpu.data.sqlite_dataset import (
    load_sqlite_panorama_dataset,
)


def test_build_sqlite_from_snapshot(tmp_path, fixtures_dir):
    store = ObjectStore(f"file://{tmp_path}/bucket")
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    rng = np.random.default_rng(0)
    items = []
    for i in range(6):
        lat, lon = float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))
        for h in (0, 90, 180, 270):
            items.append((lat, lon, h, blob))
    store.write_manifest(store.upload_images(items, threads=4))
    store.merge_snapshot()

    telemetry = []
    out = str(tmp_path / "dataset.sqlite")
    written = store.build_sqlite_from_snapshot(
        out, fetch_threads=4, window=10, publish=True,
        log_fn=telemetry.append,
    )
    assert written == 24
    pano = load_sqlite_panorama_dataset(out)
    assert len(pano) == 6
    assert all(len(r.images) == 4 for r in pano.itertuples())
    assert telemetry and telemetry[-1]["processed"] == 24
    # publish=True registered the dataset pointer
    dl = store.download_latest_sqlite("raw", str(tmp_path / "dl.sqlite"))
    assert os.path.getsize(dl) == os.path.getsize(out)
