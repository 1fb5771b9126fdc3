"""Collection loop + local-folder ingestion tests (fake SV API)."""

import os

import numpy as np
import pytest

from geoguessr_ai_tpu.acquisition.collect import collect_points
from geoguessr_ai_tpu.acquisition.sampling import CollectionLedger
from geoguessr_ai_tpu.acquisition.street_view import RateLimitError
from geoguessr_ai_tpu.data.s3 import ObjectStore


@pytest.fixture()
def blob(fixtures_dir):
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        return f.read()


def _fake_fetch(blob, fail_lats=(), limit_lats=()):
    def fetch(lat, lon, api_key, secret=None, yaw_seed=0.0, session=None):
        if lat in limit_lats:
            raise RateLimitError("403")
        if lat in fail_lats:
            return {}, []
        return {"status": "OK"}, [
            ((yaw_seed + k * 90.0) % 360.0, blob) for k in range(4)
        ]

    return fetch


def test_collect_points_end_to_end(tmp_path, blob):
    store = ObjectStore(f"file://{tmp_path}/bucket")
    ledger = CollectionLedger(
        str(tmp_path / "collected.txt"), str(tmp_path / "failed.txt")
    )
    pts = np.array([[10.0, 50.0], [11.0, 51.0], [12.0, 52.0]])
    out = collect_points(
        pts,
        store,
        "KEY",
        ledger=ledger,
        batch_size=2,
        seed=0,
        fetch_fn=_fake_fetch(blob, fail_lats=(51.0,)),
    )
    # 2 collected points flush exactly once at batch_size=2
    assert out == {"collected": 2, "failed": 1, "batches": 1}
    snap_key = store.merge_snapshot()
    df = store.load_latest_snapshot_df()
    assert len(df) == 8  # 2 panoramas x 4 headings
    # resume: everything ledgered, nothing left to collect
    out2 = collect_points(
        pts, store, "KEY", ledger=ledger, fetch_fn=_fake_fetch(blob)
    )
    assert out2["collected"] == 0 and out2["failed"] == 0


def test_collect_points_rate_limit_flushes(tmp_path, blob):
    store = ObjectStore(f"file://{tmp_path}/bucket")
    pts = np.array([[10.0, 50.0], [11.0, 99.0]])  # second point rate-limits
    with pytest.raises(RateLimitError):
        collect_points(
            pts,
            store,
            "KEY",
            batch_size=10,
            fetch_fn=_fake_fetch(blob, limit_lats=(99.0,)),
        )
    # the first point's images were flushed before raising
    store.merge_snapshot()
    assert len(store.load_latest_snapshot_df()) == 4


def test_ingest_local_folder(tmp_path, blob):
    store = ObjectStore(f"file://{tmp_path}/bucket")
    src = tmp_path / "imgs"
    src.mkdir()
    for h in (0, 90, 180, 270):
        (src / f"streetview_59.9139_10.7522_heading_{h}.jpg").write_bytes(
            blob
        )
    (src / "notes.txt").write_text("ignored")
    n = store.ingest_local_folder(str(src), threads=2)
    assert n == 4
    store.merge_snapshot()
    df = store.load_latest_snapshot_df()
    assert len(df) == 4
    assert sorted(df["heading"]) == [0, 90, 180, 270]
