"""Serving API tests (gated on fastapi availability)."""

import numpy as np
import pytest

fastapi = pytest.importorskip("fastapi", reason="fastapi not installed")


class _FakeResult:
    lat = 59.9
    lon = 10.7
    top_ids = [1, 2]
    top_probs = [0.6, 0.2]
    top_countries = ["Norway", "Sweden"]
    top_admin1 = ["Oslo", "Stockholm"]
    embedding = np.zeros(8)


class _FakeEngine:
    image_size = 64

    class table:
        num_cells = 42

    def predict_batch(self, views, view_mask=None):
        # MicroBatcher may deliver several coalesced requests at once
        return [_FakeResult() for _ in range(views.shape[0])]


def test_api_routes(fixtures_dir):
    from fastapi.testclient import TestClient

    from geoguessr_ai_tpu.serving.api import create_app

    app = create_app(engine=_FakeEngine())
    client = TestClient(app)
    assert client.get("/health").json() == {"status": "ok"}
    assert "endpoints" in client.get("/").json()

    import os

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    r = client.post(
        "/submit_image/", files=[("files", ("a.jpg", blob, "image/jpeg"))]
    )
    assert r.status_code == 200
    sid = r.json()["submission_id"]
    pred = client.get(f"/prediction/{sid}").json()
    assert pred["lat"] == 59.9
    assert pred["top"][0]["country"] == "Norway"
    # reference-typo alias
    assert client.get(f"/predicition/{sid}").json() == pred
    # image echo + 404s
    assert client.get(f"/image/{sid}").status_code == 200
    assert client.get("/prediction/999").status_code == 404
    # wrong image count
    r2 = client.post(
        "/submit_image/",
        files=[("files", ("a.jpg", blob, "image/jpeg"))] * 2,
    )
    assert r2.status_code == 400


def test_concurrent_first_requests_share_one_batcher(monkeypatch):
    """The get_batcher check-then-set race (round-3 ADVICE): two threads
    hitting a cold app must construct exactly ONE MicroBatcher (split
    queues would never coalesce) and warmup must have been kicked off."""
    import threading

    from geoguessr_ai_tpu.serving import api as api_mod

    created = []

    class FakeEngine:
        image_size = 8

    class FakeBatcher:
        def __init__(self, engine, **kw):
            created.append(self)
            self.warmed = threading.Event()

        def warmup(self, num_views=4):
            self.warmed.set()

    fastapi = pytest.importorskip("fastapi")
    monkeypatch.setattr(
        "geoguessr_ai_tpu.serving.engine.MicroBatcher", FakeBatcher
    )
    app = api_mod.create_app(engine=FakeEngine())
    barrier = threading.Barrier(2)
    out = []

    def grab():
        barrier.wait()
        out.append(app.state.get_batcher())

    t1, t2 = threading.Thread(target=grab), threading.Thread(target=grab)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(created) == 1
    assert out[0] is out[1]
    assert created[0].warmed.wait(5)
