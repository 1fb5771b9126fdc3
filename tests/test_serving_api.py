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
