"""Acquisition tests: polygon sampling, dedupe, ledger, URL signing."""

import base64
import hashlib
import hmac
import urllib.parse

import numpy as np

from geoguessr_ai_tpu.acquisition.sampling import (
    CollectionLedger,
    dedupe_points,
    sample_points_in_polygons,
    validate_points,
)
from geoguessr_ai_tpu.acquisition.street_view import (
    build_image_url,
    build_metadata_url,
    heading_block,
    sign_url,
)
from geoguessr_ai_tpu.geo.polygon import (
    points_in_polygon,
    polygon_area,
    sample_points_uniform,
)

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
TRIANGLE = np.array([[20.0, 0.0], [30.0, 0.0], [25.0, 10.0]])


def test_points_in_polygon():
    pts = np.array([[5, 5], [15, 5], [0.001, 0.001], [9.999, 9.999], [-1, 5]])
    mask = points_in_polygon(pts, SQUARE)
    np.testing.assert_array_equal(mask, [True, False, True, True, False])


def test_polygon_area():
    assert abs(polygon_area(SQUARE) - 100.0) < 1e-9
    assert abs(polygon_area(TRIANGLE) - 50.0) < 1e-9


def test_uniform_sampling_inside():
    rng = np.random.default_rng(0)
    pts = sample_points_uniform(TRIANGLE, 200, rng)
    assert len(pts) == 200
    assert points_in_polygon(pts, TRIANGLE).all()


def test_area_weighted_multipolygon():
    rng = np.random.default_rng(1)
    pts = sample_points_in_polygons([SQUARE, TRIANGLE], 900, rng=rng)
    assert len(pts) == 900
    in_sq = points_in_polygon(pts, SQUARE).sum()
    in_tri = points_in_polygon(pts, TRIANGLE).sum()
    # area ratio 100:50 -> about 2:1
    assert 1.5 < in_sq / max(in_tri, 1) < 2.7
    # density scalar scales the count
    half = sample_points_in_polygons(
        [SQUARE], 100, density_scalar=0.5, rng=rng
    )
    assert len(half) == 50


def test_dedupe_points():
    pts = np.array([[1.0, 2.0], [1.0 + 5e-8, 2.0], [1.1, 2.0]])
    out = dedupe_points(pts)
    assert len(out) == 2


def test_validate_points_threaded():
    pts = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    kept = validate_points(pts, lambda lat, lon: lon < 4.0, threads=2)
    assert len(kept) == 2


def test_collection_ledger_resume(tmp_path):
    led = CollectionLedger(
        str(tmp_path / "collected.txt"), str(tmp_path / "failed.txt")
    )
    pts = np.array([[10.0, 59.0], [11.0, 60.0], [12.0, 61.0]])
    assert len(led.remaining(pts)) == 3
    led.record(59.0, 10.0, ok=True)
    led.record(60.0, 11.0, ok=False)
    rem = led.remaining(pts)
    assert len(rem) == 1
    np.testing.assert_allclose(rem[0], [12.0, 61.0])


def test_heading_block():
    assert heading_block(0.0) == [0.0, 90.0, 180.0, 270.0]
    assert heading_block(300.0) == [300.0, 30.0, 120.0, 210.0]


def test_url_signing_known_answer():
    secret = base64.urlsafe_b64encode(b"test-secret-key-123").decode()
    url = "https://maps.googleapis.com/maps/api/streetview?size=640x640&key=K"
    signed = sign_url(url, secret)
    assert signed.startswith(url + "&signature=")
    # independently computed signature
    parsed = urllib.parse.urlparse(url)
    want = base64.urlsafe_b64encode(
        hmac.new(
            base64.urlsafe_b64decode(secret),
            f"{parsed.path}?{parsed.query}".encode(),
            hashlib.sha1,
        ).digest()
    ).decode()
    assert signed.endswith(want)


def test_image_url_parameters():
    url = build_image_url(59.91, 10.75, 123.456, "KEY")
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    assert q["size"] == ["640x640"]
    assert q["fov"] == ["90"]
    assert q["heading"] == ["123.5"]
    assert q["location"] == ["59.91,10.75"]
    assert q["source"] == ["outdoor"]
    murl = build_metadata_url(59.91, 10.75, "KEY")
    assert "metadata" in murl
