"""Deterministic unit tests for the geo core against reference formulas.

The expected values are computed with independent numpy implementations of the
published formulas (haversine with R=6378137, WGS84 ECEF) and a handful of
known city-pair distances, per SURVEY.md §4's guidance to test what the
reference never did.
"""

import numpy as np
import jax.numpy as jnp

from geoguessr_ai_tpu import config
from geoguessr_ai_tpu.geo import (
    ecef2lla,
    geoguessr_score,
    haversine,
    haversine_matrix,
    lla2ecef,
    nearest_centroid_labels,
    smooth_labels,
)

R_KM = config.EARTH_RADIUS_MODEL_M / 1000.0

# (lon, lat) degrees
OSLO = (10.7522, 59.9139)
TRONDHEIM = (10.3951, 63.4305)
SYDNEY = (151.2093, -33.8688)
QUITO = (-78.4678, -0.1807)


def np_haversine(x, y, r_km=R_KM):
    x, y = np.radians(np.asarray(x, np.float64)), np.radians(
        np.asarray(y, np.float64)
    )
    dlon = y[..., 0] - x[..., 0]
    dlat = y[..., 1] - x[..., 1]
    a = (
        np.sin(dlat / 2) ** 2
        + np.cos(x[..., 1]) * np.cos(y[..., 1]) * np.sin(dlon / 2) ** 2
    )
    return r_km * 2 * np.arcsin(np.sqrt(a))


def test_haversine_city_pairs():
    x = np.array([OSLO, SYDNEY], dtype=np.float32)
    y = np.array([TRONDHEIM, QUITO], dtype=np.float32)
    got = np.asarray(haversine(jnp.array(x), jnp.array(y)))
    want = np_haversine(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # Oslo-Trondheim is ~392 km at this Earth radius
    assert 385 < got[0] < 400


def test_haversine_zero_distance():
    x = np.array([OSLO], dtype=np.float32)
    got = np.asarray(haversine(jnp.array(x), jnp.array(x)))
    assert got[0] == 0.0


def test_haversine_matrix_matches_pairwise():
    rng = np.random.default_rng(0)
    x = np.stack(
        [rng.uniform(-180, 180, 16), rng.uniform(-85, 85, 16)], axis=-1
    ).astype(np.float32)
    y = np.stack(
        [rng.uniform(-180, 180, 32), rng.uniform(-85, 85, 32)], axis=-1
    ).astype(np.float32)
    mat = np.asarray(haversine_matrix(jnp.array(x), jnp.array(y)))
    assert mat.shape == (16, 32)
    want = np_haversine(x[:, None, :], y[None, :, :])
    np.testing.assert_allclose(mat, want, rtol=2e-3, atol=0.5)


def test_haversine_matrix_antipodal_max():
    x = np.array([[0.0, 0.0]], dtype=np.float32)
    y = np.array([[180.0, 0.0]], dtype=np.float32)
    d = float(haversine_matrix(jnp.array(x), jnp.array(y))[0, 0])
    np.testing.assert_allclose(d, np.pi * R_KM, rtol=1e-4)


def test_smooth_labels_reference_semantics():
    d = jnp.array([[100.0, 165.0, 100.0 + 65.0 * 3]])
    s = np.asarray(smooth_labels(d))
    # min-distance cell gets weight 1.0; others decay exp(-(d-dmin)/65)
    np.testing.assert_allclose(s[0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(s[0, 1], np.exp(-1.0), rtol=1e-5)
    np.testing.assert_allclose(s[0, 2], np.exp(-3.0), rtol=1e-5)


def test_smooth_labels_handles_nonfinite():
    d = jnp.array([[0.0, jnp.inf, jnp.nan]])
    s = np.asarray(smooth_labels(d))
    assert np.isfinite(s).all()


def test_lla2ecef_known_points():
    # Equator/prime meridian -> (a, 0, 0); north pole -> (0, 0, b)
    a = config.EARTH_RADIUS_MODEL_M
    b = a * (1.0 - config.WGS84_FLATTENING)
    pts = jnp.array([[0.0, 0.0], [0.0, 90.0], [90.0, 0.0]])
    ecef = np.asarray(lla2ecef(pts))
    np.testing.assert_allclose(ecef[0], [a, 0, 0], atol=1.0)
    np.testing.assert_allclose(ecef[1], [0, 0, b], atol=1.0)
    np.testing.assert_allclose(ecef[2], [0, a, 0], atol=1.0)


def test_ecef_roundtrip():
    rng = np.random.default_rng(1)
    lla = np.stack(
        [rng.uniform(-179, 179, 64), rng.uniform(-85, 85, 64)], axis=-1
    ).astype(np.float32)
    back = np.asarray(ecef2lla(lla2ecef(jnp.array(lla))))
    # float32 round-trip: within ~1e-2 degrees (~1 km)
    np.testing.assert_allclose(back, lla, atol=2e-2)


def test_geoguessr_score():
    np.testing.assert_allclose(float(geoguessr_score(jnp.array(0.0))), 5000.0)
    d = config.GEOGUESSR_DECAY_CONSTANT_KM
    np.testing.assert_allclose(
        float(geoguessr_score(jnp.array(d))), 5000.0 * np.exp(-1.0), rtol=1e-5
    )
    assert float(geoguessr_score(jnp.array(1e9))) == 0.0


def test_nearest_centroid_labels():
    centroids = jnp.array(
        [OSLO, TRONDHEIM, SYDNEY, QUITO], dtype=jnp.float32
    )
    samples = jnp.array(
        [
            [10.74, 59.92],  # near Oslo
            [151.0, -33.9],  # near Sydney
            [10.40, 63.42],  # near Trondheim
        ],
        dtype=jnp.float32,
    )
    labels = np.asarray(nearest_centroid_labels(samples, centroids))
    np.testing.assert_array_equal(labels, [0, 2, 1])
    assert labels.dtype == np.int32
