"""Pure-JAX geodesy core.

Functional, jit/vmap/grad-friendly re-design of the reference geodesy library
(/root/reference/geo_utils.py, models/utils.py:20-57).  All functions are
shape-polymorphic under jit (static ranks), run in the caller's dtype, and use
no Python control flow on traced values, so they fuse into surrounding XLA
programs (e.g. the label-assignment step of training).

Coordinate conventions (matching the reference):
  * points are (lon, lat) in degrees, arrays of shape (..., 2)
  * distances are kilometers
  * the model-side Earth radius is the WGS84 semi-major axis (6378137 m,
    models/utils.py:35); the benchmark-side radius is 6371000 m
    (run_benchmark.py:25-47).  Pass `radius_m` to select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoguessr_ai_tpu.config import (
    EARTH_RADIUS_MODEL_M,
    GEOGUESSR_DECAY_CONSTANT_KM,
    LABEL_SMOOTHING_CONSTANT_KM,
    WGS84_FLATTENING,
)


def _deg2rad(x: jax.Array) -> jax.Array:
    return x * (jnp.pi / 180.0)


def haversine(
    x: jax.Array, y: jax.Array, radius_m: float = EARTH_RADIUS_MODEL_M
) -> jax.Array:
    """Pairwise haversine distance between aligned point sets.

    Args:
      x: (..., 2) points as (lon, lat) degrees.
      y: (..., 2) points as (lon, lat) degrees (same shape as x).
      radius_m: Earth radius in meters.

    Returns:
      (...,) distances in km.  Reference behavior: geo_utils.py:44-64.
    """
    x_rad, y_rad = _deg2rad(x), _deg2rad(y)
    delta = y_rad - x_rad
    a = (
        jnp.sin(delta[..., 1] / 2) ** 2
        + jnp.cos(x_rad[..., 1])
        * jnp.cos(y_rad[..., 1])
        * jnp.sin(delta[..., 0] / 2) ** 2
    )
    c = 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    return radius_m * c / 1000.0


def haversine_matrix(
    x: jax.Array, y: jax.Array, radius_m: float = EARTH_RADIUS_MODEL_M
) -> jax.Array:
    """All-pairs haversine distances.

    Unlike the reference (models/utils.py:39-57, which takes y transposed as
    (2, M)), both inputs here are (N, 2) / (M, 2) point lists — the transpose
    lives inside, where XLA fuses it for free.

    Args:
      x: (N, 2) (lon, lat) degrees.
      y: (M, 2) (lon, lat) degrees.

    Returns:
      (N, M) distances in km.
    """
    x_rad, y_rad = _deg2rad(x), _deg2rad(y)
    dlon = x_rad[:, None, 0] - y_rad[None, :, 0]
    dlat = x_rad[:, None, 1] - y_rad[None, :, 1]
    p = jnp.cos(x_rad[:, 1])[:, None] * jnp.cos(y_rad[:, 1])[None, :]
    a = jnp.sin(dlat / 2) ** 2 + p * jnp.sin(dlon / 2) ** 2
    c = 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    return radius_m * c / 1000.0


def smooth_labels(
    distances: jax.Array,
    smoothing_km: float = LABEL_SMOOTHING_CONSTANT_KM,
) -> jax.Array:
    """Haversine label smoothing over geocell centroids.

    smoothed = exp(-(d - min(d)) / smoothing_km), NaN/Inf mapped to 0.
    Reference behavior: models/utils.py:20-32 with constant config.py:52.

    Args:
      distances: (..., num_cells) km distances from each sample to each
        geocell centroid.

    Returns:
      (..., num_cells) unnormalized soft labels in (0, 1].
    """
    adj = distances - jnp.min(distances, axis=-1, keepdims=True)
    smoothed = jnp.exp(-adj / smoothing_km)
    return jnp.nan_to_num(smoothed, nan=0.0, posinf=0.0, neginf=0.0)


def lla2ecef(
    coords: jax.Array, radius_m: float = EARTH_RADIUS_MODEL_M
) -> jax.Array:
    """(lon, lat) degrees -> ECEF (x, y, z) meters on the WGS84 ellipsoid.

    Reference behavior: geo_utils.py:110-157.

    Args:
      coords: (..., 2) (lon, lat) degrees.

    Returns:
      (..., 3) ECEF coordinates in meters.
    """
    rad = _deg2rad(coords)
    cos_lat = jnp.cos(rad[..., 1])
    sin_lat = jnp.sin(rad[..., 1])
    ff = (1.0 - WGS84_FLATTENING) ** 2
    c = 1.0 / jnp.sqrt(cos_lat**2 + ff * sin_lat**2)
    s = c * ff
    x = radius_m * c * cos_lat * jnp.cos(rad[..., 0])
    y = radius_m * c * cos_lat * jnp.sin(rad[..., 0])
    z = radius_m * s * sin_lat
    return jnp.stack([x, y, z], axis=-1)


def ecef2lla(
    coords: jax.Array,
    radius_m: float = EARTH_RADIUS_MODEL_M,
    num_iters: int = 5,
) -> jax.Array:
    """ECEF (x, y, z) meters -> (lon, lat) degrees via Bowring's fixed-point
    iteration.

    The reference (geo_utils.py:197-278) runs a data-dependent while loop on
    host; here the iteration count is static (`num_iters`, reference also caps
    at 5) and the body is a `lax.fori_loop`, so the whole conversion compiles
    into a single XLA program.

    Args:
      coords: (..., 3) ECEF meters.

    Returns:
      (..., 2) (lon, lat) degrees.
    """
    a = radius_m
    f = WGS84_FLATTENING
    b = (1.0 - f) * a
    e2 = f * (2.0 - f)
    ae2 = a * e2
    bep2 = b * e2 / (1.0 - e2)

    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    lon = jnp.arctan2(y, x)
    rho = jnp.sqrt(x**2 + y**2)

    # Bowring 1985 starting values.
    r = jnp.sqrt(rho**2 + z**2)
    u = a * rho
    v = b * z * (1.0 + bep2 / jnp.maximum(r, 1e-9))

    def norm_cs(u, v):
        # (cos, sin) of the angle whose tangent is v/u, sign-correct.
        hyp = jnp.sqrt(u**2 + v**2)
        hyp = jnp.maximum(hyp, 1e-30)
        return u / hyp, v / hyp

    cosbeta, sinbeta = norm_cs(u, v)

    def body(_, cs):
        cosb, sinb = cs
        u = rho - ae2 * cosb**3
        v = z + bep2 * sinb**3
        return norm_cs(a * u, b * v)

    cosbeta, sinbeta = jax.lax.fori_loop(
        0, num_iters, body, (cosbeta, sinbeta)
    )
    u = rho - ae2 * cosbeta**3
    v = z + bep2 * sinbeta**3
    lat = jnp.arctan2(v, u)
    return jnp.stack([lon, lat], axis=-1) * (180.0 / jnp.pi)


def geoguessr_score(
    distance_km: jax.Array,
    decay_km: float = GEOGUESSR_DECAY_CONSTANT_KM,
) -> jax.Array:
    """GeoGuessr score: clamp(5000 * exp(-d / decay), 0, 5000).

    Reference behavior: run_benchmark.py:50-65 with config.py:49.
    """
    return jnp.clip(5000.0 * jnp.exp(-distance_km / decay_km), 0.0, 5000.0)


def nearest_centroid_labels(
    coords: jax.Array,
    centroids: jax.Array,
    radius_m: float = EARTH_RADIUS_MODEL_M,
) -> jax.Array:
    """Assign each (lon, lat) sample to its nearest geocell centroid.

    This is the on-device replacement for the reference's per-batch
    host computation (main_coordinator_idun.py:343-351): label = argmin over
    the (B, num_cells) haversine matrix.

    Args:
      coords: (B, 2) (lon, lat) degrees.
      centroids: (num_cells, 2) (lon, lat) degrees.

    Returns:
      (B,) int32 geocell indices.
    """
    d = haversine_matrix(coords, centroids, radius_m=radius_m)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)
