"""Point sampling for data acquisition.

Reference behavior: src/point_sampling_algorithm/sampling_pipeline.py —
rejection-sample uniform points inside admin polygons, area-weighted across
multipolygons with a density scalar (:14-29, :147-177), validate candidates
against the Street View metadata API with threaded retries/backoff
(:88-124), dedupe at 1e-6 degrees (:121-124).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Optional, Sequence

import numpy as np

from geoguessr_ai_tpu.geo.polygon import polygon_area, sample_points_uniform


def sample_points_in_polygons(
    polygons: Sequence[np.ndarray],
    total_points: int,
    density_scalar: float = 1.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Area-weighted uniform sampling across a multipolygon.

    Args:
      polygons: list of (M, 2) rings in (lon, lat) degrees.
      total_points: number of points to draw (scaled by density_scalar).

    Returns:
      (N, 2) sampled (lon, lat) points.
    """
    rng = rng or np.random.default_rng()
    n = max(0, int(round(total_points * density_scalar)))
    if n == 0 or not polygons:
        return np.zeros((0, 2))
    areas = np.array([polygon_area(p) for p in polygons], dtype=np.float64)
    if areas.sum() <= 0:
        return np.zeros((0, 2))
    weights = areas / areas.sum()
    counts = rng.multinomial(n, weights)
    parts = [
        sample_points_uniform(poly, int(c), rng)
        for poly, c in zip(polygons, counts)
        if c > 0
    ]
    if not parts:
        return np.zeros((0, 2))
    return np.concatenate(parts, axis=0)


def dedupe_points(points: np.ndarray, precision: float = 1e-6) -> np.ndarray:
    """Drop near-duplicate points at `precision` degrees
    (reference :121-124)."""
    if len(points) == 0:
        return points
    quant = np.round(np.asarray(points, np.float64) / precision).astype(
        np.int64
    )
    _, keep = np.unique(quant, axis=0, return_index=True)
    return points[np.sort(keep)]


def validate_points(
    points: np.ndarray,
    validator: Callable[[float, float], bool],
    threads: int = 16,
) -> np.ndarray:
    """Keep points the validator confirms (threaded — the validator is
    typically a Street View metadata lookup, reference :88-124)."""

    def check(pt):
        lon, lat = float(pt[0]), float(pt[1])
        try:
            return bool(validator(lat, lon))
        except Exception:
            return False

    with cf.ThreadPoolExecutor(threads) as pool:
        mask = list(pool.map(check, points))
    return points[np.asarray(mask, bool)]


def sample_sv_points_from_polygons(
    polygons: Sequence[np.ndarray],
    total_points: int,
    api_key: Optional[str] = None,
    secret: Optional[str] = None,
    density_scalar: float = 1.0,
    rng: Optional[np.random.Generator] = None,
    threads: int = 16,
) -> np.ndarray:
    """Full pipeline: sample -> dedupe -> (optionally) validate against the
    live Street View metadata API (requires api_key + network).

    Reference entry point: sample_sv_points_from_gadm
    (sampling_pipeline.py:128).
    """
    pts = sample_points_in_polygons(
        polygons, total_points, density_scalar, rng
    )
    pts = dedupe_points(pts)
    if api_key:
        from geoguessr_ai_tpu.acquisition.street_view import fetch_metadata

        pts = validate_points(
            pts,
            lambda lat, lon: fetch_metadata(lat, lon, api_key, secret)
            is not None,
            threads=threads,
        )
    return pts


class CollectionLedger:
    """Resumable collection bookkeeping: collected/failed point files
    (reference street_view_images_collection/main.py:130-141, :245-263)."""

    def __init__(self, collected_path: str, failed_path: str):
        self.collected_path = collected_path
        self.failed_path = failed_path

    @staticmethod
    def _load(path: str) -> set:
        import os

        if not os.path.exists(path):
            return set()
        out = set()
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    lat, lon = line.split(",")[:2]
                    out.add((float(lat), float(lon)))
        return out

    def remaining(self, points: np.ndarray) -> np.ndarray:
        done = self._load(self.collected_path) | self._load(self.failed_path)
        mask = [
            (round(float(p[1]), 6), round(float(p[0]), 6)) not in done
            and (float(p[1]), float(p[0])) not in done
            for p in points
        ]
        return points[np.asarray(mask, bool)]

    def record(self, lat: float, lon: float, ok: bool) -> None:
        path = self.collected_path if ok else self.failed_path
        with open(path, "a") as f:
            f.write(f"{lat},{lon}\n")
