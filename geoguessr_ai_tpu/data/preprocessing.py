"""Dataset preprocessing: cell labeling, heading encoding, aux labels.

Working re-design of the reference's legacy HF-datasets preprocessing
(preprocessing/dataset_preprocessing.py — the PIGEON-paper pipeline):

  * point -> geocell labels with containment + nearest fallback
    (reference uses a shapely STRtree ``covered_by`` query, :72-107;
    here: vectorized bbox prefilter + ray-casting, or nearest centroid
    when no polygon table exists),
  * vectorized bbox labeling (:136-153),
  * sin/cos heading encoding of the 4 panorama rotations (:110-133),
  * multi-task auxiliary label attachment (elevation / population /
    climate / month ..., :189-209) from caller-provided samplers,
  * precomputed-embedding attach (:247-284).
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence

import numpy as np

from geoguessr_ai_tpu.geo.polygon import points_in_polygon


def label_points_by_cells(
    lnglat: np.ndarray,
    cell_polygons: Sequence[Sequence[np.ndarray]],
    cell_centroids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Assign each point the index of the first containing cell; points in
    no polygon fall back to the nearest centroid (reference :72-107).

    Args:
      lnglat: (N, 2) points.
      cell_polygons: per-cell list of rings.
      cell_centroids: (C, 2); computed from polygons when omitted.

    Returns:
      (N,) int64 labels.
    """
    n = len(lnglat)
    labels = np.full(n, -1, np.int64)
    # bbox prefilter per cell (the STRtree role)
    boxes = []
    for rings in cell_polygons:
        pts = np.concatenate([np.asarray(r) for r in rings], axis=0)
        boxes.append(
            (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        )
    for ci, rings in enumerate(cell_polygons):
        todo = np.where(labels < 0)[0]
        if len(todo) == 0:
            break
        b = boxes[ci]
        cand = todo[
            (lnglat[todo, 0] >= b[0])
            & (lnglat[todo, 0] <= b[2])
            & (lnglat[todo, 1] >= b[1])
            & (lnglat[todo, 1] <= b[3])
        ]
        for ring in rings:
            if len(cand) == 0:
                break
            inside = points_in_polygon(lnglat[cand], ring)
            labels[cand[inside]] = ci
            cand = cand[~inside]
    missing = np.where(labels < 0)[0]
    if len(missing):
        if cell_centroids is None:
            cell_centroids = np.stack(
                [
                    np.concatenate([np.asarray(r) for r in rings]).mean(0)
                    for rings in cell_polygons
                ]
            )
        for i in missing:
            d = np.linalg.norm(cell_centroids - lnglat[i], axis=1)
            labels[i] = int(np.argmin(d))
    return labels


def label_points_by_bbox(
    lnglat: np.ndarray, bboxes: np.ndarray
) -> np.ndarray:
    """Vectorized bbox labeling (reference :136-153).

    Args:
      lnglat: (N, 2).
      bboxes: (C, 4) as (lon_min, lat_min, lon_max, lat_max).

    Returns:
      (N,) int64: first matching bbox, -1 if none.
    """
    x = lnglat[:, 0][:, None]
    y = lnglat[:, 1][:, None]
    inside = (
        (x >= bboxes[None, :, 0])
        & (x <= bboxes[None, :, 2])
        & (y >= bboxes[None, :, 1])
        & (y <= bboxes[None, :, 3])
    )  # (N, C)
    any_hit = inside.any(axis=1)
    labels = np.where(any_hit, inside.argmax(axis=1), -1)
    return labels.astype(np.int64)


def encode_headings(headings_deg: np.ndarray) -> np.ndarray:
    """sin/cos-encode panorama headings (reference :110-133).

    Args:
      headings_deg: (..., V) heading angles in degrees.

    Returns:
      (..., V, 2) [sin, cos] features.
    """
    rad = np.deg2rad(np.asarray(headings_deg, np.float64))
    return np.stack([np.sin(rad), np.cos(rad)], axis=-1).astype(np.float32)


def attach_aux_labels(
    df,
    samplers: Mapping[str, Callable[[np.ndarray], np.ndarray]],
):
    """Attach multi-task auxiliary labels (reference :189-209).

    Args:
      df: DataFrame with lat/lon columns.
      samplers: column name -> fn((N,2) lnglat) -> (N,) values.  Typical
        samplers: elevation raster, population raster, Köppen climate
        (train.captions.sample_koppen), month.
    """
    df = df.copy()
    lnglat = df[["lon", "lat"]].to_numpy(np.float64)
    for name, fn in samplers.items():
        df[name] = fn(lnglat)
    return df


def attach_embeddings(
    df,
    embeddings_by_location: Mapping[str, np.ndarray],
    column: str = "embedding",
):
    """Attach precomputed embeddings keyed by location_id
    (reference :247-284).  Rows without embeddings get None."""
    df = df.copy()
    df[column] = [
        embeddings_by_location.get(lid) for lid in df["location_id"]
    ]
    return df
