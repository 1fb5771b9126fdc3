from geoguessr_ai_tpu.geo.polygon import (  # noqa: F401
    points_in_polygon,
    polygon_area,
    polygon_bbox,
    sample_points_uniform,
)
from geoguessr_ai_tpu.geo.core import (
    haversine,
    haversine_matrix,
    smooth_labels,
    lla2ecef,
    ecef2lla,
    geoguessr_score,
    nearest_centroid_labels,
)

__all__ = [
    "haversine",
    "haversine_matrix",
    "smooth_labels",
    "lla2ecef",
    "ecef2lla",
    "geoguessr_score",
    "nearest_centroid_labels",
    "points_in_polygon",
    "polygon_area",
    "polygon_bbox",
    "sample_points_uniform",
]
