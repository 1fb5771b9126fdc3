"""Cell: the unit of semantic geocell generation.

Re-design of /root/reference/data/geocells/cell.py without the shapely
dependency (optional accelerator): a cell owns training points, admin
polygons, a neighbor set, and OPTICS-derived clusters.  Pickle layout is
compatible with the reference's finished_geocells files (same attribute
names), so GeocellManager loads either lineage.
"""

from __future__ import annotations

import uuid
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _point_latlng(point) -> Tuple[float, float]:
    try:
        return float(point["latitude"]), float(point["longitude"])
    except (TypeError, KeyError, IndexError):
        lat, lng = point
        return float(lat), float(lng)


class Cell:
    """A geocell: points + polygons + neighbors + clusters.

    Attribute names mirror the reference Cell (cell.py:13) for pickle
    compatibility: id, points, curr_coords, polygons, country, admin_1,
    neighbours, point_centroid, geom_centroid, clusters.
    """

    def __init__(
        self,
        name: str,
        country: str,
        admin_1: str,
        points: Optional[List] = None,
        polygons: Optional[List[np.ndarray]] = None,
    ):
        self.id = f"{name}{uuid.uuid1()}"
        self.country = country
        self.admin_1 = admin_1
        self.points = list(points or [])
        self.polygons = list(polygons or [])
        self.neighbours: List["Cell"] = []
        self.clusters: Dict[int, Dict] = {}
        self.current_shape = None
        self._refresh()

    # ------------------------------------------------------------------

    def _refresh(self) -> None:
        self.curr_coords = [
            _point_latlng(p) for p in self.points
        ]  # (lat, lng) tuples
        if self.curr_coords:
            lats, lngs = zip(*self.curr_coords)
            self.point_centroid = [float(np.mean(lngs)), float(np.mean(lats))]
        else:
            self.point_centroid = [None, None]
        self.geom_centroid = self._geometry_centroid()

    def _geometry_centroid(self) -> List:
        if not self.polygons:
            return list(self.point_centroid)
        # area-weighted mean of polygon vertex centroids
        from geoguessr_ai_tpu.geo.polygon import polygon_area

        tot, cx, cy = 0.0, 0.0, 0.0
        for poly in self.polygons:
            poly = np.asarray(poly, np.float64)
            a = max(polygon_area(poly), 1e-12)
            tot += a
            cx += a * float(poly[:, 0].mean())
            cy += a * float(poly[:, 1].mean())
        return [cx / tot, cy / tot]

    def __len__(self) -> int:
        return len(self.points)

    def __repr__(self) -> str:
        return (
            f"Cell({self.id[:18]}…, {self.country}/{self.admin_1}, "
            f"{len(self)} pts, {len(self.clusters)} clusters)"
        )

    # ------------------------------------------------------------------

    def contains(self, lng: float, lat: float) -> bool:
        from geoguessr_ai_tpu.geo.polygon import points_in_polygon

        pt = np.array([[lng, lat]])
        return any(
            points_in_polygon(pt, poly)[0] for poly in self.polygons
        )

    def add_points(self, points: Sequence) -> None:
        self.points.extend(points)
        self._refresh()

    def combine(self, other: "Cell") -> None:
        """Absorb another cell: merge points/polygons, rewire neighbors
        (reference cell.py:77-114)."""
        self.points.extend(other.points)
        self.polygons.extend(other.polygons)
        for n in other.neighbours:
            if n is not self and n not in self.neighbours:
                self.neighbours.append(n)
            if other in getattr(n, "neighbours", []):
                n.neighbours.remove(other)
                if self not in n.neighbours and n is not self:
                    n.neighbours.append(self)
        if other in self.neighbours:
            self.neighbours.remove(other)
        other.points = []
        other.polygons = []
        other.neighbours = []
        self._refresh()

    # ------------------------------------------------------------------

    def cluster(
        self, xi: float = 0.05, min_samples: int = 5,
        min_cluster_size: float = 0.05,
    ) -> None:
        """OPTICS-cluster the member points into self.clusters
        (reference cell.py:181-215: OPTICS(min_samples=5, xi,
        min_cluster_size=0.05)); noise points join the nearest cluster,
        or everything forms cluster 0 when OPTICS finds none."""
        coords = np.array(self.curr_coords, np.float64)  # (N, 2) lat,lng
        if len(coords) == 0:
            self.clusters = {}
            return
        labels = np.zeros(len(coords), np.int64)
        if len(coords) > min_samples:
            from sklearn.cluster import OPTICS

            labels = OPTICS(
                min_samples=min_samples,
                xi=xi,
                min_cluster_size=min_cluster_size,
            ).fit_predict(coords)
            if (labels >= 0).any():
                # assign noise to nearest cluster centroid
                cluster_ids = np.unique(labels[labels >= 0])
                cents = np.stack(
                    [coords[labels == c].mean(axis=0) for c in cluster_ids]
                )
                noise = np.where(labels < 0)[0]
                for i in noise:
                    d = np.linalg.norm(cents - coords[i], axis=1)
                    labels[i] = cluster_ids[int(np.argmin(d))]
            else:
                labels = np.zeros(len(coords), np.int64)
        self.clusters = {}
        for cid in np.unique(labels):
            idx = np.where(labels == cid)[0]
            pts = [self.points[i] for i in idx]
            self.clusters[int(cid)] = {
                "points": pts,
                "centroid": coords[idx].mean(axis=0)[::-1].tolist(),  # lng,lat
                "hashes": {hash(_point_latlng(p)) for p in pts},
            }

    def split_cell(
        self, min_split_points: int = 10, fine_xi: float = 0.00005
    ) -> List["Cell"]:
        """Spawn child cells from clusters with > min_split_points points;
        children re-cluster with a finer xi (reference cell.py:133-169).
        The parent keeps the remaining points."""
        if not self.clusters:
            self.cluster()
        children: List[Cell] = []
        keep_points: List = []
        for cid, cdata in sorted(self.clusters.items()):
            if len(cdata["points"]) > min_split_points and len(
                self.clusters
            ) > 1:
                child = Cell(
                    f"{self.country}_{self.admin_1}_split",
                    self.country,
                    self.admin_1,
                    points=cdata["points"],
                )
                child.neighbours = [self]
                child.cluster(xi=fine_xi)
                children.append(child)
            else:
                keep_points.extend(cdata["points"])
        if children:
            # parent keeps its remainder; if nothing remains it absorbs the
            # first child back so no empty cell survives
            self.points = keep_points
            if not self.points:
                first = children.pop(0)
                self.points = first.points
            self.neighbours.extend(children)
            self._refresh()
            self.cluster()
        return children

    def clean_cell_before_saving(self) -> None:
        """Drop geometry for pickling (reference cell.py:217-224)."""
        self.current_shape = np.array([None], dtype=object)
        self.neighbours = []
