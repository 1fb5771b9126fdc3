"""Semantic geocell generation: the PIGEON combine/cluster/split algorithm.

Re-design of /root/reference/data/geocells/generate_geocells.py.  Input is
admin boundary tables (country -> admin1 -> list of polygon rings) plus the
training points; output is per-country pickles in the finished_geocells
format that GeocellManager consumes.

Pipeline (reference :144-306):
  1. build the admin-level Cell hierarchy + neighbor graph,
  2. assign points hierarchically (containment, nearest-cell fallback),
  3. COMBINE cells under ``min_points`` into a neighbor (BFS),
  4. OPTICS-cluster each cell's points,
  5. SPLIT cells over ``max_points`` into cluster-derived child cells,
  6. save per-country pickles.

Admin boundaries come from any source; ``load_admin_tables_from_gadm``
reads a GADM GeoPackage when shapely/fiona exist, and a plain
dict-of-polygons works everywhere (tests use synthetic squares).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from geoguessr_ai_tpu.config import (
    GENERATOR_MAX_POINTS,
    GENERATOR_MIN_POINTS,
)
from geoguessr_ai_tpu.geo.polygon import points_in_polygon, polygon_bbox
from geoguessr_ai_tpu.geocells.cell import Cell, _point_latlng
from geoguessr_ai_tpu.utils.logging import logger

#: Admin tables type: country -> admin1 -> list of (M, 2) lon/lat rings.
AdminTables = Dict[str, Dict[str, List[np.ndarray]]]


def _bboxes_touch(b1, b2, tol: float = 1e-9) -> bool:
    return not (
        b1[2] < b2[0] - tol
        or b2[2] < b1[0] - tol
        or b1[3] < b2[1] - tol
        or b2[3] < b1[1] - tol
    )


class GenerateGeocells:
    """Builds geocells for one or more countries."""

    def __init__(
        self,
        admin_tables: AdminTables,
        points_by_country: Dict[str, Sequence],
        min_points: int = GENERATOR_MIN_POINTS,
        max_points: int = GENERATOR_MAX_POINTS,
    ):
        """
        Args:
          admin_tables: country -> admin1 -> polygon rings (lon, lat).
          points_by_country: country -> list of points (each a dict/Series
            with latitude/longitude, or a (lat, lng) tuple).
        """
        self.admin_tables = admin_tables
        self.points_by_country = points_by_country
        self.min_points = min_points
        self.max_points = max_points
        self.cells: Dict[str, List[Cell]] = {}

    # -- step 1: init cells + neighbors --------------------------------

    def init_cells(self) -> None:
        for country, admins in self.admin_tables.items():
            cells = []
            for admin1, rings in admins.items():
                cells.append(
                    Cell(admin1, country, admin1, polygons=list(rings))
                )
            # neighbor graph via bbox adjacency (reference uses shape
            # intersection, :215-217; bbox-touch is the dependency-free
            # over-approximation — extra neighbors only widen BFS combine)
            boxes = [
                [polygon_bbox(p) for p in c.polygons] for c in cells
            ]
            for i, ci in enumerate(cells):
                for j in range(i + 1, len(cells)):
                    if any(
                        _bboxes_touch(bi, bj)
                        for bi in boxes[i]
                        for bj in boxes[j]
                    ):
                        ci.neighbours.append(cells[j])
                        cells[j].neighbours.append(ci)
            self.cells[country] = cells

    # -- step 2: assign points ------------------------------------------

    def add_points_to_cells(self) -> None:
        for country, points in self.points_by_country.items():
            cells = self.cells.get(country, [])
            if not cells:
                continue
            latlng = np.array([_point_latlng(p) for p in points])
            if len(latlng) == 0:
                continue
            lnglat = latlng[:, ::-1]
            assigned = np.full(len(points), -1, np.int64)
            for ci, cell in enumerate(cells):
                todo = np.where(assigned < 0)[0]
                if len(todo) == 0:
                    break
                for poly in cell.polygons:
                    inside = points_in_polygon(lnglat[todo], poly)
                    assigned[todo[inside]] = ci
                    todo = todo[~inside]
                    if len(todo) == 0:
                        break
            # nearest-centroid fallback for unassigned points
            centroids = np.array(
                [
                    c.geom_centroid
                    if c.geom_centroid[0] is not None
                    else [0.0, 0.0]
                    for c in cells
                ]
            )
            for i in np.where(assigned < 0)[0]:
                d = np.linalg.norm(centroids - lnglat[i], axis=1)
                assigned[i] = int(np.argmin(d))
            for ci, cell in enumerate(cells):
                cell.add_points(
                    [points[i] for i in np.where(assigned == ci)[0]]
                )

    # -- step 3/4/5: combine, cluster, split ----------------------------

    def combine_small_cells(self) -> None:
        """BFS-merge cells below min_points into a neighbor
        (reference :244-265)."""
        for country, cells in self.cells.items():
            changed = True
            while changed:
                changed = False
                for cell in cells:
                    if 0 < len(cell) < self.min_points:
                        target = None
                        # prefer the smallest non-empty neighbor
                        candidates = [
                            n
                            for n in cell.neighbours
                            if n in cells and n is not cell
                        ]
                        if candidates:
                            target = min(candidates, key=len)
                        if target is None:
                            others = [
                                c for c in cells if c is not cell and len(c)
                            ]
                            if not others:
                                continue
                            target = min(others, key=len)
                        target.combine(cell)
                        changed = True
                cells[:] = [c for c in cells if len(c) > 0]

    def cluster_cells(self) -> None:
        for cells in self.cells.values():
            for cell in cells:
                cell.cluster()

    def split_large_cells(self) -> None:
        """Split cells above max_points (reference :272-286)."""
        for country, cells in self.cells.items():
            out = []
            for cell in cells:
                out.append(cell)
                if len(cell) > self.max_points:
                    out.extend(cell.split_cell())
            self.cells[country] = out

    # -- step 6: save ---------------------------------------------------

    def save(self, out_dir: str) -> List[str]:
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for country, cells in self.cells.items():
            for c in cells:
                c.clean_cell_before_saving()
            path = os.path.join(out_dir, f"geocells_{country}.pickle")
            with open(path, "wb") as f:
                pickle.dump({country: cells}, f)
            paths.append(path)
        return paths

    # -- full pipeline --------------------------------------------------

    def generate_geocells(self, out_dir: Optional[str] = None):
        self.init_cells()
        self.add_points_to_cells()
        self.combine_small_cells()
        self.cluster_cells()
        self.split_large_cells()
        total = sum(len(v) for v in self.cells.values())
        logger.info(
            f"generated {total} geocells across {len(self.cells)} countries"
        )
        if out_dir:
            self.save(out_dir)
        return self.cells


def load_admin_tables_from_gadm(
    gpkg_path: str, countries: Optional[Sequence[str]] = None
) -> AdminTables:
    """Read GADM ADM_1 boundaries from a GeoPackage (requires fiona or
    geopandas — optional; reference parses the GPKG blobs by hand,
    generate_geocells.py:47-142)."""
    import geopandas as gpd  # optional dependency

    gdf = gpd.read_file(gpkg_path, layer="ADM_1")
    if countries:
        gdf = gdf[gdf["COUNTRY"].isin(countries)]
    tables: AdminTables = {}
    for _, row in gdf.iterrows():
        rings = []
        geom = row.geometry
        geoms = getattr(geom, "geoms", [geom])
        for g in geoms:
            rings.append(np.asarray(g.exterior.coords))
        tables.setdefault(row["COUNTRY"], {})[row["NAME_1"]] = rings
    return tables
