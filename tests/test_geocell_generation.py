"""Geocell generation pipeline tests with synthetic admin squares."""

import numpy as np
import pytest

from geoguessr_ai_tpu.geocells.cell import Cell
from geoguessr_ai_tpu.geocells.generate import GenerateGeocells
from geoguessr_ai_tpu.geocells.manager import GeocellManager


def _square(x0, y0, size=10.0):
    return np.array(
        [[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]]
    )


def _points_in(x0, y0, n, size=10.0, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "latitude": float(rng.uniform(y0 + 0.5, y0 + size - 0.5)),
            "longitude": float(rng.uniform(x0 + 0.5, x0 + size - 0.5)),
        }
        for _ in range(n)
    ]


@pytest.fixture()
def setup():
    admin = {
        "Testland": {
            "West": [_square(0, 0)],
            "East": [_square(10, 0)],  # shares an edge with West
            "North": [_square(0, 10)],
        }
    }
    # West: plenty of points; East: too few (combined); North: huge (split)
    points = (
        _points_in(0, 0, 30, seed=1)
        + _points_in(10, 0, 3, seed=2)
        + _points_in(0, 10, 120, seed=3)
    )
    return admin, {"Testland": points}


def test_full_generation_pipeline(setup, tmp_path):
    admin, points = setup
    gen = GenerateGeocells(
        admin, points, min_points=10, max_points=67
    )
    cells = gen.generate_geocells(str(tmp_path / "out"))
    tl = cells["Testland"]
    # East (3 pts) was combined away; North (120) may have split
    assert all(len(c) >= 1 for c in tl)
    total_points = sum(len(c) for c in tl)
    assert total_points == 153
    assert all(c.clusters for c in tl if len(c))
    # no tiny cells survive
    assert all(len(c) >= 10 or len(tl) == 1 for c in tl)

    # pickles load through the manager (round-trip contract)
    mgr = GeocellManager(str(tmp_path / "out"))
    assert mgr.num_cells == len(tl)
    assert len(mgr.point_info) == 153
    tab = mgr.build_centroid_table()
    assert tab.centroids.shape == (len(tl), 2)
    df = mgr.generate_proto_df()
    assert df.geocell_index.nunique() == len(tl)


def test_combine_rewires_neighbors():
    a = Cell("A", "X", "A", points=_points_in(0, 0, 5))
    b = Cell("B", "X", "B", points=_points_in(10, 0, 20, seed=5))
    c = Cell("C", "X", "C", points=_points_in(20, 0, 20, seed=6))
    a.neighbours = [b]
    b.neighbours = [a, c]
    c.neighbours = [b]
    b.combine(a)
    assert len(b) == 25
    assert a not in b.neighbours
    assert len(a) == 0


def test_cluster_and_split():
    # two far-apart blobs -> expect clustering to find structure and split
    pts = _points_in(0, 0, 40, size=2.0, seed=7) + _points_in(
        50, 50, 40, size=2.0, seed=8
    )
    cell = Cell("S", "X", "S", points=pts)
    cell.cluster()
    assert len(cell.clusters) >= 1
    children = cell.split_cell(min_split_points=10)
    total = len(cell) + sum(len(ch) for ch in children)
    assert total == 80
    if children:
        # all children re-clustered
        assert all(ch.clusters for ch in children)
