"""Tests: visualizers, naive cells, voronoi, metrics summary, profiler."""

import json
import os

import numpy as np

from geoguessr_ai_tpu.eval.metrics import (
    geoguessr_score_np,
    haversine_km_np,
    summarize_results,
)
from geoguessr_ai_tpu.geocells.naive_cell import partition
from geoguessr_ai_tpu.geocells.voronoi import voronoi_finite_polygons_2d
from geoguessr_ai_tpu.viz.globe import (
    guesses_layers,
    visualize_geocells,
    visualize_guesses,
    write_globe_html,
)


def test_naive_partition_counts():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (500, 2))
    cells = partition(pts, 16)
    assert len(cells) == 16
    assert sum(len(c) for c in cells) == 500
    # balanced-ish: no cell hoards more than half the points
    assert max(len(c) for c in cells) < 250


def test_voronoi_finite_regions():
    from scipy.spatial import Voronoi

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, (20, 2))
    vor = Voronoi(pts)
    regions, vertices = voronoi_finite_polygons_2d(vor)
    assert len(regions) == 20
    assert all(len(r) >= 3 for r in regions)
    assert np.isfinite(vertices).all()


def test_benchmark_metrics():
    d = haversine_km_np(59.9139, 10.7522, 63.4305, 10.3951)
    assert 385 < d < 400
    assert geoguessr_score_np(0.0) == 5000
    records = [
        {"distance_km": 100.0, "score": 4000, "top1_prob": 0.5},
        {"distance_km": 300.0, "score": 3000, "top1_prob": 0.3},
    ]
    s = summarize_results(records)
    assert s["summary"] is True
    assert s["num_samples"] == 2
    assert s["avg_distance_km"] == 200.0
    assert s["median_distance_km"] == 200.0


def test_visualize_guesses_html(tmp_path):
    records = [
        {
            "gt_lat": 59.9,
            "gt_lon": 10.7,
            "pred_lat": 48.8,
            "pred_lon": 2.3,
            "distance_km": 1343.0,
            "score": 2000,
        },
        {"summary": True, "num_samples": 1},
    ]
    jpath = str(tmp_path / "results.json")
    with open(jpath, "w") as f:
        json.dump(records, f)
    out = visualize_guesses(jpath, str(tmp_path / "globe.html"))
    html = open(out).read()
    assert "deck.gl" in html or "deck" in html
    assert "guess-arcs" in html
    assert "1343 km" in html


def test_visualize_geocells_html(tmp_path):
    from geoguessr_ai_tpu import config
    from geoguessr_ai_tpu.geocells.manager import CentroidTable

    tab = CentroidTable.load(config.CENTROID_TABLE_PATH)
    out = visualize_geocells(
        tab, str(tmp_path / "cells.html"), max_cells=100
    )
    html = open(out).read()
    assert html.count("position") > 0
    assert "geocells" in html


def test_step_profiler_schedule(tmp_path, monkeypatch):
    from geoguessr_ai_tpu.utils import profiling

    events = []
    monkeypatch.setattr(
        profiling.jax.profiler,
        "start_trace",
        lambda d: events.append("start"),
    )
    monkeypatch.setattr(
        profiling.jax.profiler, "stop_trace", lambda: events.append("stop")
    )
    prof = profiling.StepProfiler(
        str(tmp_path), profiling.ProfileSchedule(wait=1, warmup=1, active=2, repeat=2)
    )
    for _ in range(12):
        prof.step()
    # two capture cycles: start/stop twice
    assert events == ["start", "stop", "start", "stop"]


def test_visualize_cell_clusters_html(tmp_path):
    from geoguessr_ai_tpu.geocells.cell import Cell
    from geoguessr_ai_tpu.viz.globe import visualize_cell_clusters

    rng = np.random.default_rng(0)
    pts = [
        (10.0 + float(rng.normal(0, 0.05)), 20.0 + float(rng.normal(0, 0.05)))
        for _ in range(20)
    ] + [
        (11.0 + float(rng.normal(0, 0.05)), 21.0 + float(rng.normal(0, 0.05)))
        for _ in range(20)
    ]
    c = Cell("t", "Testland", "T1", points=pts)
    c.cluster()
    out = visualize_cell_clusters(c, str(tmp_path / "cell.html"))
    html = open(out).read()
    assert '"id": "members"' in html and '"id": "centroids"' in html
    import json as _json
    import re as _re

    spec = _json.loads(
        _re.search(r"const layersSpec = (\[.*?\]);\n", html, _re.S).group(1)
    )
    members = next(s for s in spec if s["id"] == "members")
    cents = next(s for s in spec if s["id"] == "centroids")
    assert len(members["data"]) == 40
    assert len(cents["data"]) == len(c.clusters) >= 1
    # every member carries a cluster label tooltip and no grey (unclustered)
    assert all(m["tooltip"].startswith("cluster ") for m in members["data"])


def test_visualize_admin_regions_html(tmp_path):
    from geoguessr_ai_tpu.viz.globe import visualize_admin_regions

    class _Rec:
        def __init__(self, country, admin1):
            self.country, self.admin1 = country, admin1

    class _Mgr:
        point_info = {
            (10.0, 20.0): _Rec("Norway", "Rogaland"),
            (10.1, 20.1): _Rec("Norway", "Oslo"),
            (-5.0, 30.0): _Rec("Kenya", "Nairobi"),
        }

    out = visualize_admin_regions(_Mgr(), str(tmp_path / "admin.html"))
    html = open(out).read()
    assert "Norway/Rogaland" in html and "Kenya/Nairobi" in html


def test_visualize_finished_geocells(tmp_path):
    """Reference visualize_finished_geocells.py detail view: cluster-
    colored points + point->centroid arrows from proto_df + sv points."""
    import pandas as pd

    from geoguessr_ai_tpu.viz.globe import (
        parse_indices_column,
        visualize_finished_geocells,
    )

    pts = tmp_path / "sv_points.txt"
    pts.write_text("10.0, 20.0\n10.1, 20.1\n-5.0, 30.0\nbad line\n")
    proto = tmp_path / "proto_df.csv"
    pd.DataFrame(
        [
            {
                "geocell_index": 0,
                "country": "X",
                "admin1": "Y",
                "cell_id": "c0",
                "cluster_id": 0,
                "count": 2,
                "indices": "[0, 1]",
                "centroid_lat": 10.05,
                "centroid_lng": 20.05,
            },
            {
                "geocell_index": 1,
                "country": "X",
                "admin1": "Z",
                "cell_id": "c1",
                "cluster_id": 0,
                "count": 1,
                "indices": "[2]",
                "centroid_lat": -5.0,
                "centroid_lng": 30.0,
            },
        ]
    ).to_csv(proto, index=False)
    out = str(tmp_path / "globe.html")
    path = visualize_finished_geocells(str(proto), str(pts), out)
    html = open(path).read()
    assert "LineLayer" in html and "cluster-points" in html
    assert "geocell 0 cluster 0" in html
    assert parse_indices_column("[3, 4]") == [3, 4]
    assert parse_indices_column("7") == [7]
    assert parse_indices_column("") == []


def test_create_sv_points_map(tmp_path):
    """Reference src/point_visualization/visualize_sv_points.py:11 —
    point map with candidate success rate; None on missing input."""
    from geoguessr_ai_tpu.viz.globe import create_sv_points_map

    sv = [{"lat": 59.9, "lon": 10.7}, {"lat": 63.4, "lon": 10.4}]
    cand = [{"lat": 59.9, "lng": 10.7}, {"lat": 60.0, "lng": 9.0},
            {"lat": 61.0, "lng": 8.0}, {"lat": 62.0, "lng": 7.0}]
    svp, cp = tmp_path / "sv.json", tmp_path / "cand.json"
    svp.write_text(json.dumps(sv))
    cp.write_text(json.dumps(cand))
    out = create_sv_points_map(str(svp), str(cp), str(tmp_path / "m.html"))
    html = open(out).read()
    assert "2" in html and "50.0%" in html  # 2/4 success rate in title
    assert "ScatterplotLayer" in html

    assert create_sv_points_map(
        str(tmp_path / "missing.json"), str(cp), str(tmp_path / "x.html")
    ) is None


def test_create_comparison_map(tmp_path):
    """Reference src/point_visualization/compare_point.py:11 — overlay of
    candidate vs verified points; accepts txt ledgers too."""
    from geoguessr_ai_tpu.viz.globe import create_comparison_map

    svp, cp = tmp_path / "sv.txt", tmp_path / "cand.json"
    svp.write_text("59.9, 10.7\nbad line\n63.4, 10.4\n")
    cp.write_text(json.dumps(
        [{"lat": 59.9, "lon": 10.7}, {"lat": 60.0, "lon": 9.0}]
    ))
    out = create_comparison_map(str(cp), str(svp), str(tmp_path / "c.html"))
    html = open(out).read()
    assert "candidate-points" in html and "sv-points" in html
    assert "100.0%" in html  # 2 sv / 2 candidates

    assert create_comparison_map(
        str(tmp_path / "no1.json"), str(tmp_path / "no2.json"),
        str(tmp_path / "c2.html"),
    ) is None
