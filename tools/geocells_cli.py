#!/usr/bin/env python
"""Geocell subsystem CLI.

The equivalent of the reference's 12-mode geocells_entrypoint.py
(data/geocells/geocells_entrypoint.py) as named subcommands:

  generate    — run combine/OPTICS/split over admin tables + points
  proto-df    — emit proto_df.csv from finished pickles
  centroids   — export the centroid-table .npz
  info        — counts per country
  visualize   — geocell globe HTML
  visualize-cell  — one cell's OPTICS clusters (reference cell_visualizer)
  visualize-admin — points colored by admin1 (reference admin_visualizer)
  naive       — naive rectangle partition of a point file
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoguessr_ai_tpu import config as C


def cmd_generate(args):
    from geoguessr_ai_tpu.geocells.generate import (
        GenerateGeocells,
        load_admin_tables_from_gadm,
    )

    with open(args.points) as f:
        pts = [
            {"latitude": float(l.split(",")[0]),
             "longitude": float(l.split(",")[1])}
            for l in f
            if l.strip()
        ]
    tables = load_admin_tables_from_gadm(args.gadm, [args.country])
    gen = GenerateGeocells(tables, {args.country: pts})
    gen.generate_geocells(args.out)


def cmd_proto_df(args):
    from geoguessr_ai_tpu.geocells.manager import GeocellManager

    mgr = GeocellManager(args.geocell_dir)
    df = mgr.generate_proto_df(args.out)
    print(f"{len(df)} cluster rows, {mgr.num_cells} cells -> {args.out}")


def cmd_centroids(args):
    from geoguessr_ai_tpu.geocells.manager import GeocellManager

    mgr = GeocellManager(args.geocell_dir)
    tab = mgr.build_centroid_table()
    tab.save(args.out)
    print(f"{tab.num_cells} centroids -> {args.out}")


def cmd_info(args):
    from geoguessr_ai_tpu.geocells.manager import GeocellManager

    mgr = GeocellManager(args.geocell_dir)
    counts = {}
    for _, country, _, cell in mgr.iter_cells():
        counts[country] = counts.get(country, 0) + 1
    print(json.dumps(
        {"num_cells": mgr.num_cells, "num_points": len(mgr.point_info),
         "per_country": counts}, indent=1))


def cmd_visualize(args):
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.viz.globe import visualize_geocells

    tab = CentroidTable.load(args.centroids)
    print(visualize_geocells(tab, args.out))


def cmd_visualize_cell(args):
    from geoguessr_ai_tpu.geocells.manager import GeocellManager
    from geoguessr_ai_tpu.viz.globe import visualize_cell_clusters

    mgr = GeocellManager(args.geocell_dir)
    for idx, country, admin1, cell in mgr.iter_cells():
        if idx == args.cell_index:
            if not getattr(cell, "clusters", None):
                cell.cluster()
            print(visualize_cell_clusters(cell, args.out))
            return
    raise SystemExit(f"no cell with index {args.cell_index}")


def cmd_visualize_admin(args):
    from geoguessr_ai_tpu.geocells.manager import GeocellManager
    from geoguessr_ai_tpu.viz.globe import visualize_admin_regions

    mgr = GeocellManager(args.geocell_dir)
    print(visualize_admin_regions(mgr, args.out, max_points=args.max_points))


def cmd_naive(args):
    from geoguessr_ai_tpu.geocells.naive_cell import partition

    pts = np.loadtxt(args.points, delimiter=",")  # lat,lon rows
    cells = partition(pts[:, ::-1], args.num_cells)
    for c in cells:
        print(f"{len(c):6d} pts  [{c.lon_min:.2f},{c.lat_min:.2f}]..."
              f"[{c.lon_max:.2f},{c.lat_max:.2f}]")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--gadm", required=True)
    g.add_argument("--country", required=True)
    g.add_argument("--points", required=True, help="lat,lon lines")
    g.add_argument("--out", default=f"{C.GEOCELL_DIR}/finished_geocells")
    g.set_defaults(fn=cmd_generate)

    p = sub.add_parser("proto-df")
    p.add_argument("--geocell-dir", default=f"{C.GEOCELL_DIR}/finished_geocells")
    p.add_argument("--out", default=f"{C.GEOCELL_DIR}/proto_df.csv")
    p.set_defaults(fn=cmd_proto_df)

    c = sub.add_parser("centroids")
    c.add_argument("--geocell-dir", default=f"{C.GEOCELL_DIR}/finished_geocells")
    c.add_argument("--out", default=C.CENTROID_TABLE_PATH)
    c.set_defaults(fn=cmd_centroids)

    i = sub.add_parser("info")
    i.add_argument("--geocell-dir", default=f"{C.GEOCELL_DIR}/finished_geocells")
    i.set_defaults(fn=cmd_info)

    v = sub.add_parser("visualize")
    v.add_argument("--centroids", default=C.CENTROID_TABLE_PATH)
    v.add_argument("--out", default="data/out/geocells_globe.html")
    v.set_defaults(fn=cmd_visualize)

    vc = sub.add_parser("visualize-cell")
    vc.add_argument("--geocell-dir", default=f"{C.GEOCELL_DIR}/finished_geocells")
    vc.add_argument("--cell-index", type=int, required=True)
    vc.add_argument("--out", default="data/out/cell_clusters.html")
    vc.set_defaults(fn=cmd_visualize_cell)

    va = sub.add_parser("visualize-admin")
    va.add_argument("--geocell-dir", default=f"{C.GEOCELL_DIR}/finished_geocells")
    va.add_argument("--max-points", type=int, default=200_000)
    va.add_argument("--out", default="data/out/admin_regions.html")
    va.set_defaults(fn=cmd_visualize_admin)

    n = sub.add_parser("naive")
    n.add_argument("--points", required=True)
    n.add_argument("--num-cells", type=int, default=100)
    n.set_defaults(fn=cmd_naive)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
