#!/usr/bin/env python
"""Build the geocell centroid table + proto_df artifacts from finished
geocell pickles.

Usage:
  python tools/build_centroid_table.py --geocell-dir <dir-of-pickles> \
      [--out-npz data/geocells/centroid_table.npz] \
      [--out-csv data/geocells/proto_df.csv]

The resulting .npz is the only geocell artifact the model loads at
train/serve time (see geoguessr_ai_tpu/geocells/manager.py).
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoguessr_ai_tpu.geocells.manager import GeocellManager


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--geocell-dir", required=True)
    ap.add_argument("--out-npz", default="data/geocells/centroid_table.npz")
    ap.add_argument("--out-csv", default="data/geocells/proto_df.csv")
    args = ap.parse_args()

    mgr = GeocellManager(args.geocell_dir)
    print(f"Loaded {mgr.num_cells} geocells, {len(mgr.point_info)} points")
    tab = mgr.build_centroid_table()
    tab.save(args.out_npz)
    print(f"Wrote centroid table {tab.centroids.shape} -> {args.out_npz}")
    df = mgr.generate_proto_df(args.out_csv)
    print(f"Wrote proto_df ({len(df)} cluster rows) -> {args.out_csv}")


if __name__ == "__main__":
    main()
