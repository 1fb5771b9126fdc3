#!/usr/bin/env python
"""Build the ProtoRefiner prototype bank from an embedding SQLite + the
finished geocells.

The TPU equivalent of the reference's prototype precompute
(pre_compute_protos.slurm + proto_refiner.load_prototypes): per-cluster
mean embeddings + member-coordinate centroids, padded into the fixed-shape
bank artifact (data/geocells/prototype_bank.npz) that the vectorized
refiner gathers on device.

Cluster membership is joined by COORDINATES through the GeocellManager's
point index (the proto_df 'indices' column refers to row positions of the
original training table, which the embedding SQLite does not share — a
positional join would average unrelated images).  Per location, the (up
to) 4 heading embeddings are mean-fused first, matching the panorama
embedding the refiner receives at inference.

Usage:
  python tools/build_prototype_bank.py --embeddings emb.sqlite \
      --geocell-dir data/geocells/finished_geocells \
      [--out data/geocells/prototype_bank.npz] [--max-protos 8]
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.data.sqlite_dataset import read_embeddings
from geoguessr_ai_tpu.geocells.manager import GeocellManager
from geoguessr_ai_tpu.models.proto_refiner import PrototypeBank


def build_bank_from_manager(
    mgr: GeocellManager,
    emb_df,
    max_protos: int = 8,
    coord_decimals: int = 6,
) -> PrototypeBank:
    """Join per-location fused embeddings to geocell clusters by (lat, lng).

    Args:
      mgr: loaded GeocellManager (defines cells, clusters, memberships).
      emb_df: per-image DataFrame from read_embeddings (lat/lon/embedding).
    """
    # 1. fuse headings -> one embedding per location, keyed by rounded coords
    fused: dict = {}
    grouped = emb_df.groupby(
        [emb_df["lat"].round(coord_decimals), emb_df["lon"].round(coord_decimals)]
    )
    for (lat, lon), group in grouped:
        fused[(lat, lon)] = np.mean(
            np.stack(group["embedding"].to_list()), axis=0
        )
    embed_dim = len(next(iter(fused.values())))

    # 2. accumulate per (cell, cluster) members via the manager's point index
    members: dict = defaultdict(list)  # (cell_idx, cluster_id) -> [(emb, lnglat)]
    for (lat, lng), rec in mgr.point_info.items():
        key = (round(lat, coord_decimals), round(lng, coord_decimals))
        emb = fused.get(key)
        if emb is not None:
            members[(rec.geocell_index, rec.cluster_id)].append(
                (emb, (lng, lat))
            )

    # 3. pad into the fixed-shape bank (largest clusters kept per cell)
    num_cells = mgr.num_cells
    bank_emb = np.zeros((num_cells, max_protos, embed_dim), np.float32)
    bank_coords = np.zeros((num_cells, max_protos, 2), np.float32)
    bank_mask = np.zeros((num_cells, max_protos), np.float32)
    per_cell: dict = defaultdict(list)
    for (cell_idx, cluster_id), items in members.items():
        per_cell[cell_idx].append(items)
    for cell_idx, clusters in per_cell.items():
        clusters.sort(key=len, reverse=True)
        for p, items in enumerate(clusters[:max_protos]):
            embs = np.stack([e for e, _ in items])
            coords = np.array([c for _, c in items], np.float64)
            bank_emb[cell_idx, p] = embs.mean(axis=0)
            bank_coords[cell_idx, p] = coords.mean(axis=0)
            bank_mask[cell_idx, p] = 1.0
    return PrototypeBank(
        embeddings=bank_emb, coords=bank_coords, mask=bank_mask
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True, help="embedding sqlite")
    ap.add_argument(
        "--geocell-dir",
        default=f"{C.GEOCELL_DIR}/finished_geocells",
        help="directory of finished geocell pickles",
    )
    ap.add_argument(
        "--out", default=f"{C.GEOCELL_DIR}/prototype_bank.npz"
    )
    ap.add_argument("--max-protos", type=int, default=8)
    args = ap.parse_args()

    mgr = GeocellManager(args.geocell_dir)
    emb_df = read_embeddings(args.embeddings)
    bank = build_bank_from_manager(mgr, emb_df, max_protos=args.max_protos)
    bank.save(args.out)
    filled = int((bank.mask.sum(axis=1) > 0).sum())
    print(
        f"bank: {bank.num_cells} cells x {bank.max_protos} protos "
        f"(dim {bank.embeddings.shape[-1]}); {filled} cells populated "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
