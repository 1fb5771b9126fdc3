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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.data.sqlite_dataset import read_embeddings
from geoguessr_ai_tpu.geocells.manager import GeocellManager
from geoguessr_ai_tpu.models.proto_refiner import (
    MemberBank,
    PrototypeBank,
    make_projection,
)


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


def build_member_bank_from_manager(
    mgr: GeocellManager,
    emb_df,
    max_protos: int = 8,
    max_members: int = 16,
    reduce_dim: int = 64,
    coord_decimals: int = 6,
    seed: int = 0,
) -> MemberBank:
    """Build the member-level bank for within-cluster refinement.

    Mirrors build_bank_from_manager's cluster ordering (largest first,
    capped at max_protos) so prototype slot p in both banks refers to the
    same cluster.  Per prototype, the max_members member embeddings
    closest to the cluster mean are kept (deterministic cap) and stored
    dim-reduced (make_projection) as float16.
    """
    fused: dict = {}
    grouped = emb_df.groupby(
        [emb_df["lat"].round(coord_decimals), emb_df["lon"].round(coord_decimals)]
    )
    for (lat, lon), group in grouped:
        fused[(lat, lon)] = np.mean(
            np.stack(group["embedding"].to_list()), axis=0
        )
    embed_dim = len(next(iter(fused.values())))
    proj = make_projection(embed_dim, reduce_dim, seed=seed)
    dr = embed_dim if proj is None else proj.shape[1]

    members: dict = defaultdict(list)
    for (lat, lng), rec in mgr.point_info.items():
        key = (round(lat, coord_decimals), round(lng, coord_decimals))
        emb = fused.get(key)
        if emb is not None:
            members[(rec.geocell_index, rec.cluster_id)].append(
                (emb, (lng, lat))
            )

    num_cells = mgr.num_cells
    m_emb = np.zeros((num_cells, max_protos, max_members, dr), np.float16)
    m_coords = np.zeros((num_cells, max_protos, max_members, 2), np.float32)
    m_mask = np.zeros((num_cells, max_protos, max_members), np.float32)
    per_cell: dict = defaultdict(list)
    for (cell_idx, cluster_id), items in members.items():
        per_cell[cell_idx].append(items)
    for cell_idx, clusters in per_cell.items():
        clusters.sort(key=len, reverse=True)
        for p, items in enumerate(clusters[:max_protos]):
            embs = np.stack([e for e, _ in items])
            mean = embs.mean(axis=0)
            order = np.argsort(((embs - mean) ** 2).sum(axis=1))
            for m, i in enumerate(order[:max_members]):
                e = embs[i] if proj is None else embs[i] @ proj
                m_emb[cell_idx, p, m] = e.astype(np.float16)
                m_coords[cell_idx, p, m] = items[int(i)][1]
                m_mask[cell_idx, p, m] = 1.0
    return MemberBank(
        embeddings=m_emb, coords=m_coords, mask=m_mask, projection=proj
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
    ap.add_argument(
        "--max-members",
        type=int,
        default=0,
        help="if >0, also build the member bank for within-cluster "
        "refinement (prototype_member_bank.npz next to --out)",
    )
    ap.add_argument("--reduce-dim", type=int, default=64)
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
    if args.max_members > 0:
        mbank = build_member_bank_from_manager(
            mgr,
            emb_df,
            max_protos=args.max_protos,
            max_members=args.max_members,
            reduce_dim=args.reduce_dim,
        )
        import os

        mout = os.path.join(
            os.path.dirname(args.out) or ".", "prototype_member_bank.npz"
        )
        mbank.save(mout)
        print(
            f"member bank: {mbank.embeddings.shape} "
            f"(proj {None if mbank.projection is None else mbank.projection.shape}) "
            f"-> {mout}"
        )


if __name__ == "__main__":
    main()
