#!/usr/bin/env python
"""Build the ProtoRefiner prototype bank from an embedding SQLite +
proto_df.

The TPU equivalent of the reference's prototype precompute
(pre_compute_protos.slurm + proto_refiner.load_prototypes): per-cluster
mean embeddings + member-coordinate centroids, padded into the fixed-shape
bank artifact (data/geocells/prototype_bank.npz) that the vectorized
refiner gathers on device.

Usage:
  python tools/build_prototype_bank.py --embeddings emb.sqlite \
      [--proto-df data/geocells/proto_df.csv] \
      [--out data/geocells/prototype_bank.npz] [--max-protos 8]
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.data.sqlite_dataset import read_embeddings
from geoguessr_ai_tpu.models.proto_refiner import build_prototype_bank


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True, help="embedding sqlite")
    ap.add_argument(
        "--proto-df", default=f"{C.GEOCELL_DIR}/proto_df.csv"
    )
    ap.add_argument(
        "--out", default=f"{C.GEOCELL_DIR}/prototype_bank.npz"
    )
    ap.add_argument("--max-protos", type=int, default=8)
    args = ap.parse_args()

    proto_df = pd.read_csv(args.proto_df)
    emb_df = read_embeddings(args.embeddings)

    # Average the (up to) 4 heading embeddings per location; dataset-row
    # index follows the per-image table order (the proto_df 'indices'
    # convention of the reference manager).
    emb_df = emb_df.reset_index(drop=True)
    embeddings_by_index = {
        i: e for i, e in enumerate(emb_df["embedding"].to_list())
    }
    coords_by_index = {
        i: (float(r.lon), float(r.lat))
        for i, r in enumerate(emb_df.itertuples())
    }
    embed_dim = len(next(iter(embeddings_by_index.values())))
    num_cells = int(proto_df["geocell_index"].max()) + 1

    bank = build_prototype_bank(
        proto_df,
        embeddings_by_index,
        coords_by_index,
        num_cells=num_cells,
        embed_dim=embed_dim,
        max_protos=args.max_protos,
    )
    bank.save(args.out)
    filled = int((bank.mask.sum(axis=1) > 0).sum())
    print(
        f"bank: {bank.num_cells} cells x {bank.max_protos} protos "
        f"(dim {embed_dim}); {filled} cells populated -> {args.out}"
    )


if __name__ == "__main__":
    main()
