#!/usr/bin/env python
"""Image-mode quality artifact at scale, hierarchical fusion (round-5
VERDICT #3).

Reuses the QUALITY_V2 protocol (tools/quality_run_v2.py: synthetic
location-conditioned Fourier-field JPEGs -> real train() -> restore best
-> embed from JPEGs -> decode -> multi-member prototype refinement) with
the two round-5 deltas the verdict asked for:

* cells >= 1024 (4x the V2 run, toward the production 12,647), and
* ``hierarchical=True`` view fusion, so the PE + self-attention fusion
  path (models/super_guessr.py:105-126, reference super_guessr.py:89-99)
  has end-to-end quality evidence — every prior artifact used mean
  fusion.

Runs on the 8-virtual-device CPU mesh (same as V2).  Writes
data/out/QUALITY_V3.json with quality_v3_* keys; bench.py folds them
into the headline record and the compact tail line.

Usage: python tools/quality_run_v3.py [--cells 1024] [--loc-per-cell 14]
       [--epochs 14] [--spread-deg 0.8] [--members 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

from quality_run_v2 import (  # noqa: E402
    FourierField,
    build_dataset,
    evaluate_from_jpegs,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", type=int, default=1024)
    ap.add_argument("--loc-per-cell", type=int, default=14)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--spread-deg", type=float, default=0.8)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--noise", type=float, default=10.0)
    ap.add_argument(
        "--mean-fusion", action="store_true",
        help="use mean view fusion instead of the hierarchical default",
    )
    ap.add_argument("--out", default="data/out/QUALITY_V3.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        BackboneConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        load_sqlite_panorama_dataset,
        split_train_val,
    )
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig

    rng = np.random.default_rng(0)
    K = args.cells
    hierarchical = not args.mean_fusion
    table = CentroidTable(
        centroids=np.stack(
            [rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], axis=-1
        ).astype(np.float32),
        country=np.array([f"C{i}" for i in range(K)]),
        admin1=np.array([f"A{i}" for i in range(K)]),
        cell_id=np.array([str(i) for i in range(K)]),
    )
    field = FourierField(rng)

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "dataset_sqlite_quality_v3.sqlite")
        build_dataset(
            db, table, args.loc_per_cell, args.spread_deg, field, rng,
            noise=args.noise,
        )
        pano = load_sqlite_panorama_dataset(db)
        train_df, val_df = split_train_val(pano, 0.2)
        print(
            f"dataset: {len(train_df)} train / {len(val_df)} val panoramas,"
            f" {K} cells, spread {args.spread_deg} deg, "
            f"fusion={'hierarchical' if hierarchical else 'mean'}",
            flush=True,
        )

        orig = coord.build_backbone

        def tiny_builder(cfg):
            tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
            return (
                TinyViT(tv),
                TINYVIT_NORM_MEAN,
                TINYVIT_NORM_STD,
                tv.image_size,
            )

        coord.build_backbone = tiny_builder
        try:
            cfg = TrainConfig(
                seed=0,
                batch_size=args.batch_size,
                num_epochs=args.epochs,
                eval_every_steps=0,
                log_every_steps=100,
                keep_last_n=2,
                early_stop_patience=5,
                monitored_metric="val_median_km",
                monitored_mode="min",
                optimizer=OptimizerConfig(
                    learning_rate=1e-3, weight_decay=0.05
                ),
                mesh=MeshConfig(data_parallel=8, model_parallel=1),
                model=ModelConfig(
                    backbone=BackboneConfig(
                        name="tinyvit",
                        image_size=64,
                        embed_dim=80,
                        freeze_all_but_last_stage=False,
                    ),
                    panorama=True,
                    hierarchical=hierarchical,
                ),
            )
            summary = coord.train(
                cfg, train_df, val_df, table,
                checkpoint_dir=os.path.join(td, "ckpts"),
            )
            refined = evaluate_from_jpegs(
                coord, cfg, table, train_df, val_df,
                os.path.join(td, "ckpts"), args.members,
            )
        finally:
            coord.build_backbone = orig

    wall = time.perf_counter() - t0
    chance = 1.0 / K
    refined = {
        k.replace("quality_v2_", "quality_v3_"): v
        for k, v in refined.items()
    }
    quality = {
        "quality_v3_dataset": (
            f"image-mode synthetic: {K} cells x {args.loc_per_cell} locs, "
            f"spread {args.spread_deg} deg, location-conditioned Fourier "
            "field painted as quadrant colors; view fusion = "
            + ("hierarchical PE+MHA" if hierarchical else "mean")
        ),
        "quality_v3_cells": K,
        "quality_v3_fusion": "hierarchical" if hierarchical else "mean",
        "quality_v3_val_top1": round(float(summary.get("val_top1", 0.0)), 4),
        "quality_v3_val_top5": round(float(summary.get("val_top5", 0.0)), 4),
        "quality_v3_val_median_km": round(
            float(summary.get("val_median_km", float("nan"))), 2
        ),
        "quality_v3_chance_top1": round(chance, 6),
        "quality_v3_epochs": int(summary.get("epoch", -1)) + 1,
        "quality_v3_wall_s": round(wall, 1),
        **refined,
    }
    print(json.dumps(quality, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(quality, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    if quality["quality_v3_val_top1"] <= 10 * chance:
        print("WARNING: top-1 did not clear 10x chance", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
