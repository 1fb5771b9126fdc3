#!/usr/bin/env python
"""Image-mode quality artifact at scale (round-4 VERDICT #4).

Round 3's two quality artifacts each had a gap: the image-mode run was
32 cells with locations AT centroids (no within-cell signal — refiner
lift negative by construction), and the 12,647-cell run bypassed the
vision tower (pre-made embeddings).  This run closes both:

* >=256 geocells, locations sampled AROUND centroids (configurable
  spread) so within-cell structure exists for the refiner;
* the visual signal is a CONTINUOUS function of location — a random
  Fourier-feature field on the unit sphere drives color/stripe
  parameters — so images encode location, not cell id: the tower must
  learn geography from pixels and nearby locations look similar
  (what makes prototype refinement physically meaningful);
* the full pipeline runs from JPEGs: synthetic SQLite -> real train()
  (sharded steps, checkpoints, validation, early stop) -> restore best
  -> embed both splits from JPEGs -> decode + top-K -> multi-member
  prototype-bank refinement (reference run_benchmark.py:146-304 +
  proto_refiner.py:190-269), reporting raw vs refined median km.

Writes data/out/QUALITY_V2.json; bench.py folds it into the headline
JSON line (quality_v2_* keys).

Usage: python tools/quality_run_v2.py [--cells 256] [--loc-per-cell 14]
       [--epochs 12] [--spread-deg 0.8] [--members 8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


class FourierField:
    """Smooth random field on the sphere: f(lat, lon) -> R^d in [-1, 1].

    Nearby locations get nearby features (wavelength set by `freq`), so
    the rendered images vary continuously with true position."""

    def __init__(self, rng, dim=12, freq=10.0):
        self.W = rng.normal(0, freq, (dim, 3))
        self.b = rng.uniform(0, 2 * np.pi, dim)

    def __call__(self, lat, lon):
        la, lo = np.radians(lat), np.radians(lon)
        x = np.asarray(
            [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)]
        )
        return np.sin(self.W @ x + self.b)


def synth_view(field_vec, heading, rng, size=64, noise=10.0) -> bytes:
    """JPEG whose appearance is a smooth function of the location's
    field vector, NOT of the cell id.  The 12 field dims paint the 2x2
    quadrant colors (4 patches x 3 channels) — a local, CNN-invertible
    encoding (the round-4 stripe-parameter encoding separated cells
    near-perfectly in field space — 1NN 96% — but a from-scratch tower
    could not regress stripe angle/freq/phase from 64px JPEGs: train
    81% / val 1%, pure memorization).  A fixed-geometry stripe overlay
    keeps texture, and heading tilts brightness so views differ."""
    from PIL import Image

    f = field_vec
    img = np.zeros((size, size, 3), np.float32)
    h = size // 2
    for qi in range(2):
        for qj in range(2):
            q = qi * 2 + qj
            img[qi * h : (qi + 1) * h, qj * h : (qj + 1) * h] = 127.5 * (
                1.0 + f[q * 3 : (q + 1) * 3]
            )
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    stripes = np.sin(2 * np.pi * 4.0 * (xx + yy))
    img *= 0.8 + 0.2 * stripes[..., None]
    img *= (
        1.0
        + 0.15
        * np.cos(np.radians(heading))
        * np.linspace(-1, 1, size, dtype=np.float32)[None, :, None]
    )
    img = img + rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def build_dataset(path, table, loc_per_cell, spread_deg, field, rng,
                  noise=22.0):
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        create_sqlite_from_records,
    )

    K = table.num_cells
    # Group records per location, then SHUFFLE the location order before
    # writing: split_train_val is the reference's sequential no-shuffle
    # split, so writing cell-by-cell would put the last ~20% of CELLS
    # entirely in val with zero training data (val top-1 structurally 0
    # — the round-4 first run's failure mode).
    locs = []
    for c in range(K):
        lon_c, lat_c = table.centroids[c]
        for _ in range(loc_per_cell):
            lat = float(np.clip(lat_c + rng.normal(0, spread_deg), -89, 89))
            lon = float(
                (lon_c + rng.normal(0, spread_deg) + 180.0) % 360.0 - 180.0
            )
            locs.append((lat, lon))
    # location_id is assigned AFTER shuffling cells together: the dataset
    # loader sorts panoramas by location_id, so ids must not follow cell
    # order — the reference split is sequential no-shuffle and would
    # otherwise hold out the last ~20% of CELLS wholesale (round-4 run 1:
    # val top-1 structurally 0).
    records = []
    for i, j in enumerate(rng.permutation(len(locs))):
        lat, lon = locs[j]
        fv = field(lat, lon)
        for h in (0, 90, 180, 270):
            records.append(
                {
                    "location_id": f"loc{i:06d}",
                    "lat": lat,
                    "lon": lon,
                    "heading": h,
                    "image": synth_view(fv, h, rng, noise=noise),
                }
            )
    create_sqlite_from_records(path, records)
    return len(locs)


def evaluate_from_jpegs(coord, cfg, table, train_df, val_df, ckpt_dir,
                        members):
    """Restore best -> embed both splits FROM JPEGS -> decode + top-K ->
    multi-member prototype refinement; raw vs refined metrics."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        OptimizerConfig,
    )
    from geoguessr_ai_tpu.data.pipeline import PanoramaBatchIterator
    from geoguessr_ai_tpu.geo import (
        geoguessr_score,
        haversine,
        nearest_centroid_labels,
    )
    from geoguessr_ai_tpu.models.proto_refiner import refine
    from geoguessr_ai_tpu.models.super_guessr import decode_predictions
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu.train.checkpoints import (
        CheckpointConfig,
        CheckpointStore,
    )
    from geoguessr_ai_tpu.train.state import create_train_state

    K = table.num_cells
    model, _, _, image_size = coord.build_model(cfg, K)
    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, 4, image_size, image_size, 3)),
    )
    state = create_train_state(model, variables, OptimizerConfig(), 10)
    store = CheckpointStore(CheckpointConfig(directory=ckpt_dir))
    state, _ = store.restore(state, "best")
    centroids = jnp.asarray(table.centroids)

    @jax.jit
    def forward(params, batch_stats, pixels, mask):
        emb, logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pixel_values=pixels,
            view_mask=mask,
            train=False,
        )
        probs, preds, lnglat, topk = decode_predictions(
            logits, centroids, min(5, K)
        )
        emb = emb.astype(jnp.float32)
        if emb.ndim == 3:
            m = mask.astype(jnp.float32)[..., None]
            emb = (emb * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        return emb, lnglat, topk.values, topk.indices

    def run_split(df):
        embs, lnglats, tvals, tids, coords = [], [], [], [], []
        it = PanoramaBatchIterator(df, cfg.batch_size, image_size)
        for batch in it:
            pixels = fused_preprocess(
                jnp.asarray(batch["pixel_values"]),
                TINYVIT_NORM_MEAN,
                TINYVIT_NORM_STD,
                image_size,
            )
            e, ll, tv, ti = forward(
                state.params, state.batch_stats, pixels,
                jnp.asarray(batch["view_mask"]),
            )
            n = batch["num_real"]
            embs.append(np.asarray(e)[:n])
            lnglats.append(np.asarray(ll)[:n])
            tvals.append(np.asarray(tv)[:n])
            tids.append(np.asarray(ti)[:n])
            coords.append(batch["coords"][:n])
        return (
            np.concatenate(embs),
            np.concatenate(lnglats),
            np.concatenate(tvals),
            np.concatenate(tids),
            np.concatenate(coords),
        )

    tr_emb, _, _, _, tr_coords = run_split(train_df)
    va_emb, va_lnglat, va_tvals, va_tids, va_coords = run_split(val_df)

    # Multi-member prototype bank: up to `members` TRAIN panoramas per
    # cell with their own coordinates — within-cell refinement targets
    # (the round-3 run's single mean prototype could only recenter).
    labels = np.asarray(
        nearest_centroid_labels(jnp.asarray(tr_coords), centroids)
    )
    D = tr_emb.shape[-1]
    M = members
    bank_emb = np.zeros((K, M, D), np.float32)
    bank_coords = np.zeros((K, M, 2), np.float32)
    bank_mask = np.zeros((K, M), np.float32)
    rng = np.random.default_rng(0)
    for c in range(K):
        sel = np.flatnonzero(labels == c)
        if len(sel) == 0:
            continue
        pick = rng.permutation(sel)[:M]
        bank_emb[c, : len(pick)] = tr_emb[pick]
        bank_coords[c, : len(pick)] = tr_coords[pick]
        bank_mask[c, : len(pick)] = 1.0

    refined_lnglat, refined_cell, _ = refine(
        jnp.asarray(bank_emb),
        jnp.asarray(bank_coords),
        jnp.asarray(bank_mask),
        jnp.asarray(va_emb),
        jnp.asarray(va_tids),
        jnp.asarray(va_tvals),
        jnp.asarray(va_lnglat),
        max_refinement_km=25000.0,
    )
    true_labels = np.asarray(
        nearest_centroid_labels(jnp.asarray(va_coords), centroids)
    )
    d_raw = np.asarray(
        haversine(jnp.asarray(va_coords), jnp.asarray(va_lnglat))
    )
    d_ref = np.asarray(haversine(jnp.asarray(va_coords), refined_lnglat))
    return {
        "quality_v2_raw_top1": round(
            float((va_tids[:, 0] == true_labels).mean()), 4
        ),
        "quality_v2_refined_top1": round(
            float((np.asarray(refined_cell) == true_labels).mean()), 4
        ),
        "quality_v2_raw_median_km": round(float(np.median(d_raw)), 2),
        "quality_v2_refined_median_km": round(float(np.median(d_ref)), 2),
        "quality_v2_refined_delta_km": round(
            float(np.median(d_raw) - np.median(d_ref)), 2
        ),
        "quality_v2_changed_frac": round(
            float(
                (
                    np.abs(np.asarray(refined_lnglat) - va_lnglat).sum(-1)
                    > 1e-6
                ).mean()
            ),
            4,
        ),
        "quality_v2_raw_score": round(
            float(np.mean(np.asarray(geoguessr_score(jnp.asarray(d_raw))))),
            1,
        ),
        "quality_v2_refined_score": round(
            float(np.mean(np.asarray(geoguessr_score(jnp.asarray(d_ref))))),
            1,
        ),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--loc-per-cell", type=int, default=28)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--spread-deg", type=float, default=0.8)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--noise", type=float, default=10.0)
    ap.add_argument("--out", default="data/out/QUALITY_V2.json")
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
        db = os.path.join(td, "dataset_sqlite_quality_v2.sqlite")
        n_loc = build_dataset(
            db, table, args.loc_per_cell, args.spread_deg, field, rng,
            noise=args.noise,
        )
        pano = load_sqlite_panorama_dataset(db)
        train_df, val_df = split_train_val(pano, 0.2)
        print(
            f"dataset: {len(train_df)} train / {len(val_df)} val panoramas,"
            f" {K} cells, spread {args.spread_deg} deg",
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
                log_every_steps=50,
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
    quality = {
        "quality_v2_dataset": (
            f"image-mode synthetic: {K} cells x {args.loc_per_cell} locs, "
            f"spread {args.spread_deg} deg, location-conditioned Fourier "
            "field painted as quadrant colors (images encode position, "
            "not cell id)"
        ),
        "quality_v2_cells": K,
        "quality_v2_val_top1": round(
            float(summary.get("val_top1", 0.0)), 4
        ),
        "quality_v2_val_top5": round(
            float(summary.get("val_top5", 0.0)), 4
        ),
        "quality_v2_val_median_km": round(
            float(summary.get("val_median_km", float("nan"))), 2
        ),
        "quality_v2_chance_top1": round(chance, 5),
        "quality_v2_epochs": int(summary.get("epoch", -1)) + 1,
        "quality_v2_wall_s": round(wall, 1),
        **refined,
    }
    print(json.dumps(quality, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(quality, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    if quality["quality_v2_val_top1"] <= 10 * chance:
        print("WARNING: top-1 did not clear 10x chance", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
