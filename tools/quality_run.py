#!/usr/bin/env python
"""Train SuperGuessr end-to-end on a synthetic multi-cell dataset through
the REAL coordinator path and record quality metrics (round-2 VERDICT #5).

No pretrained weights are reachable offline, so BASELINE.md's quality axis
(geocell top-1, median km) previously had no measured counterpart at all.
This run proves the loss/label/decode loop LEARNS beyond the
4-step loss-drops test: K geocells with distinct (but noisy) visual
signatures, JPEG-encoded panoramas in the real SQLite format, the real
``train()`` (sharded steps on the 8-device CPU mesh, checkpoints,
periodic validation, early stop), to a nontrivial held-out top-1 and
median-km.  Writes data/out/QUALITY.json, which bench.py folds into its
headline JSON line.

Usage: python tools/quality_run.py [--locations 600] [--cells 24]
       [--epochs 8] [--out data/out/QUALITY.json]
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


def synth_view(cell_id, heading, rng, size=64, noise=28.0) -> bytes:
    """JPEG with a cell-specific signature: base color + stripe
    orientation/frequency keyed to the cell, plus heavy noise."""
    from PIL import Image

    palette = np.asarray(
        [
            [
                (cell_id * 37 + 11) % 256,
                (cell_id * 101 + 53) % 256,
                (cell_id * 197 + 89) % 256,
            ]
        ],
        np.float32,
    )
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    freq = 2 + cell_id % 7
    phase = (cell_id % 11) / 11.0
    angle = (cell_id % 13) / 13.0 * np.pi
    stripes = np.sin(
        2 * np.pi * freq * (xx * np.cos(angle) + yy * np.sin(angle)) + phase
    )
    img = palette.reshape(1, 1, 3) * (0.6 + 0.25 * stripes[..., None])
    img = img + rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def build_dataset(path, table, n_locations, rng, noise=28.0):
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        create_sqlite_from_records,
    )

    K = table.num_cells
    records = []
    for i in range(n_locations):
        c = int(rng.integers(0, K))
        lon, lat = table.centroids[c]
        lat = float(lat + rng.normal(0, 0.05))
        lon = float(lon + rng.normal(0, 0.05))
        for h in (0, 90, 180, 270):
            records.append(
                {
                    "location_id": f"loc{i:05d}",
                    "lat": lat,
                    "lon": lon,
                    "heading": h,
                    "image": synth_view(c, h, rng, noise=noise),
                }
            )
    create_sqlite_from_records(path, records)


def evaluate_with_refiner(coord, cfg, table, train_df, val_df, ckpt_dir):
    """Second-stage evaluation: restore the BEST checkpoint, build a
    prototype bank from the train split's learned embeddings, and
    measure raw vs refined val metrics (reference ProtoRefiner pipeline,
    proto_refiner.py:129-237, fed by this run's own model)."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.data.pipeline import PanoramaBatchIterator
    from geoguessr_ai_tpu.geo import haversine, nearest_centroid_labels
    from geoguessr_ai_tpu.models.proto_refiner import refine
    from geoguessr_ai_tpu.models.super_guessr import decode_predictions
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu.train.checkpoints import (
        CheckpointConfig,
        CheckpointStore,
    )
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
        OptimizerConfig,
    )

    K = table.num_cells
    model, _, _, image_size = coord.build_model(cfg, K)
    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((1, 4, image_size, image_size, 3)),
    )
    state = create_train_state(
        model, variables, OptimizerConfig(), 10
    )
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
        if emb.ndim == 3:  # per-view (B, V, D) -> fused query embedding
            # Mask-weighted mean to match SuperGuessr's masked view fusion
            # (plain mean diverges when a panorama has <4 real views).
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

    # one prototype per cell: mean train embedding of its member panoramas
    labels = np.asarray(
        nearest_centroid_labels(jnp.asarray(tr_coords), centroids)
    )
    D = tr_emb.shape[-1]
    bank_emb = np.zeros((K, 1, D), np.float32)
    bank_coords = np.zeros((K, 1, 2), np.float32)
    bank_mask = np.zeros((K, 1), np.float32)
    for c in range(K):
        sel = labels == c
        if sel.any():
            bank_emb[c, 0] = tr_emb[sel].mean(0)
            bank_coords[c, 0] = tr_coords[sel].mean(0)
            bank_mask[c, 0] = 1.0

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
    d_ref = np.asarray(
        haversine(jnp.asarray(va_coords), refined_lnglat)
    )
    return {
        "quality_raw_top1_recomputed": round(
            float((va_tids[:, 0] == true_labels).mean()), 4
        ),
        "quality_refined_top1": round(
            float((np.asarray(refined_cell) == true_labels).mean()), 4
        ),
        "quality_raw_median_km_recomputed": round(
            float(np.median(d_raw)), 2
        ),
        "quality_refined_median_km": round(float(np.median(d_ref)), 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--locations", type=int, default=600)
    ap.add_argument("--cells", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", default="data/out/QUALITY.json")
    ap.add_argument("--refine", action="store_true")
    ap.add_argument("--noise", type=float, default=28.0)
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
    # well-separated global cells
    table = CentroidTable(
        centroids=np.stack(
            [rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], axis=-1
        ).astype(np.float32),
        country=np.array([f"C{i}" for i in range(K)]),
        admin1=np.array([f"A{i}" for i in range(K)]),
        cell_id=np.array([str(i) for i in range(K)]),
    )

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "dataset_sqlite_quality.sqlite")
        build_dataset(db, table, args.locations, rng, noise=args.noise)
        pano = load_sqlite_panorama_dataset(db)
        train_df, val_df = split_train_val(pano, 0.25)
        print(
            f"dataset: {len(train_df)} train / {len(val_df)} val panoramas, "
            f"{K} cells",
            flush=True,
        )

        # real train() with the test-size TinyViT backbone
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
                log_every_steps=20,
                keep_last_n=2,
                early_stop_patience=5,
                optimizer=OptimizerConfig(learning_rate=1e-3),
                mesh=MeshConfig(data_parallel=8, model_parallel=1),
                model=ModelConfig(
                    backbone=BackboneConfig(
                        name="tinyvit",
                        image_size=64,
                        embed_dim=80,
                        # training from scratch: the reference's finetune
                        # freeze would cripple learning here
                        freeze_all_but_last_stage=False,
                    ),
                    panorama=True,
                ),
            )
            summary = coord.train(
                cfg,
                train_df,
                val_df,
                table,
                checkpoint_dir=os.path.join(td, "ckpts"),
            )
            refined = (
                evaluate_with_refiner(
                    coord, cfg, table, train_df, val_df,
                    os.path.join(td, "ckpts"),
                )
                if args.refine
                else {}
            )
        finally:
            coord.build_backbone = orig

    wall = time.perf_counter() - t0
    chance = 1.0 / K
    quality = {
        "quality_dataset": f"synthetic-{K}cell-{args.locations}loc",
        "quality_val_top1": round(float(summary.get("val_top1", 0.0)), 4),
        "quality_val_top5": round(float(summary.get("val_top5", 0.0)), 4),
        "quality_val_median_km": round(
            float(summary.get("val_median_km", float("nan"))), 2
        ),
        "quality_val_score": round(
            float(summary.get("val_score", float("nan"))), 1
        ),
        "quality_chance_top1": round(chance, 4),
        "quality_epochs": int(summary.get("epoch", -1)) + 1,
        "quality_global_steps": int(summary.get("global_step", 0)),
        "quality_wall_s": round(wall, 1),
        "quality_backbone": "tinyvit-test_tiny (no pretrained weights "
        "reachable offline; proves the learning loop, not SOTA)",
        **refined,
    }
    print(json.dumps(quality, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(quality, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    if quality["quality_val_top1"] <= 3 * chance:
        print("WARNING: top-1 did not clear 3x chance", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
