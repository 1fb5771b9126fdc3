#!/usr/bin/env python
"""Full-scale quality run: train the REAL 12,647-cell head through the
real coordinator + show positive ProtoRefiner lift (round-3 VERDICT #2).

No pretrained weights are reachable offline, so the vision tower is
replaced by a synthetic location-conditioned embedding field: random
Fourier features over the unit ECEF sphere (smooth over the Earth, so
nearby locations get similar embeddings and confusions concentrate on
NEIGHBORING cells — median-km is meaningful), plus per-view noise that
the masked view fusion averages down.  Everything downstream is the
production path: the full centroid-table contract, embedding-mode
``train()`` (haversine-smoothed soft CE over 12,647 classes, sharded
steps, checkpoints, validation), decode, and the vectorized ``refine()``.

Refiner lift design note (diagnosing round-2's NEGATIVE delta): with
locations sampled AT cell centroids and one prototype per cell, there is
no within-cell spatial signal — refinement can only reshuffle top-k
cells and measured slightly worse (6.68 vs 6.37 km median).  Here
locations spread ACROSS each cell (sampled around the centroid at the
typical cell radius) and the bank stores P train locations per cell, so
picking the nearest-in-embedding prototype localizes BELOW cell
resolution — the reference refiner's actual purpose
(/root/reference/models/proto_refiner.py:190-269).

Writes data/out/QUALITY_FULL.json (merged into bench.py's JSON line).

Usage (real TPU, ~15 min incl. remote compiles):
  python tools/quality_run_full.py
CPU mesh (slow; use --per-cell 1 --epochs 2 for a smoke run):
  python tools/quality_run_full.py --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def ecef_unit(lnglat: np.ndarray) -> np.ndarray:
    """(N, 2) lng/lat degrees -> (N, 3) unit ECEF (continuous at the
    dateline, unlike raw lat/lon features)."""
    lng = np.deg2rad(lnglat[:, 0])
    lat = np.deg2rad(lnglat[:, 1])
    return np.stack(
        [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)],
        axis=-1,
    )


class EmbeddingField:
    """Smooth random field on the sphere: emb(x) = A cos(F.x + b) with a
    mix of frequency scales (coarse continent-level + fine sub-cell)."""

    def __init__(self, dim: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        n_feat = 2 * dim
        # frequency mix: |F| in cycles/radian; 1 rad ~ 6371 km.
        scales = np.concatenate(
            [
                np.full(n_feat // 4, 4.0),    # ~1600 km features
                np.full(n_feat // 2, 30.0),   # ~200 km features
                np.full(n_feat - n_feat // 4 - n_feat // 2, 120.0),  # ~50 km
            ]
        )
        self.F = rng.normal(0, 1, (n_feat, 3)) * scales[:, None]
        self.b = rng.uniform(0, 2 * np.pi, n_feat)
        self.A = (
            rng.normal(0, 1, (n_feat, dim)) / np.sqrt(n_feat)
        ).astype(np.float32)

    def __call__(self, lnglat: np.ndarray) -> np.ndarray:
        z = np.cos(ecef_unit(lnglat) @ self.F.T + self.b)
        return (z @ self.A).astype(np.float32)


def build_world(table, per_cell: int, view_noise: float, spread_deg: float,
                seed: int = 0):
    """Sample per_cell+1 locations per cell (last one is val), emit the
    panorama DataFrame rows the embedding pipeline consumes."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    K = table.num_cells
    D = 256
    field = EmbeddingField(D, seed=seed + 1)

    cells = np.repeat(np.arange(K), per_cell + 1)
    base = table.centroids[cells]  # (N, 2) lng/lat
    locs = base + rng.normal(0, spread_deg, base.shape)
    locs[:, 1] = np.clip(locs[:, 1], -89.0, 89.0)
    clean = field(locs)  # (N, D)

    is_val = (np.arange(len(cells)) % (per_cell + 1)) == per_cell

    def rows(sel):
        out = []
        idx = np.nonzero(sel)[0]
        noise = rng.normal(0, view_noise, (len(idx), 4, D)).astype(
            np.float32
        )
        for j, i in enumerate(idx):
            out.append(
                {
                    "location_id": f"loc{i:06d}",
                    "lat": float(locs[i, 1]),
                    "lon": float(locs[i, 0]),
                    "headings": [0, 90, 180, 270],
                    "images": [
                        (clean[i] + noise[j, v]).astype(np.float32)
                        for v in range(4)
                    ],
                }
            )
        return pd.DataFrame(out)

    return rows(~is_val), rows(is_val), D, field


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-cell", type=int, default=4,
                    help="train locations per geocell")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--view-noise", type=float, default=0.35)
    ap.add_argument("--spread-deg", type=float, default=0.8,
                    help="location spread around each centroid (deg)")
    ap.add_argument("--table", default="data/geocells/centroid_table.npz")
    ap.add_argument("--cells", type=int, default=0,
                    help="subset of cells (0 = full table)")
    ap.add_argument("--platform", default=None, choices=(None, "cpu"),
                    nargs="?")
    ap.add_argument("--out", default="data/out/QUALITY_FULL.json")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        BackboneConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from geoguessr_ai_tpu.geo import haversine, nearest_centroid_labels
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.models.proto_refiner import refine
    from geoguessr_ai_tpu.models.super_guessr import decode_predictions
    from geoguessr_ai_tpu.data.pipeline import EmbeddingBatchIterator
    from geoguessr_ai_tpu.eval.metrics import geoguessr_score_np
    from geoguessr_ai_tpu.train.checkpoints import (
        CheckpointConfig,
        CheckpointStore,
    )
    from geoguessr_ai_tpu.train.state import create_train_state

    table = CentroidTable.load(args.table)
    if args.cells:
        table = CentroidTable(
            centroids=table.centroids[: args.cells],
            country=table.country[: args.cells],
            admin1=table.admin1[: args.cells],
            cell_id=table.cell_id[: args.cells],
        )
    K = table.num_cells
    print(f"centroid table: {K} cells", flush=True)

    t0 = time.perf_counter()
    train_df, val_df, D, _ = build_world(
        table, args.per_cell, args.view_noise, args.spread_deg
    )
    print(
        f"world: {len(train_df)} train / {len(val_df)} val panoramas, "
        f"D={D} ({time.perf_counter() - t0:.1f}s)",
        flush=True,
    )

    n_dev = len(jax.devices())
    cfg = TrainConfig(
        seed=0,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        eval_every_steps=0,
        log_every_steps=25,
        keep_last_n=1,
        early_stop_patience=4,
        optimizer=OptimizerConfig(learning_rate=3e-3),
        mesh=MeshConfig(data_parallel=n_dev, model_parallel=1),
        model=ModelConfig(
            # no backbone to freeze in embedding mode, and the default
            # freeze flag would wrap the optimizer in multi_transform,
            # changing the opt_state pytree vs the eval-side restore
            backbone=BackboneConfig(
                name="none", embed_dim=D,
                freeze_all_but_last_stage=False,
            ),
            panorama=True,
        ),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        summary = coord.train(
            cfg, train_df, val_df, table, checkpoint_dir=td
        )

        # ---- refinement stage -------------------------------------------
        model, _, _, _ = coord.build_model(cfg, K)
        variables = model.init(
            jax.random.PRNGKey(0), embedding=jnp.zeros((1, 4, D))
        )
        state = create_train_state(model, variables, cfg.optimizer, 10)
        store = CheckpointStore(CheckpointConfig(directory=td))
        state, _ = store.restore(state, "best")
        centroids = jnp.asarray(table.centroids)

        @jax.jit
        def head_forward(params, emb, mask):
            _, logits = model.apply(
                {"params": params}, embedding=emb, view_mask=mask
            )
            probs, preds, lnglat, topk = decode_predictions(
                logits, centroids, 5
            )
            m = mask[..., None]
            fused = (emb * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            return fused, lnglat, topk.values, topk.indices

        def run_split(df):
            fused, lls, tvs, tis, coords = [], [], [], [], []
            it = EmbeddingBatchIterator(df, args.batch_size, D)
            for b in it:
                f, ll, tv, ti = head_forward(
                    state.params,
                    jnp.asarray(b["embedding"]),
                    jnp.asarray(b["view_mask"]),
                )
                fused.append(np.asarray(f))
                lls.append(np.asarray(ll))
                tvs.append(np.asarray(tv))
                tis.append(np.asarray(ti))
                coords.append(b["coords"])
            return (
                np.concatenate(fused),
                np.concatenate(lls),
                np.concatenate(tvs),
                np.concatenate(tis),
                np.concatenate(coords),
            )

        tr_f, _, _, _, tr_coords = run_split(train_df)
        va_f, va_ll, va_tv, va_ti, va_coords = run_split(val_df)

        def labels_chunked(coords, chunk=8192):
            # (N, K) haversine temporaries at N=63k x K=12.6k are ~3.2 GB
            # EACH — chunk rows so the TPU path fits HBM
            out = []
            for i in range(0, len(coords), chunk):
                out.append(
                    np.asarray(
                        nearest_centroid_labels(
                            jnp.asarray(coords[i : i + chunk]), centroids
                        )
                    )
                )
            return np.concatenate(out)

        # bank: P = per_cell prototypes per cell — each TRAIN location is
        # its own cluster (embedding + true coords), the finest
        # within-cell structure the refiner can exploit
        labels = labels_chunked(tr_coords)
        P = args.per_cell
        bank_emb = np.zeros((K, P, D), np.float32)
        bank_coords = np.zeros((K, P, 2), np.float32)
        bank_mask = np.zeros((K, P), np.float32)
        fill = np.zeros(K, np.int64)
        for i, c in enumerate(labels):
            p = fill[c]
            if p < P:
                bank_emb[c, p] = tr_f[i]
                bank_coords[c, p] = tr_coords[i]
                bank_mask[c, p] = 1.0
                fill[c] = p + 1

        refined_ll, refined_cell, changed = refine(
            jnp.asarray(bank_emb),
            jnp.asarray(bank_coords),
            jnp.asarray(bank_mask),
            jnp.asarray(va_f),
            jnp.asarray(va_ti),
            jnp.asarray(va_tv),
            jnp.asarray(va_ll),
            max_refinement_km=2500.0,
        )
        true_labels = labels_chunked(va_coords)
        d_raw = np.asarray(
            haversine(jnp.asarray(va_coords), jnp.asarray(va_ll))
        )
        d_ref = np.asarray(haversine(jnp.asarray(va_coords), refined_ll))

    out = {
        "quality_full_cells": K,
        "quality_full_train_panoramas": len(train_df),
        "quality_full_val_panoramas": len(val_df),
        "quality_full_dataset": (
            f"location-conditioned synthetic embeddings (Fourier field on "
            f"the sphere, spread {args.spread_deg} deg, view noise "
            f"{args.view_noise}; no pretrained vision weights reachable "
            f"offline)"
        ),
        "quality_full_val_top1": round(float(summary.get("val_top1", 0)), 4),
        "quality_full_val_top5": round(float(summary.get("val_top5", 0)), 4),
        "quality_full_chance_top1": round(1.0 / K, 6),
        "quality_full_raw_median_km": round(float(np.median(d_raw)), 2),
        "quality_full_refined_median_km": round(float(np.median(d_ref)), 2),
        "quality_full_refined_delta_km": round(
            float(np.median(d_raw) - np.median(d_ref)), 2
        ),
        "quality_full_refined_top1": round(
            float((np.asarray(refined_cell) == true_labels).mean()), 4
        ),
        "quality_full_raw_top1_recomputed": round(
            float((va_ti[:, 0] == true_labels).mean()), 4
        ),
        "quality_full_changed_frac": round(
            float(np.asarray(changed).mean()), 4
        ),
        "quality_full_avg_score_raw": round(
            float(np.mean(geoguessr_score_np(d_raw))), 1
        ),
        "quality_full_avg_score_refined": round(
            float(np.mean(geoguessr_score_np(d_ref))), 1
        ),
        "quality_full_epochs": int(summary.get("epoch", -1)) + 1,
        "quality_full_wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
