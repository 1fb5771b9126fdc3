#!/usr/bin/env python
"""Batch benchmark with the reference's public signature.

``run_benchmark(num_samples, clip_checkpoint_index, sqlite_path,
output_path)`` (reference run_benchmark.py:146-151): sample N panoramas from
the test split (last 10%, no shuffle), predict, record per-sample
distance/score/top-5 (+country/admin1), append a summary record, write JSON.

Unlike the reference this batches predictions through one jitted program
instead of a per-sample forward loop.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from geoguessr_ai_tpu.data.pipeline import PanoramaBatchIterator
from geoguessr_ai_tpu.data.sqlite_dataset import (
    load_sqlite_panorama_dataset,
    split_train_val,
)
from geoguessr_ai_tpu.eval.metrics import (
    geoguessr_score_np,
    haversine_km_np,
    summarize_results,
)
from geoguessr_ai_tpu.utils.logging import logger

DEFAULT_OUTPUT = "data/out/inference_results.json"


def run_benchmark(
    num_samples: int = 100,
    clip_checkpoint_index: Optional[int] = None,
    sqlite_path: Optional[str] = None,
    output_path: str = DEFAULT_OUTPUT,
    backbone: str = "tinyvit",
    checkpoint: Optional[str] = None,
    batch_size: int = 16,
    seed: int = 0,
    centroid_table: Optional[str] = None,
) -> dict:
    """Returns the summary record (also appended to the output JSON).

    `clip_checkpoint_index` selects the Nth-most-recent stored checkpoint
    when a checkpoint registry is configured (reference pulls the Nth S3
    checkpoint, run_benchmark.py:130-143); a local `checkpoint` path takes
    precedence.
    """
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    if sqlite_path is None:
        from geoguessr_ai_tpu.train.coordinator import discover_sqlite

        sqlite_path = discover_sqlite()
    # Index 0 = most recent (reference run_benchmark.py:130-143).  The
    # default is None (no registry fetch) so offline runs don't require a
    # store; pass 0 explicitly for the reference's default behavior.
    if checkpoint is None and clip_checkpoint_index is not None:
        from geoguessr_ai_tpu.data.s3 import download_nth_model_checkpoint

        checkpoint = download_nth_model_checkpoint(clip_checkpoint_index)

    pano = load_sqlite_panorama_dataset(sqlite_path)
    _, test_df = split_train_val(pano, 0.1)
    rng = np.random.default_rng(seed)
    n = min(num_samples, len(test_df))
    idx = rng.choice(len(test_df), size=n, replace=False)
    sample_df = test_df.iloc[sorted(idx)].reset_index(drop=True)

    # An imported reference checkpoint's cell ordering travels with ITS
    # centroid table (tools/import_checkpoint.py --proto-df writes the
    # <ckpt>_centroids.npz sidecar) — auto-detected, or pass explicitly.
    table = None
    if centroid_table is None and checkpoint:
        sidecar = checkpoint.rstrip("/") + "_centroids.npz"
        if os.path.exists(sidecar):
            centroid_table = sidecar
        else:
            import logging

            logging.getLogger("geoguessr_ai_tpu").warning(
                "benchmarking checkpoint %s without a matching centroid "
                "table (no %s sidecar): using the repo default table — an "
                "imported reference checkpoint's cell ordering would be "
                "permuted",
                checkpoint, sidecar,
            )
    if centroid_table:
        from geoguessr_ai_tpu.geocells.manager import CentroidTable

        table = CentroidTable.load(centroid_table)
    engine = ServingEngine(
        backbone=backbone, checkpoint=checkpoint, centroid_table=table
    )
    it = PanoramaBatchIterator(
        sample_df, batch_size=batch_size, image_size=engine.image_size
    )
    records = []
    for batch in it:
        results = engine.predict_batch(
            batch["pixel_values"], view_mask=batch.get("view_mask")
        )
        for b in range(batch["num_real"]):
            r = results[b]
            gt_lon, gt_lat = batch["coords"][b]
            d = float(haversine_km_np(gt_lat, gt_lon, r.lat, r.lon))
            records.append(
                {
                    "location_id": batch["location_id"][b],
                    "gt_lat": float(gt_lat),
                    "gt_lon": float(gt_lon),
                    "pred_lat": r.lat,
                    "pred_lon": r.lon,
                    "distance_km": d,
                    "score": float(geoguessr_score_np(d)),
                    "top1_prob": r.top_probs[0],
                    "top5": [
                        {
                            "geocell_index": i,
                            "prob": p,
                            "country": c,
                            "admin1": a,
                        }
                        for i, p, c, a in zip(
                            r.top_ids,
                            r.top_probs,
                            r.top_countries,
                            r.top_admin1,
                        )
                    ],
                }
            )

    summary = summarize_results(records)
    logger.info(json.dumps(summary))
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(records + [summary], f, indent=1)
        logger.info(f"wrote {len(records)} records -> {output_path}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-samples", type=int, default=100)
    ap.add_argument("--clip-checkpoint-index", type=int, default=None)
    ap.add_argument("--sqlite-path", default=None)
    ap.add_argument("--output-path", default=DEFAULT_OUTPUT)
    ap.add_argument(
        "--backbone", default="tinyvit", choices=("tinyvit", "clip")
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--centroid-table", default=None,
                    help="centroid .npz matching the checkpoint's ordering")
    args = ap.parse_args()
    run_benchmark(
        num_samples=args.num_samples,
        clip_checkpoint_index=args.clip_checkpoint_index,
        sqlite_path=args.sqlite_path,
        output_path=args.output_path,
        backbone=args.backbone,
        checkpoint=args.checkpoint,
        centroid_table=args.centroid_table,
        batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
