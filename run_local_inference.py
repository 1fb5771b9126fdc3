#!/usr/bin/env python
"""Single-panorama local inference + globe rendering.

Reference behavior (run_local_inference.py): pick one random panorama from
the holdout snapshot (or the SQLite test split), predict, compute haversine
distance + GeoGuessr score (5000*exp(-d/1492.7)), and render a single-guess
globe HTML.  Offline-friendly: falls back to the bundled fixture panorama
when no dataset is reachable.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

from geoguessr_ai_tpu.eval.metrics import geoguessr_score_np, haversine_km_np
from geoguessr_ai_tpu.utils.logging import logger


def _run_random_panorama_inference(
    sqlite_path: Optional[str] = None,
    checkpoint: Optional[str] = None,
    backbone: str = "tinyvit",
    seed: Optional[int] = None,
    engine=None,
) -> dict:
    """Reference signature (run_local_inference.py:355).  Returns a record
    dict with gt/pred coords, distance_km, score."""
    from geoguessr_ai_tpu.data.pipeline import PanoramaBatchIterator
    from geoguessr_ai_tpu.data.sqlite_dataset import (
        load_sqlite_panorama_dataset,
        split_train_val,
    )
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    engine = engine or ServingEngine(backbone=backbone, checkpoint=checkpoint)

    rng = np.random.default_rng(seed)
    if sqlite_path and os.path.exists(sqlite_path):
        pano = load_sqlite_panorama_dataset(sqlite_path)
        _, test_df = split_train_val(pano, 0.1)
        row_df = test_df.iloc[[int(rng.integers(len(test_df)))]]
        it = PanoramaBatchIterator(row_df, 1, engine.image_size)
        batch = next(iter(it))
        views = batch["pixel_values"]
        gt_lon, gt_lat = map(float, batch["coords"][0])
    else:
        # offline fixture panorama (no ground truth -> gt == fixture's
        # Sydney-area location for a meaningful demo distance)
        import glob

        from geoguessr_ai_tpu.data.pipeline import decode_jpeg

        fix = sorted(
            glob.glob(
                os.path.join(
                    os.path.dirname(__file__),
                    "tests",
                    "fixtures",
                    "heading=*.jpg",
                )
            )
        )
        views = np.zeros(
            (1, 4, engine.image_size, engine.image_size, 3), np.uint8
        )
        for v, p in enumerate(fix[:4]):
            with open(p, "rb") as f:
                views[0, v] = decode_jpeg(f.read(), engine.image_size)
        gt_lat, gt_lon = -33.867, 151.207

    result = engine.predict_batch(views)[0]
    d = float(haversine_km_np(gt_lat, gt_lon, result.lat, result.lon))
    score = float(geoguessr_score_np(d))
    rec = {
        "gt_lat": gt_lat,
        "gt_lon": gt_lon,
        "pred_lat": result.lat,
        "pred_lon": result.lon,
        "distance_km": d,
        "score": score,
        "top1_prob": result.top_probs[0],
        "top5": [
            {"geocell_index": i, "prob": p, "country": c, "admin1": a}
            for i, p, c, a in zip(
                result.top_ids,
                result.top_probs,
                result.top_countries,
                result.top_admin1,
            )
        ],
    }
    logger.info(
        f"guess: ({result.lat:.4f}, {result.lon:.4f}) "
        f"vs gt ({gt_lat:.4f}, {gt_lon:.4f}) -> {d:.1f} km, {score:.0f} pts"
    )
    return rec


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sqlite-path", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--backbone", default="tinyvit", choices=("tinyvit", "clip")
    )
    ap.add_argument("--html-out", default="data/out/single_guess.html")
    ap.add_argument("--no-html", action="store_true")
    args = ap.parse_args()

    rec = _run_random_panorama_inference(
        sqlite_path=args.sqlite_path,
        checkpoint=args.checkpoint,
        backbone=args.backbone,
    )
    if not args.no_html:
        from geoguessr_ai_tpu.viz.globe import visualize_single_guess

        path = visualize_single_guess(
            rec["gt_lat"],
            rec["gt_lon"],
            rec["pred_lat"],
            rec["pred_lon"],
            rec["distance_km"],
            rec["score"],
            args.html_out,
        )
        logger.info(f"globe HTML -> {path}")


if __name__ == "__main__":
    main()
