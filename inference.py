#!/usr/bin/env python
"""Inference CLI + library with the reference's public signature.

``run_inference(image_paths, backbone, use_refiner, checkpoint, device)``
(reference inference.py:96-102) returns (lat, lon, top_ids, top_probs) and
prints the top-k candidates with country/admin1 metadata.

Docstring refs: /root/reference/inference.py.
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Sequence, Tuple

from geoguessr_ai_tpu.utils.logging import logger

_ENGINES = {}


def _get_engine(backbone: str, checkpoint: Optional[str],
                centroid_table: Optional[str] = None):
    key = (backbone, checkpoint, centroid_table)
    if key not in _ENGINES:
        import os

        from geoguessr_ai_tpu.serving.engine import ServingEngine

        # An imported checkpoint's cell ordering travels with ITS table
        # (tools/import_checkpoint.py --proto-df sidecar) — auto-detect.
        if centroid_table is None and checkpoint:
            sidecar = checkpoint.rstrip("/") + "_centroids.npz"
            if os.path.exists(sidecar):
                centroid_table = sidecar
            else:
                import logging

                logging.getLogger("geoguessr_ai_tpu").warning(
                    "serving checkpoint %s without a matching centroid "
                    "table (no %s sidecar, no --centroid-table): falling "
                    "back to the repo default table — if this checkpoint "
                    "was imported from a reference .pt with its own "
                    "proto_df ordering, decoded cells will be permuted",
                    checkpoint, sidecar,
                )
        table = None
        if centroid_table:
            from geoguessr_ai_tpu.geocells.manager import CentroidTable

            table = CentroidTable.load(centroid_table)
        _ENGINES[key] = ServingEngine(
            backbone=backbone, checkpoint=checkpoint, centroid_table=table
        )
    return _ENGINES[key]


def run_inference(
    image_paths: Sequence[str],
    backbone: str = "tinyvit",
    use_refiner: bool = False,
    checkpoint: Optional[str] = None,
    device=None,
    centroid_table: Optional[str] = None,
) -> Tuple[float, float, List[int], List[float]]:
    """Predict (lat, lon) for 1 or 4 street-view images.

    Args/return contract mirrors the reference (inference.py:96-191);
    `device` is accepted for compatibility and ignored — placement is
    governed by the JAX platform.
    """
    engine = _get_engine(backbone, checkpoint, centroid_table)
    result = engine.predict_images(image_paths)
    lat, lon = result.lat, result.lon
    top_ids, top_probs = result.top_ids, result.top_probs

    if use_refiner:
        from geoguessr_ai_tpu.models.proto_refiner import try_refine

        refined = try_refine(result)
        if refined is not None:
            lat, lon = refined

    for rank, (i, p, country, adm1) in enumerate(
        zip(result.top_ids, result.top_probs, result.top_countries,
            result.top_admin1)
    ):
        logger.info(
            f"top{rank + 1}: cell {i} p={p:.4f} {country} / {adm1}"
        )
    logger.info(f"prediction: lat={lat:.6f} lon={lon:.6f}")
    return lat, lon, top_ids, top_probs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="*", help="1 or 4 image paths")
    ap.add_argument(
        "--backbone", default="tinyvit", choices=("tinyvit", "clip")
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--centroid-table", default=None,
                    help="centroid .npz matching the checkpoint's ordering "
                    "(auto-detects the import tool's _centroids.npz sidecar)")
    ap.add_argument("--use-refiner", action="store_true")
    args = ap.parse_args()

    # Optional W&B inference-job logging (reference inference.py:238-272).
    from geoguessr_ai_tpu.utils.logging import try_init_wandb

    run = try_init_wandb(
        "geoguessr-tpu", {"backbone": args.backbone}, job_type="inference"
    )

    paths = args.images
    if not paths:
        # No-args mode: reference samples a random S3 panorama
        # (inference.py:274-281); offline fallback uses the bundled fixture.
        import glob
        import os

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
        if len(fix) >= 4:
            paths = fix[:4]
            logger.info("no images supplied; using bundled fixture panorama")
        else:
            from geoguessr_ai_tpu.data.s3 import download_random_panorama

            paths = download_random_panorama()
    lat, lon, top_ids, top_probs = run_inference(
        paths,
        backbone=args.backbone,
        use_refiner=args.use_refiner,
        checkpoint=args.checkpoint,
        centroid_table=args.centroid_table,
    )
    if run is not None:
        try:
            run.log({"pred_lat": lat, "pred_lon": lon,
                     "top1_prob": top_probs[0]})
            run.finish()
        except Exception:
            pass


if __name__ == "__main__":
    main()
