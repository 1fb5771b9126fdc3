#!/usr/bin/env python
"""Local benchmarking loop.

Reference behavior (run_local_benchmarking.py:73-196): N samples through the
single-panorama inference path, per-sample distance/score records + summary
to ``data/out/inference_results_local.json``.  Unlike the reference (which
rebuilds the model for every sample — flagged in SURVEY.md §3.3), the
engine is built once and reused.
"""

from __future__ import annotations

import argparse
import json
import os

from geoguessr_ai_tpu.eval.metrics import summarize_results
from geoguessr_ai_tpu.utils.logging import logger
from run_local_inference import _run_random_panorama_inference

DEFAULT_OUTPUT = "data/out/inference_results_local.json"


def main(
    num_samples: int = 100,
    sqlite_path=None,
    checkpoint=None,
    backbone: str = "tinyvit",
    output_path: str = DEFAULT_OUTPUT,
) -> dict:
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    engine = ServingEngine(backbone=backbone, checkpoint=checkpoint)
    records = []
    for i in range(num_samples):
        records.append(
            _run_random_panorama_inference(
                sqlite_path=sqlite_path, seed=i, engine=engine
            )
        )
    summary = summarize_results(records)
    logger.info(json.dumps(summary))
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(records + [summary], f, indent=1)
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-samples", type=int, default=100)
    ap.add_argument("--sqlite-path", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--backbone", default="tinyvit", choices=("tinyvit", "clip")
    )
    ap.add_argument("--output-path", default=DEFAULT_OUTPUT)
    a = ap.parse_args()
    main(
        a.num_samples, a.sqlite_path, a.checkpoint, a.backbone, a.output_path
    )
