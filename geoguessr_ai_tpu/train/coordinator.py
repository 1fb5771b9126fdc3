"""Training coordinator: the production train entry point.

TPU re-design of the reference's main_coordinator_idun(_s3).py: discover the
newest SQLite dataset, build the panorama table, 90/10 split (val == test,
no shuffle), construct SuperGuessr over the selected backbone, and run the
epoch loop — with the per-batch work (preprocess, haversine labels, forward/
backward, optimizer) compiled into one sharded XLA program, periodic
validation every `eval_every_steps`, last/best/top-K checkpointing with
pruning, early stopping on the monitored metric, and W&B/TensorBoard
logging under the reference's field names.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.config import BackboneConfig, TrainConfig
from geoguessr_ai_tpu.data.pipeline import (
    PanoramaBatchIterator,
    prefetch_to_device,
)
from geoguessr_ai_tpu.data.sqlite_dataset import (
    load_sqlite_panorama_dataset,
    split_train_val,
)
from geoguessr_ai_tpu.geocells.manager import CentroidTable
from geoguessr_ai_tpu.models import (
    CLIPVisionConfig,
    CLIPVisionTower,
    SuperGuessr,
    TinyViT,
    TinyViTConfig,
    clip_mean_token_embedding,
)
from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
from geoguessr_ai_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    put_variables,
)
from geoguessr_ai_tpu.train.checkpoints import (
    CheckpointConfig,
    CheckpointStore,
)
from geoguessr_ai_tpu.train.state import (
    backbone_freeze_mask,
    create_train_state,
)
from geoguessr_ai_tpu.train.steps import make_sharded_steps
from geoguessr_ai_tpu.utils.logging import MetricsLogger, StepTimer, logger


def discover_sqlite(search_dirs: Optional[Iterable[str]] = None) -> str:
    """Newest dataset_sqlite*.sqlite next to the repo (reference
    main_coordinator_idun.py:104-127), overridable via DATASET_SQLITE_PATH."""
    env = os.environ.get("DATASET_SQLITE_PATH")
    if env:
        return env
    if search_dirs is None:
        search_dirs = [
            os.path.dirname(C.REPO_ROOT),
            C.REPO_ROOT,
            C.DATA_DIR,
        ]
    candidates = []
    for d in search_dirs:
        candidates.extend(glob.glob(os.path.join(d, "dataset_sqlite*.sqlite")))
    if not candidates:
        raise FileNotFoundError(
            f"no dataset_sqlite*.sqlite found in {list(search_dirs)}"
        )
    return max(candidates, key=os.path.getmtime)


class _EmbeddingBackbone:
    """Marker for embedding-only training (no vision tower)."""


def build_backbone(cfg: BackboneConfig):
    """Returns (flax_module, norm_mean, norm_std, image_size)."""
    # Shared chokepoint for every compile-heavy entry point (serve, train,
    # finetune, embed builders): enable the persistent compile cache once.
    C.enable_compilation_cache()
    if cfg.name == "tinyvit":
        tv = TinyViTConfig.tiny_vit_21m_512(
            dtype=jnp.dtype(cfg.dtype).type
            if isinstance(cfg.dtype, str)
            else cfg.dtype
        )
        if getattr(cfg, "qat_storage", False):
            from geoguessr_ai_tpu.models.tinyvit import TRAIN_QUANT_SITES

            tv = dataclasses.replace(
                tv, quant_mode="static", quant_sites=TRAIN_QUANT_SITES
            )
        return (
            TinyViT(tv),
            C.TINYVIT_NORM_MEAN,
            C.TINYVIT_NORM_STD,
            tv.image_size,
        )
    if cfg.name in ("clip", "clip_b32"):

        class _ClipEmbed(CLIPVisionTower):
            """CLIP tower returning the reference's mean-token embedding."""

            def __call__(self, pixel_values, train: bool = False):  # noqa: D401
                out = super().__call__(pixel_values)
                return clip_mean_token_embedding(out)

        cv = (
            CLIPVisionConfig.vit_l_14_336()
            if cfg.name == "clip"
            else CLIPVisionConfig.vit_b_32_224()
        )
        return (
            _ClipEmbed(cv),
            C.CLIP_NORM_MEAN,
            C.CLIP_NORM_STD,
            cv.image_size,
        )
    if cfg.name == "none":
        return _EmbeddingBackbone(), None, None, None
    raise ValueError(f"unknown backbone {cfg.name!r}")


def build_model(cfg: TrainConfig, num_cells: int):
    backbone, mean, std, image_size = build_backbone(cfg.model.backbone)
    if isinstance(backbone, _EmbeddingBackbone):
        backbone = None
    model = SuperGuessr(
        num_cells=num_cells,
        backbone=backbone,
        panorama=cfg.model.panorama,
        hierarchical=cfg.model.hierarchical,
        embed_dim=cfg.model.backbone.embed_dim,
    )
    return model, mean, std, image_size


def train(
    cfg: TrainConfig,
    pano_train,
    pano_val,
    centroid_table: CentroidTable,
    checkpoint_dir: Optional[str] = None,
    metrics_logger: Optional[MetricsLogger] = None,
    max_steps: Optional[int] = None,
    fetch_fn=None,
) -> Dict:
    """The train loop (reference train(), main_coordinator_idun.py:224-689).

    Returns a summary dict with final/best metrics.
    """
    # Embedding-only head training (reference finetune_on_embeddings,
    # train_modes.py:132-160): backbone "none" trains the SuperGuessr head
    # directly on precomputed embedding panoramas (an embedding SQLite
    # grouped by build_panorama_table) through this same loop.
    embedding_mode = cfg.model.backbone.name == "none"
    mesh = create_mesh(cfg.mesh)
    num_cells = centroid_table.num_cells
    model, mean, std, image_size = build_model(cfg, num_cells)
    if image_size is None:
        image_size = cfg.model.backbone.image_size

    rng = jax.random.PRNGKey(cfg.seed)
    if embedding_mode:
        sample_kwargs = {
            "embedding": jnp.zeros(
                (1, C.NUM_PANORAMA_VIEWS, cfg.model.backbone.embed_dim)
                if cfg.model.panorama
                else (1, cfg.model.backbone.embed_dim),
                jnp.float32,
            )
        }
    else:
        sample_kwargs = {
            "pixel_values": jnp.zeros(
                (1, C.NUM_PANORAMA_VIEWS, image_size, image_size, 3)
                if cfg.model.panorama
                else (1, image_size, image_size, 3),
                jnp.bfloat16,
            )
        }
    variables = model.init(rng, **sample_kwargs)
    if (
        not embedding_mode
        and cfg.model.backbone.qat_storage
        and isinstance(model.backbone, TinyViT)
        and model.backbone.config.quant_mode == "static"
    ):
        # Calibrate the QAT-storage amaxes once at startup (CPU, f32,
        # synthetic normal batch — the STE clips gracefully if real
        # activations run slightly hotter; recalibrate by re-running
        # train() if the data distribution shifts materially).  The
        # calibration model is the TRAIN model with quant_mode flipped
        # to "calibrate" (derived from the built backbone, so it tracks
        # whatever preset build_backbone chose).
        from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

        cal_tv = dataclasses.replace(
            model.backbone.config,
            quant_mode="calibrate",
            dtype=jnp.float32,
        )
        cal_model = model.clone(backbone=TinyViT(cal_tv))
        cal_shape = (
            (1, C.NUM_PANORAMA_VIEWS, image_size, image_size, 3)
            if cfg.model.panorama
            else (1, image_size, image_size, 3)
        )
        cal_x = jnp.asarray(
            np.random.default_rng(cfg.seed).normal(0, 1, cal_shape),
            jnp.float32,
        )
        with jax.default_device(jax.devices("cpu")[0]):
            stats = calibrate_act_stats(
                lambda vv, xx: cal_model.apply(
                    vv, pixel_values=xx, mutable=["act_stats"]
                ),
                {k: v for k, v in variables.items() if k != "act_scales"},
                [cal_x],
            )
        variables = {**variables, "act_scales": stats}
    variables = put_variables(variables, mesh, cfg.mesh)

    steps_per_epoch = max(1, len(pano_train) // cfg.batch_size)
    trainable_mask = None
    bb = cfg.model.backbone
    if bb.freeze_base or bb.freeze_all_but_last_stage:
        trainable_mask = backbone_freeze_mask(
            variables["params"],
            freeze_base=bb.freeze_base,
            freeze_all_but_last_stage=bb.freeze_all_but_last_stage,
        )
    state = create_train_state(
        model, variables, cfg.optimizer, steps_per_epoch, rng,
        trainable_mask=trainable_mask,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    centroids = jax.device_put(
        jnp.asarray(centroid_table.centroids), NamedSharding(mesh, P())
    )

    jit_train, jit_eval = make_sharded_steps(
        mesh, cfg.mesh, cfg.model.should_smooth_labels,
        grad_accum_steps=cfg.grad_accum_steps,
    )
    data_shard = batch_sharding(mesh, cfg.mesh)

    store = None
    best_value: Optional[float] = None
    start_epoch = 0
    resume_step = 0
    if checkpoint_dir:
        store = CheckpointStore(
            CheckpointConfig(
                directory=checkpoint_dir,
                keep_top_k=cfg.keep_last_n,
                monitored_mode=cfg.monitored_mode,
                async_save=getattr(cfg, "async_checkpoints", False),
            )
        )
        if cfg.resume_path:
            # explicit path: an orbax checkpoint dir (e.g. <run>/last or
            # <run>/best) — reference resume_path semantics
            # (main_coordinator_idun.py:268-283)
            resume_store = CheckpointStore(
                CheckpointConfig(
                    directory=os.path.dirname(
                        os.path.abspath(cfg.resume_path)
                    ),
                    keep_top_k=cfg.keep_last_n,
                    monitored_mode=cfg.monitored_mode,
                )
            )
            state, meta = resume_store.restore(
                state, os.path.basename(os.path.normpath(cfg.resume_path))
            )
            start_epoch = int(meta["epoch"]) + 1
            best_value = float(meta["best_value"])
            resume_step = int(meta.get("global_step", 0))
            logger.info(
                f"resumed from {cfg.resume_path} (epoch {start_epoch - 1}, "
                f"step {resume_step}, best={best_value:.6f})"
            )
        elif store.has("last"):
            state, meta = store.restore(state, "last")
            start_epoch = int(meta["epoch"]) + 1
            best_value = float(meta["best_value"])
            resume_step = int(meta.get("global_step", 0))
            logger.info(
                f"resumed from epoch {start_epoch - 1}, "
                f"step {resume_step}, best={best_value:.6f}"
            )

    mlog = metrics_logger or MetricsLogger(run_config=dataclasses.asdict(cfg))
    timer = StepTimer()
    norm = (tuple(mean), tuple(std)) if mean is not None else None

    def preprocess(batch):
        out = {"coords": batch["coords"]}
        if "view_mask" in batch:
            out["view_mask"] = batch["view_mask"]
        if "embedding" in batch:
            out["embedding"] = batch["embedding"]
        if "pixel_values" in batch and norm is not None:
            out["pixel_values"] = fused_preprocess(
                batch["pixel_values"], norm[0], norm[1], image_size
            )
        return out

    def make_iter(df, shuffle=False, seed=0):
        if embedding_mode:
            from geoguessr_ai_tpu.data.pipeline import (
                EmbeddingBatchIterator,
            )

            return EmbeddingBatchIterator(
                df,
                cfg.batch_size,
                cfg.model.backbone.embed_dim,
                shuffle=shuffle,
                seed=seed,
                drop_remainder=True,
            )
        return PanoramaBatchIterator(
            df,
            cfg.batch_size,
            image_size,
            shuffle=shuffle,
            seed=seed,
            decode_threads=cfg.decode_threads,
            drop_remainder=True,
            fetch_fn=fetch_fn,
        )

    def run_validation(step):
        agg, dists = [], []
        it = make_iter(pano_val)
        for batch in prefetch_to_device(
            it, device=data_shard, depth=cfg.prefetch_depth
        ):
            m = dict(jit_eval(state, preprocess(batch), centroids))
            dists.append(np.asarray(m.pop("dist_km")))
            agg.append(m)
        if not agg:
            return {}
        out = {
            f"val_{k}": float(np.mean([float(m[k]) for m in agg]))
            for k in agg[0]
        }
        # True whole-split median over every validation sample — the
        # reference medians over the full result set
        # (run_benchmark.py:284-295); a mean of per-batch medians can
        # diverge substantially at 2-5 val batches and would mislead
        # early stopping when monitored_metric is val_median_km.
        out["val_median_km"] = float(np.median(np.concatenate(dists)))
        mlog.log(out, step)
        return out

    # Resume the loop/logging counter too (reference restores epoch AND
    # step, main_coordinator_idun.py:268-283) so W&B step numbering and
    # the eval_every_steps cadence survive restarts.
    global_step = resume_step
    stale_epochs = 0
    # If resume already covered all epochs the loop body never runs;
    # report the resumed position instead of an empty summary.
    summary: Dict = {
        "epoch": start_epoch - 1,
        "global_step": resume_step,
        "best_value": best_value,
        "monitored_value": best_value if best_value is not None else float("nan"),
    }
    for epoch in range(start_epoch, cfg.num_epochs):
        # fresh iterator per epoch -> vary the seed so every epoch sees a
        # different permutation (a fixed seed would replay the same order)
        it = make_iter(pano_train, shuffle=True, seed=cfg.seed + epoch)
        epoch_metrics = []
        t_epoch = time.perf_counter()
        for batch in prefetch_to_device(
            it, device=data_shard, depth=cfg.prefetch_depth
        ):
            state, metrics = jit_train(state, preprocess(batch), centroids)
            timer.tick()
            global_step += 1
            epoch_metrics.append(metrics)
            if global_step % cfg.log_every_steps == 0:
                mlog.log(
                    {
                        "train/loss": float(metrics["loss"]),
                        "train/top1": float(metrics["top1"]),
                        "train/top5": float(metrics["top5"]),
                        # wandb.watch(model) stand-in (reference
                        # main_coordinator_idun.py:188): global L2 norms
                        "train/grad_norm": float(metrics["grad_norm"]),
                        "train/param_norm": float(metrics["param_norm"]),
                        "train/steps_per_sec": timer.steps_per_sec,
                    },
                    global_step,
                )
            if (
                cfg.eval_every_steps
                and global_step % cfg.eval_every_steps == 0
                and len(pano_val) >= cfg.batch_size
            ):
                run_validation(global_step)
            if max_steps is not None and global_step >= max_steps:
                break

        ep = {
            f"epoch/{k}": float(np.mean([float(m[k]) for m in epoch_metrics]))
            for k in epoch_metrics[0]
        } if epoch_metrics else {}
        ep["epoch/time_s"] = time.perf_counter() - t_epoch
        mlog.log(ep, global_step)

        val = (
            run_validation(global_step)
            if len(pano_val) >= cfg.batch_size
            else {}
        )
        monitored = val.get(
            cfg.monitored_metric, val.get("val_loss", ep.get("epoch/loss", 0.0))
        )

        if store is not None:
            prev_best = best_value
            best_value = store.save_epoch(
                jax.device_get(state), epoch, monitored, best_value,
                extra={"global_step": np.asarray(global_step, np.int64)},
            )
            improved = (
                not np.isnan(best_value)
                and (prev_best is None or best_value != prev_best)
            )
        else:
            improved = not np.isnan(monitored) and (
                best_value is None
                or (
                    monitored > best_value
                    if cfg.monitored_mode == "max"
                    else monitored < best_value
                )
            )
            if improved:
                best_value = monitored

        stale_epochs = 0 if improved else stale_epochs + 1
        summary = {
            "epoch": epoch,
            "global_step": global_step,
            "monitored_value": monitored,
            "best_value": best_value,
            **ep,
            **val,
        }
        if stale_epochs >= cfg.early_stop_patience:
            logger.info(f"early stop at epoch {epoch}")
            break
        if max_steps is not None and global_step >= max_steps:
            break

    if store is not None:
        store.wait_until_finished()  # commit any in-flight async save
    mlog.summary("best_value", best_value)
    mlog.finish()
    return summary


def main(cfg: Optional[TrainConfig] = None) -> Dict:
    """CLI entry (reference main(), main_coordinator_idun.py:99)."""
    cfg = cfg or TrainConfig()
    sqlite_path = discover_sqlite()
    logger.info(f"dataset: {sqlite_path}")
    pano = load_sqlite_panorama_dataset(sqlite_path)
    pano_train, pano_val = split_train_val(pano, cfg.val_fraction)
    table = CentroidTable.load(C.CENTROID_TABLE_PATH)
    return train(
        cfg,
        pano_train,
        pano_val,
        table,
        checkpoint_dir=C.CHECKPOINT_DIR,
    )


def main_streaming(cfg: Optional[TrainConfig] = None) -> Dict:
    """Train directly off the object-store snapshot — no local SQLite
    (reference main_coordinator.py: GeoImageIterableDataset streaming,
    holdout snapshot as validation)."""
    from geoguessr_ai_tpu.data.s3 import ObjectStore
    from geoguessr_ai_tpu.data.streaming import snapshot_panorama_table

    cfg = cfg or TrainConfig()
    store = ObjectStore()
    pano_train, fetch_fn = snapshot_panorama_table(store)
    try:
        pano_val, _ = snapshot_panorama_table(store, holdout=True)
    except FileNotFoundError:
        pano_train, pano_val = (
            pano_train.iloc[: int(len(pano_train) * 0.9)],
            pano_train.iloc[int(len(pano_train) * 0.9) :],
        )
    table = CentroidTable.load(C.CENTROID_TABLE_PATH)
    return train(
        cfg,
        pano_train,
        pano_val,
        table,
        checkpoint_dir=C.CHECKPOINT_DIR,
        fetch_fn=fetch_fn,
    )


if __name__ == "__main__":
    main()
