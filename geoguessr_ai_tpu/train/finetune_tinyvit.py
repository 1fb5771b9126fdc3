"""TinyViT country-classification finetune pipeline.

Re-design of the reference's self-contained finetune_tinyvit/ package
(prepare_dataset.py, train_tinyvit_timm.py, extract_embeddings.py):
label street-view images by country, stratified split, finetune a TinyViT
with a classification head (AMP in the reference -> bf16 here, cosine LR,
flip/crop augmentation), top-1/top-5 eval, best-checkpoint saving with the
class map, and embedding extraction to Parquet.

Country labels come from the geocell manager's point index (the reference
uses a GADM point-in-polygon sjoin, prepare_dataset.py:71-129 — same
result for points that were assigned to geocells; unknown points drop).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from geoguessr_ai_tpu.utils.logging import MetricsLogger, logger


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    seed: int = 0
    batch_size: int = 64
    num_epochs: int = 5
    learning_rate: float = 5e-4
    weight_decay: float = 0.05
    warmup_steps: int = 100
    image_size: int = 64  # test-size default; production: 512
    val_fraction: float = 0.1
    min_country_count: int = 2
    hflip_prob: float = 0.5


def prepare_country_dataset(
    df, geocell_manager, min_count: int = 2, val_fraction: float = 0.1,
    seed: int = 0,
) -> Tuple:
    """Label rows by country + stratified split.

    Args:
      df: per-image DataFrame with lat/lon/image columns.
      geocell_manager: geocells.manager.GeocellManager.

    Returns:
      (train_df, val_df, class_map) where class_map is country -> class id.
    """
    countries = []
    for lat, lon in zip(df["lat"], df["lon"]):
        _, country, _ = geocell_manager.get_geocell_id(
            {"latitude": lat, "longitude": lon}
        )
        countries.append(country)
    df = df.assign(country=countries).dropna(subset=["country"])
    counts = df["country"].value_counts()
    keep = counts[counts >= min_count].index
    df = df[df["country"].isin(keep)].reset_index(drop=True)

    class_map = {c: i for i, c in enumerate(sorted(df["country"].unique()))}
    df = df.assign(label=df["country"].map(class_map))

    rng = np.random.default_rng(seed)
    val_idx = []
    for _, group in df.groupby("label"):
        k = max(1, int(round(len(group) * val_fraction)))
        val_idx.extend(rng.choice(group.index, size=k, replace=False))
    val_mask = df.index.isin(val_idx)
    return (
        df[~val_mask].reset_index(drop=True),
        df[val_mask].reset_index(drop=True),
        class_map,
    )


def finetune(
    train_df,
    val_df,
    num_classes: int,
    cfg: FinetuneConfig = FinetuneConfig(),
    tinyvit_config=None,
    checkpoint_dir: Optional[str] = None,
    class_map: Optional[Dict[str, int]] = None,
    max_steps: Optional[int] = None,
) -> Dict:
    """Train TinyViT + linear head on country labels; returns summary with
    final top-1/top-5 and best checkpoint path."""
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess

    # Reference default backbone: timm tiny_vit_5m_224
    # (train_tinyvit_timm.py:122,156).
    tv_cfg = tinyvit_config or TinyViTConfig.tiny_vit_5m_224()

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            emb = TinyViT(tv_cfg, name="backbone")(x, train=train)
            return nn.Dense(num_classes, dtype=jnp.float32, name="head")(emb)

    model = Classifier()
    rng = jax.random.PRNGKey(cfg.seed)
    variables = model.init(
        rng,
        jnp.zeros((1, tv_cfg.image_size, tv_cfg.image_size, 3)),
    )

    steps_per_epoch = max(1, len(train_df) // cfg.batch_size)
    total_steps = max(1, steps_per_epoch * cfg.num_epochs)
    warmup = min(cfg.warmup_steps, max(0, total_steps - 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, warmup, warmup + total_steps
    )
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels, rng):
        def loss_fn(p):
            logits, new_state = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            one = jax.nn.log_softmax(logits)
            loss = -jnp.mean(
                jnp.take_along_axis(one, labels[:, None], axis=-1)
            )
            return loss, (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, loss, logits

    @jax.jit
    def eval_step(params, batch_stats, images, labels):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, images
        )
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        k = min(5, num_classes)
        _, topk = jax.lax.top_k(logits, k)
        top5 = jnp.mean(
            jnp.any(topk == labels[:, None], axis=-1).astype(jnp.float32)
        )
        return top1, top5

    def batches(df, shuffle, epoch):
        order = np.arange(len(df))
        if shuffle:
            np.random.default_rng(cfg.seed + epoch).shuffle(order)
        for s in range(0, len(order) - cfg.batch_size + 1, cfg.batch_size):
            idx = order[s : s + cfg.batch_size]
            imgs = np.stack(
                [
                    decode_jpeg(df.iloc[i]["image"], tv_cfg.image_size)
                    for i in idx
                ]
            )
            if shuffle:  # train-time augmentation: horizontal flip
                flip = np.random.default_rng(cfg.seed + epoch + s).random(
                    len(idx)
                ) < cfg.hflip_prob
                imgs[flip] = imgs[flip, :, ::-1]
            labels = df.iloc[idx]["label"].to_numpy(np.int32)
            px = fused_preprocess(
                jnp.asarray(imgs),
                TINYVIT_NORM_MEAN,
                TINYVIT_NORM_STD,
                tv_cfg.image_size,
                dtype=tv_cfg.dtype,
            )
            yield px, jnp.asarray(labels)

    mlog = MetricsLogger(project="geoguessr-tpu-finetune")
    best_top1 = -1.0
    best_path = None
    step = 0
    summary: Dict = {}
    for epoch in range(cfg.num_epochs):
        for images, labels in batches(train_df, True, epoch):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, loss, _ = train_step(
                params, batch_stats, opt_state, images, labels, sub
            )
            step += 1
            if step % 10 == 0 or step == 1:
                mlog.log({"finetune/loss": float(loss)}, step)
            if max_steps and step >= max_steps:
                break
        evals = [
            eval_step(params, batch_stats, images, labels)
            for images, labels in batches(val_df, False, 0)
        ]
        if evals:
            top1 = float(np.mean([float(a) for a, _ in evals]))
            top5 = float(np.mean([float(b) for _, b in evals]))
        else:
            top1 = top5 = float("nan")
        mlog.log({"finetune/top1": top1, "finetune/top5": top5}, step)
        summary = {"epoch": epoch, "top1": top1, "top5": top5, "step": step}
        improved = not np.isnan(top1) and top1 > best_top1
        if checkpoint_dir and improved:
            best_top1 = top1
            import orbax.checkpoint as ocp

            best_path = os.path.join(os.path.abspath(checkpoint_dir), "best")
            import shutil

            shutil.rmtree(best_path, ignore_errors=True)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                best_path,
                {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats),
                },
            )
            ckptr.wait_until_finished()
            if class_map is not None:
                import json

                with open(
                    os.path.join(checkpoint_dir, "class_map.json"), "w"
                ) as f:
                    json.dump(class_map, f)
        if max_steps and step >= max_steps:
            break
    mlog.finish()
    summary["best_checkpoint"] = best_path
    summary["params"] = params
    summary["batch_stats"] = batch_stats
    return summary


def extract_embeddings_parquet(
    df,
    out_path: str,
    tinyvit_config=None,
    params=None,
    batch_stats=None,
    batch_size: int = 64,
) -> int:
    """Export backbone embeddings to Parquet (reference
    extract_embeddings.py:62-118)."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess

    # Reference default backbone: timm tiny_vit_5m_224
    # (train_tinyvit_timm.py:122,156).
    tv_cfg = tinyvit_config or TinyViTConfig.tiny_vit_5m_224()
    model = TinyViT(tv_cfg)
    if params is None:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, tv_cfg.image_size, tv_cfg.image_size, 3)),
        )
    else:
        # Accept either bare TinyViT params or a finetuned classifier tree
        # (backbone + head) — extract the backbone subtree in that case.
        if "backbone" in params:
            params = params["backbone"]
            if batch_stats and "backbone" in batch_stats:
                batch_stats = batch_stats["backbone"]
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    rows = []
    for s in range(0, len(df), batch_size):
        chunk = df.iloc[s : s + batch_size]
        imgs = np.stack(
            [decode_jpeg(r["image"], tv_cfg.image_size) for _, r in chunk.iterrows()]
        )
        px = fused_preprocess(
            jnp.asarray(imgs),
            TINYVIT_NORM_MEAN,
            TINYVIT_NORM_STD,
            tv_cfg.image_size,
            dtype=tv_cfg.dtype,
        )
        embs = np.asarray(fwd(variables, px), np.float32)
        for (_, r), e in zip(chunk.iterrows(), embs):
            rows.append(
                {
                    "location_id": r.get("location_id"),
                    "lat": r["lat"],
                    "lon": r["lon"],
                    "embedding": e.tolist(),
                }
            )
    out = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    out.to_parquet(out_path, index=False)
    logger.info(f"wrote {len(out)} embeddings -> {out_path}")
    return len(out)


def mmpretrain_export(
    train_csv: str,
    val_csv: str,
    out_dir: str,
    label_map: Optional[Dict[str, int]] = None,
) -> Dict[str, int]:
    """Export CSV manifests (filepath, country columns) to MMPretrain
    JSON annotations — train.json/val.json of
    ``{"img_path": abs_path, "gt_label": id}`` plus label_map.json
    (reference finetune_tinyvit/mmpretrain_export.py:1-55)."""
    import json

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def _export(csv_path, out_json, lmap):
        df = pd.read_csv(csv_path)
        if lmap is None:
            classes = sorted(df["country"].astype(str).unique())
            lmap = {c: i for i, c in enumerate(classes)}
        records = [
            {
                "img_path": os.path.abspath(str(row["filepath"])),
                "gt_label": int(lmap[str(row["country"])]),
            }
            for _, row in df.iterrows()
        ]
        with open(out_json, "w") as f:
            json.dump(records, f)
        return lmap

    label_map = _export(
        train_csv, os.path.join(out_dir, "train.json"), label_map
    )
    _export(val_csv, os.path.join(out_dir, "val.json"), label_map)
    with open(os.path.join(out_dir, "label_map.json"), "w") as f:
        json.dump(label_map, f, indent=2)
    return label_map
