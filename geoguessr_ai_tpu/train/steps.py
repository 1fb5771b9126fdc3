"""Jitted train / eval steps under a device mesh.

The hot loop.  One fused XLA program per step: preprocess-normalized
panoramas stream in sharded on the mesh's data axis; the forward, the
on-device haversine label computation (replacing the reference's per-batch
host roundtrip, main_coordinator_idun.py:343-351), the backward, and the
optimizer update all compile into a single program whose gradient all-reduce
rides ICI.

Batches are dicts of arrays:
  pixel_values: (B, V, H, W, C) float  (or (B, H, W, C) single-image)
  coords:       (B, 2) float32 (lng, lat) ground truth
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoguessr_ai_tpu.config import MeshConfig
from geoguessr_ai_tpu.geo import (
    geoguessr_score,
    haversine,
    nearest_centroid_labels,
)
from geoguessr_ai_tpu.models.super_guessr import (
    decode_predictions,
    smoothed_soft_ce,
    hard_ce,
)
from geoguessr_ai_tpu.train.state import TrainState


def _metrics(logits, coords, centroids, loss):
    """top-1/top-5 geocell accuracy + km error + score, all on device.

    Matches the reference metric set (main_coordinator_idun.py:359-368,
    run_benchmark.py:50-117)."""
    labels = nearest_centroid_labels(coords, centroids)
    k = min(5, centroids.shape[0])
    _, preds, pred_lnglat, top5 = decode_predictions(logits, centroids, k)
    top1 = jnp.mean((preds == labels).astype(jnp.float32))
    top5_acc = jnp.mean(
        jnp.any(top5.indices == labels[:, None], axis=-1).astype(jnp.float32)
    )
    dist_km = haversine(coords, pred_lnglat)
    return {
        "loss": loss,
        "top1": top1,
        "top5": top5_acc,
        "mean_km": jnp.mean(dist_km),
        "median_km": jnp.median(dist_km),
        "score": jnp.mean(geoguessr_score(dist_km)),
    }


def train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    centroids: jax.Array,
    should_smooth_labels: bool = True,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimization step.  Pure; jit-with-shardings applied by callers."""
    rng = jax.random.fold_in(state.dropout_rng, state.step)

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            (emb, logits), new_model_state = state.apply_fn(
                variables,
                pixel_values=batch.get("pixel_values"),
                embedding=batch.get("embedding"),
                view_mask=batch.get("view_mask"),
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
        else:
            emb, logits = state.apply_fn(
                variables,
                pixel_values=batch.get("pixel_values"),
                embedding=batch.get("embedding"),
                view_mask=batch.get("view_mask"),
                train=True,
                rngs={"dropout": rng},
            )
            new_model_state = {}
        if should_smooth_labels:
            loss = smoothed_soft_ce(logits, batch["coords"], centroids)
        else:
            labels = nearest_centroid_labels(batch["coords"], centroids)
            loss = hard_ce(logits, labels)
        return loss, (logits, new_model_state)

    (loss, (logits, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    state = state.apply_gradients(grads=grads)
    if new_model_state:
        state = state.replace(batch_stats=new_model_state["batch_stats"])
    metrics = _metrics(logits, batch["coords"], centroids, loss)
    # Model-health scalars: the jit-friendly stand-in for the reference's
    # wandb.watch(model, log="all") (main_coordinator_idun.py:188) —
    # global grad/param L2 norms instead of per-tensor histograms (host
    # histograms would force a full device->host parameter fetch per log).
    metrics["grad_norm"] = optax.global_norm(grads)
    metrics["param_norm"] = optax.global_norm(state.params)
    return state, metrics


def eval_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    centroids: jax.Array,
) -> Dict[str, jax.Array]:
    """Validation forward (no BN update, no dropout)."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    emb, logits = state.apply_fn(
        variables,
        pixel_values=batch.get("pixel_values"),
        embedding=batch.get("embedding"),
        view_mask=batch.get("view_mask"),
        train=False,
    )
    loss = smoothed_soft_ce(logits, batch["coords"], centroids)
    return _metrics(logits, batch["coords"], centroids, loss)


def make_sharded_steps(
    mesh: Mesh,
    mesh_cfg: MeshConfig = MeshConfig(),
    should_smooth_labels: bool = True,
):
    """Compile train/eval steps with mesh shardings.

    Batch arrays shard on the data axis; the centroid table and train state
    replicate (params may carry model-axis shardings from
    parallel.mesh.put_variables — jit respects whatever shardings the state
    arrives with via its committed layouts).
    """
    data_spec = NamedSharding(mesh, P(mesh_cfg.data_axis))
    repl = NamedSharding(mesh, P())

    jit_train = jax.jit(
        functools.partial(
            train_step, should_smooth_labels=should_smooth_labels
        ),
        in_shardings=(None, data_spec, repl),
        donate_argnums=(0,),
    )
    jit_eval = jax.jit(
        eval_step, in_shardings=(None, data_spec, repl)
    )
    return jit_train, jit_eval
