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


def _metrics(logits, coords, centroids, loss, with_distances=False):
    """top-1/top-5 geocell accuracy + km error + score, all on device.

    Matches the reference metric set (main_coordinator_idun.py:359-368,
    run_benchmark.py:50-117).  ``with_distances`` additionally returns the
    per-sample km-error vector under ``"dist_km"`` so callers that
    aggregate across batches can compute the TRUE whole-split median
    (the reference medians over the full result set,
    run_benchmark.py:284-295 — a mean of per-batch medians diverges at
    small batch counts)."""
    labels = nearest_centroid_labels(coords, centroids)
    k = min(5, centroids.shape[0])
    _, preds, pred_lnglat, top5 = decode_predictions(logits, centroids, k)
    top1 = jnp.mean((preds == labels).astype(jnp.float32))
    top5_acc = jnp.mean(
        jnp.any(top5.indices == labels[:, None], axis=-1).astype(jnp.float32)
    )
    dist_km = haversine(coords, pred_lnglat)
    out = {
        "loss": loss,
        "top1": top1,
        "top5": top5_acc,
        "mean_km": jnp.mean(dist_km),
        "median_km": jnp.median(dist_km),
        "score": jnp.mean(geoguessr_score(dist_km)),
    }
    if with_distances:
        out["dist_km"] = dist_km
    return out


def train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    centroids: jax.Array,
    should_smooth_labels: bool = True,
    grad_accum_steps: int = 1,
    accum_dtype=jnp.bfloat16,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimization step.  Pure; jit-with-shardings applied by callers.

    grad_accum_steps > 1 splits the batch into that many microbatches and
    runs them through a lax.scan, accumulating gradients in
    ``accum_dtype`` (bf16 halves the accumulator footprint vs f32) —
    activation memory is that of ONE microbatch, an alternative to remat
    for large panorama batches (reference PRETRAIN_ARGS grad-accum 8,
    config.py:114; here applied to the main trainer)."""
    rng = jax.random.fold_in(state.dropout_rng, state.step)

    def loss_fn(params, batch_stats, mb, mb_rng):
        variables = {"params": params}
        if state.extra_variables:
            variables.update(state.extra_variables)
        if batch_stats:
            variables["batch_stats"] = batch_stats
            (emb, logits), new_model_state = state.apply_fn(
                variables,
                pixel_values=mb.get("pixel_values"),
                embedding=mb.get("embedding"),
                view_mask=mb.get("view_mask"),
                train=True,
                rngs={"dropout": mb_rng},
                mutable=["batch_stats"],
            )
            new_stats = new_model_state["batch_stats"]
        else:
            emb, logits = state.apply_fn(
                variables,
                pixel_values=mb.get("pixel_values"),
                embedding=mb.get("embedding"),
                view_mask=mb.get("view_mask"),
                train=True,
                rngs={"dropout": mb_rng},
            )
            new_stats = batch_stats
        if should_smooth_labels:
            loss = smoothed_soft_ce(logits, mb["coords"], centroids)
        else:
            labels = nearest_centroid_labels(mb["coords"], centroids)
            loss = hard_ce(logits, labels)
        return loss, (logits, new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if grad_accum_steps <= 1:
        (loss, (logits, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
    else:
        k = grad_accum_steps
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b % k != 0:
            raise ValueError(
                f"batch size {b} is not divisible by grad_accum_steps={k}; "
                "pick a batch size that splits evenly into microbatches"
            )

        def split(x):
            return x.reshape((k, x.shape[0] // k) + x.shape[1:])

        micro_batches = jax.tree.map(split, batch)

        def micro(carry, xs):
            gacc, bstats = carry
            i, mb = xs
            (mb_loss, (mb_logits, new_bstats)), grads = grad_fn(
                state.params, bstats, mb, jax.random.fold_in(rng, i)
            )
            gacc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), gacc, grads
            )
            return (gacc, new_bstats), (mb_loss, mb_logits)

        gacc0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, accum_dtype), state.params
        )
        (gacc, new_stats), (losses, logits_k) = jax.lax.scan(
            micro,
            (gacc0, state.batch_stats),
            (jnp.arange(k), micro_batches),
        )
        grads = jax.tree.map(
            lambda a: (a.astype(jnp.float32) / k), gacc
        )
        loss = jnp.mean(losses)
        logits = logits_k.reshape(
            (logits_k.shape[0] * logits_k.shape[1],) + logits_k.shape[2:]
        )

    state = state.apply_gradients(grads=grads)
    if new_stats:
        state = state.replace(batch_stats=new_stats)
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
    if state.extra_variables:
        variables.update(state.extra_variables)
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
    return _metrics(
        logits, batch["coords"], centroids, loss, with_distances=True
    )


def make_sharded_steps(
    mesh: Mesh,
    mesh_cfg: MeshConfig = MeshConfig(),
    should_smooth_labels: bool = True,
    grad_accum_steps: int = 1,
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
            train_step,
            should_smooth_labels=should_smooth_labels,
            grad_accum_steps=grad_accum_steps,
        ),
        in_shardings=(None, data_spec, repl),
        donate_argnums=(0,),
    )
    jit_eval = jax.jit(
        eval_step, in_shardings=(None, data_spec, repl)
    )
    return jit_train, jit_eval
