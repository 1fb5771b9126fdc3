"""Train state + optimizer construction.

Replaces the reference's AdamW + CosineAnnealingWarmRestarts pairing
(main_coordinator_idun.py:353-384, :491) with optax equivalents, packaged in
a flax TrainState extended with BN batch stats and a dropout RNG key so the
whole training state is one pytree (checkpointable by orbax, shardable by
pjit).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from geoguessr_ai_tpu.config import OptimizerConfig


def _last_stage_prefixes(backbone_children) -> tuple:
    """Trainable top-level backbone modules for freeze_all_but_last_stage,
    detected from the param tree itself.

    CLIP-style towers (children ``layer0..layerN``): the reference freezes
    ``encoder.layers[:-1]`` (super_guessr.py:135-145), keeping the LAST
    encoder layer + post layernorm trainable.  TinyViT: the reference
    freezes ``stages[:-1]`` where timm's last stage INCLUDES its leading
    downsample (models/tinyvit.py:106-111), so ``downsample2`` (the
    stage-2->3 PatchMerging) trains alongside stage3 and norm_head."""
    import re

    layer_ids = [
        int(m.group(1))
        for n in backbone_children
        if (m := re.fullmatch(r"layer(\d+)", n))
    ]
    if layer_ids:
        return (f"layer{max(layer_ids)}", "post_layernorm")
    return ("stage3", "downsample2", "norm_head")


def backbone_freeze_mask(
    params,
    freeze_base: bool = False,
    freeze_all_but_last_stage: bool = False,
):
    """Trainable-leaf mask implementing the reference's freeze policies
    (super_guessr.py:127-153): freeze_base freezes the whole backbone;
    freeze_all_but_last_stage keeps the final stage/encoder layer + head
    norm trainable (TinyViTAdapter.freeze_all_but_last_stage,
    models/tinyvit.py:106-111; CLIP freeze, super_guessr.py:135-145).
    Everything outside the backbone subtree always trains.

    Raises if freeze_all_but_last_stage matches nothing inside the
    backbone subtree — a silent full-freeze would train only the head."""
    backbone_children = set()
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, "key", str(p)) for p in path]
        if "backbone" in names:
            i = names.index("backbone")
            if len(names) > i + 1:
                backbone_children.add(names[i + 1])
    trainable_prefixes = _last_stage_prefixes(backbone_children)

    any_trainable_in_backbone = False

    def mark(path, leaf):
        nonlocal any_trainable_in_backbone
        names = [getattr(p, "key", str(p)) for p in path]
        if "backbone" not in names:
            return True
        if freeze_base:
            return False
        if freeze_all_but_last_stage:
            i = names.index("backbone")
            child = names[i + 1] if len(names) > i + 1 else ""
            keep = any(child.startswith(p) for p in trainable_prefixes)
            any_trainable_in_backbone |= keep
            return keep
        return True

    mask = jax.tree_util.tree_map_with_path(mark, params)
    if (
        freeze_all_but_last_stage
        and not freeze_base
        and backbone_children
        and not any_trainable_in_backbone
    ):
        raise ValueError(
            "freeze_all_but_last_stage matched no backbone params "
            f"(children={sorted(backbone_children)}, wanted prefixes "
            f"{trainable_prefixes}) — the whole backbone would be frozen"
        )
    return mask


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    dropout_rng: Optional[jax.Array] = None
    # Frozen (non-trained, non-mutated) extra variable collections merged
    # into every apply — e.g. "act_scales" when the backbone runs the
    # QAT-storage sites (TinyViTConfig quant_mode="static",
    # quant_sites=TRAIN_QUANT_SITES; round-5 train int8-storage lever).
    extra_variables: Any = None
    # Dynamic sample counter for metrics (step already tracked by parent).
    epoch: jax.Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def cosine_warm_restarts(
    base_lr: float,
    steps_per_cycle: int,
    t_mult: int = 2,
    num_cycles: int = 8,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """SGDR: cosine decay restarting with geometrically growing periods.

    Mirrors torch CosineAnnealingWarmRestarts(T_0, T_mult) stepped per epoch
    in the reference (main_coordinator_idun.py:491).
    """
    schedules = []
    boundaries = []
    t = max(1, steps_per_cycle)
    total = 0
    for _ in range(num_cycles):
        schedules.append(optax.cosine_decay_schedule(base_lr, t))
        total += t
        boundaries.append(total)
        t *= max(1, t_mult)
    sched = optax.join_schedules(schedules, boundaries[:-1])
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(
    cfg: OptimizerConfig,
    steps_per_epoch: int,
    trainable_mask=None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """trainable_mask: optional pytree marking trainable leaves True;
    frozen leaves get NO update at all.

    Implementation note (round-2 bug found by the CLIP-freeze e2e test):
    ``optax.masked(tx, mask)`` passes the mask=False leaves' updates
    through UNCHANGED — i.e. raw gradients would be applied to "frozen"
    params.  The frozen side must be explicitly routed to set_to_zero
    (which also stops AdamW weight decay on frozen params)."""
    sched = cosine_warm_restarts(
        cfg.learning_rate,
        steps_per_cycle=max(1, steps_per_epoch * cfg.cosine_t0),
        t_mult=cfg.cosine_t_mult,
        warmup_steps=cfg.warmup_steps,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            sched,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx, sched


def create_train_state(
    model,
    variables,
    optimizer_cfg: OptimizerConfig,
    steps_per_epoch: int,
    rng: Optional[jax.Array] = None,
    trainable_mask=None,
) -> TrainState:
    tx, _ = make_optimizer(optimizer_cfg, steps_per_epoch, trainable_mask)
    extra = {
        k: v
        for k, v in variables.items()
        if k not in ("params", "batch_stats")
    }
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        dropout_rng=rng if rng is not None else jax.random.PRNGKey(0),
        extra_variables=extra or None,
        tx=tx,
    )
