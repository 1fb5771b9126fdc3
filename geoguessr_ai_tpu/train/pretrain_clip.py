"""CLIP contrastive geo-pretraining loop.

Reference behavior (pretrain_idun.py:177-299 + config.py:105-136): train a
CLIP model on (street-view image, synthetic caption) pairs, freezing
everything except ``visual_projection`` and ``logit_scale``; linear LR
schedule with warmup ratio 0.2, grad-accum 8, eval/save every 50 steps.

TPU design: the freeze is an ``optax.masked`` zero-update (no Python-side
requires_grad), the contrastive step jits over the data-parallel mesh, and
grad accumulation uses ``optax.MultiSteps``.  Tokenization is injected
(``tokenize_fn``); the default is the real CLIP BPE tokenizer
(train/clip_bpe.py, HF-parity-tested) over the vendored assets in
data/clip_bpe/ — ``hash_tokenizer`` remains as a test-only fallback.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoguessr_ai_tpu.config import PretrainConfig
from geoguessr_ai_tpu.models.clip_text import (
    CLIPModel,
    CLIPTextConfig,
)
from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig
from geoguessr_ai_tpu.train.captions import select_caption
from geoguessr_ai_tpu.utils.logging import MetricsLogger

TRAINABLE_SUBTREES = ("visual_projection", "logit_scale")


def trainable_mask(params) -> dict:
    """True only for visual_projection / logit_scale (reference freeze,
    pretrain_idun.py:220-239)."""

    def mark(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        return any(n in TRAINABLE_SUBTREES for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def make_pretrain_optimizer(cfg: PretrainConfig, total_steps: int):
    warmup = max(1, int(cfg.warmup_ratio * total_steps))
    sched = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.linear_schedule(
                cfg.learning_rate, 0.0, max(1, total_steps - warmup)
            ),
        ],
        [warmup],
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
    # Hard freeze: masked() zeroes every update (including AdamW weight
    # decay, which plain gradient-zeroing would NOT stop — the frozen
    # towers would decay toward zero) for non-trainable subtrees.
    tx = optax.masked(tx, trainable_mask)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx, sched


#: stop_gradient the frozen subtrees inside the loss so XLA dead-code-
#: eliminates the frozen towers' entire backward.  Numerically identical
#: to computing-then-zeroing (the masked optimizer ignored those grads
#: anyway — reference freeze semantics, pretrain_idun.py:220-239); the
#: step cost collapses to forward + projection/logit-scale backward.
STOP_GRAD_FROZEN = True


def pretrain_step(params, opt_state, batch, model, tx, frozen_mask):
    def loss_fn(p):
        if STOP_GRAD_FROZEN:
            p = jax.tree_util.tree_map(
                lambda x, m: x if m else jax.lax.stop_gradient(x),
                p,
                frozen_mask,
            )
        out = model.apply(
            {"params": p},
            pixel_values=batch["pixel_values"],
            input_ids=batch["input_ids"],
            return_loss=True,
        )
        return out.loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    # Zero grads of frozen subtrees (the mask marks trainables True).
    grads = jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, frozen_mask
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


class CaptionedBatchIterator:
    """Yields (pixel_values, input_ids) host batches from an enriched
    per-image DataFrame (reference PretrainDataset, pretrain_idun.py:
    177-202)."""

    def __init__(
        self,
        df,
        tokenize_fn: Callable[[List[str]], np.ndarray],
        batch_size: int,
        image_size: int,
        seed: int = 42,
        decode_threads: int = 8,
    ):
        from geoguessr_ai_tpu.data.pipeline import decode_jpeg

        self.df = df.reset_index(drop=True)
        self.tokenize = tokenize_fn
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.decode_threads = decode_threads
        self._decode = decode_jpeg
        self._epoch = 0

    def __iter__(self):
        import concurrent.futures as cf

        rng = random.Random(self.seed + self._epoch)
        order = list(range(len(self.df)))
        rng.shuffle(order)
        self._epoch += 1
        with cf.ThreadPoolExecutor(self.decode_threads) as pool:
            for start in range(
                0, len(order) - self.batch_size + 1, self.batch_size
            ):
                idx = order[start : start + self.batch_size]
                rows = [self.df.iloc[i] for i in idx]
                images = np.stack(
                    list(
                        pool.map(
                            lambda r: self._decode(
                                r["image"], self.image_size
                            ),
                            rows,
                        )
                    )
                )
                captions = [
                    select_caption(dict(r), rng) for r in rows
                ]
                yield {
                    "pixel_values": images,
                    "input_ids": np.asarray(
                        self.tokenize(captions), np.int32
                    ),
                }


def pretrain(
    df,
    tokenize_fn: Callable[[List[str]], np.ndarray],
    cfg: PretrainConfig = PretrainConfig(),
    vision_config: Optional[CLIPVisionConfig] = None,
    text_config: Optional[CLIPTextConfig] = None,
    init_params=None,
    max_steps: Optional[int] = None,
    metrics_logger: Optional[MetricsLogger] = None,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
) -> Dict:
    """Run contrastive pretraining; returns {params, losses}.

    Checkpoints every ``cfg.save_every_steps`` (HF-Trainer save_steps
    semantics, reference config.py:127-128) into
    ``<checkpoint_dir>/step_<N>`` plus a final ``last``."""
    from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
    from geoguessr_ai_tpu import config as C
    from geoguessr_ai_tpu.parallel.mesh import create_mesh

    vision_config = vision_config or CLIPVisionConfig.vit_l_14_336()
    text_config = text_config or CLIPTextConfig.vit_l_text()
    model = CLIPModel(vision_config, text_config)
    mesh = mesh or create_mesh(cfg.mesh)

    rng = jax.random.PRNGKey(cfg.seed)
    sample_px = jnp.zeros(
        (2, vision_config.image_size, vision_config.image_size, 3),
        jnp.bfloat16,
    )
    sample_ids = jnp.zeros((2, text_config.max_length), jnp.int32)
    if init_params is None:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            init_params = model.init(
                rng, pixel_values=sample_px, input_ids=sample_ids
            )["params"]

    steps_per_epoch = max(1, len(df) // cfg.batch_size)
    total_steps = steps_per_epoch * cfg.num_epochs
    tx, _ = make_pretrain_optimizer(cfg, total_steps)
    mask = trainable_mask(init_params)

    data_shard = NamedSharding(mesh, P(cfg.mesh.data_axis))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(init_params, repl)
    opt_state = jax.jit(tx.init)(params)

    step_fn = jax.jit(
        lambda p, o, b: pretrain_step(p, o, b, model, tx, mask),
        in_shardings=(repl, None, data_shard),
        donate_argnums=(0, 1),
    )

    it = CaptionedBatchIterator(
        df,
        tokenize_fn,
        cfg.batch_size,
        vision_config.image_size,
        seed=cfg.seed,
    )
    mlog = metrics_logger or MetricsLogger(project="geoguessr-tpu-pretrain")

    def save_checkpoint(name: str):
        if checkpoint_dir is None:
            return
        import os
        import shutil

        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(checkpoint_dir), name)
        shutil.rmtree(path, ignore_errors=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": jax.device_get(params)})
        ckptr.wait_until_finished()

    losses = []
    step = 0
    for epoch in range(cfg.num_epochs):
        for batch in it:
            device_batch = {
                "pixel_values": fused_preprocess(
                    jax.device_put(batch["pixel_values"], data_shard),
                    C.CLIP_NORM_MEAN,
                    C.CLIP_NORM_STD,
                    vision_config.image_size,
                ),
                "input_ids": jax.device_put(
                    batch["input_ids"], data_shard
                ),
            }
            params, opt_state, loss = step_fn(
                params, opt_state, device_batch
            )
            step += 1
            losses.append(float(loss))
            if step % 10 == 0 or step == 1:
                mlog.log({"pretrain/loss": losses[-1]}, step)
            if cfg.save_every_steps and step % cfg.save_every_steps == 0:
                save_checkpoint(f"step_{step:07d}")
            if max_steps is not None and step >= max_steps:
                break
        if max_steps is not None and step >= max_steps:
            break
    save_checkpoint("last")
    mlog.finish()
    return {"params": jax.device_get(params), "losses": losses}


def hash_tokenizer(vocab_size: int = 49408, max_length: int = 77):
    """Deterministic fallback tokenizer (tests / no-BPE-assets envs):
    whitespace split + stable hash into the vocab, EOT = vocab_size - 1."""

    def tokenize(texts: List[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [49406 % vocab_size]  # BOS
            for w in t.lower().split()[: max_length - 2]:
                h = int(
                    hashlib.md5(w.encode()).hexdigest()[:8], 16
                ) % (vocab_size - 3)
                toks.append(1 + h)
            toks.append(vocab_size - 1)  # EOT (max id -> pooling target)
            out[i, : len(toks)] = toks
        return out

    return tokenize
