"""Serving engine: build-once, jit-once inference over SuperGuessr.

The shared machinery behind inference.py, run_benchmark.py and the FastAPI
app — unlike the reference, which rebuilds the model per call site (and in
run_local_benchmarking.py per *sample*, flagged in SURVEY.md §3.3 as a
pattern not to copy).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.config import BackboneConfig
from geoguessr_ai_tpu.data.pipeline import decode_jpeg
from geoguessr_ai_tpu.geocells.manager import CentroidTable
from geoguessr_ai_tpu.models import SuperGuessr
from geoguessr_ai_tpu.models.super_guessr import decode_predictions
from geoguessr_ai_tpu.models.torch_convert import (
    merge_params,
    super_guessr_head_from_reference,
    tinyvit_from_timm,
    clip_vision_from_hf,
)
from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
from geoguessr_ai_tpu.utils.logging import logger


@dataclasses.dataclass
class InferenceResult:
    lat: float
    lon: float
    top_ids: List[int]
    top_probs: List[float]
    top_countries: List[str]
    top_admin1: List[str]
    embedding: np.ndarray


class ServingEngine:
    """Holds model params + centroid table; serves panorama batches."""

    def __init__(
        self,
        backbone: str = "tinyvit",
        checkpoint: Optional[str] = None,
        centroid_table: Optional[CentroidTable] = None,
        num_candidates: int = C.NUM_CANDIDATES,
        hierarchical: bool = False,
    ):
        from geoguessr_ai_tpu.train.coordinator import build_backbone

        self.table = centroid_table or CentroidTable.load(
            C.CENTROID_TABLE_PATH
        )
        bb_cfg = (
            BackboneConfig.tinyvit()
            if backbone == "tinyvit"
            else BackboneConfig.clip()
        )
        bb, mean, std, image_size = build_backbone(bb_cfg)
        self.image_size = image_size
        self.norm = (mean, std)
        self.num_candidates = min(num_candidates, self.table.num_cells)
        self.model = SuperGuessr(
            num_cells=self.table.num_cells,
            backbone=bb,
            panorama=True,
            hierarchical=hierarchical,
            embed_dim=bb_cfg.embed_dim,
        )
        # Init on host CPU (fast) — unjitted init through a device tunnel is
        # minutes; see .claude/skills/verify/SKILL.md.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            self.variables = self.model.init(
                jax.random.PRNGKey(0),
                pixel_values=jnp.zeros(
                    (1, C.NUM_PANORAMA_VIEWS, image_size, image_size, 3),
                    jnp.bfloat16,
                ),
            )
        if checkpoint:
            self.load_checkpoint(checkpoint, backbone)
        self.variables = jax.device_put(self.variables, jax.devices()[0])
        self.centroids = jax.device_put(
            jnp.asarray(self.table.centroids), jax.devices()[0]
        )

        model = self.model
        k = self.num_candidates

        def _serve(variables, pixel_values, centroids, view_mask=None):
            emb, logits = model.apply(
                variables, pixel_values=pixel_values, view_mask=view_mask
            )
            probs, preds, lnglat, topk = decode_predictions(
                logits, centroids, k
            )
            return lnglat, topk.values, topk.indices, emb

        self._serve = jax.jit(_serve)

    # ------------------------------------------------------------------

    def load_checkpoint(self, path: str, backbone: str) -> None:
        """Load our orbax checkpoint dir or a reference .pt state dict."""
        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(path)
            params = restored["state"]["params"]
            self.variables = dict(self.variables)
            self.variables["params"] = params
            if "batch_stats" in restored["state"]:
                self.variables["batch_stats"] = restored["state"][
                    "batch_stats"
                ]
            logger.info(f"loaded orbax checkpoint {path}")
            return
        from geoguessr_ai_tpu.train.checkpoints import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        overlay = super_guessr_head_from_reference(
            sd, num_cells=self.table.num_cells
        )
        # backbone weights when present in the state dict
        bb_sd = {
            k.split("base_model.", 1)[1]: v
            for k, v in sd.items()
            if k.startswith("base_model.")
        }
        variables = {k: dict(v) for k, v in self.variables.items()}
        if bb_sd:
            try:
                if backbone == "tinyvit":
                    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig

                    strip = {
                        k.split("backbone.", 1)[-1]: v
                        for k, v in bb_sd.items()
                    }
                    conv = tinyvit_from_timm(
                        strip, TinyViTConfig.tiny_vit_21m_512()
                    )
                    variables["params"]["backbone"] = conv["params"]
                    variables.setdefault("batch_stats", {})["backbone"] = (
                        conv["batch_stats"]
                    )
                else:
                    from geoguessr_ai_tpu.models.clip_vit import (
                        CLIPVisionConfig,
                    )

                    variables["params"]["backbone"] = clip_vision_from_hf(
                        bb_sd, CLIPVisionConfig.vit_l_14_336()
                    )
            except KeyError as e:
                logger.warning(f"backbone conversion skipped ({e})")
        variables["params"] = merge_params(variables["params"], overlay)
        self.variables = variables
        logger.info(
            f"loaded reference checkpoint {path} "
            f"({len(overlay)} head subtrees, backbone={'yes' if bb_sd else 'no'})"
        )

    # ------------------------------------------------------------------

    def predict_batch(
        self,
        panoramas_u8: np.ndarray,
        view_mask: Optional[np.ndarray] = None,
    ) -> List[InferenceResult]:
        """panoramas_u8: (B, V, H, W, 3) uint8 at self.image_size.

        view_mask: optional (B, V) 1/0 mask of real views — panoramas with
        <4 decoded views arrive zero-padded from PanoramaBatchIterator, and
        masked fusion here matches training-time masked fusion (train/serve
        skew otherwise: black frames would be averaged in)."""
        mean, std = self.norm
        pixels = fused_preprocess(
            jnp.asarray(panoramas_u8), tuple(mean), tuple(std),
            self.image_size,
        )
        mask = (
            jnp.asarray(view_mask, jnp.float32)
            if view_mask is not None
            else None
        )
        lnglat, top_vals, top_idx, emb = self._serve(
            self.variables, pixels, self.centroids, mask
        )
        lnglat = np.asarray(lnglat)
        top_vals = np.asarray(top_vals)
        top_idx = np.asarray(top_idx)
        emb = np.asarray(emb.astype(jnp.float32))
        out = []
        for b in range(lnglat.shape[0]):
            ids = top_idx[b].tolist()
            out.append(
                InferenceResult(
                    lat=float(lnglat[b, 1]),
                    lon=float(lnglat[b, 0]),
                    top_ids=ids,
                    top_probs=top_vals[b].tolist(),
                    top_countries=[str(self.table.country[i]) for i in ids],
                    top_admin1=[str(self.table.admin1[i]) for i in ids],
                    embedding=emb[b],
                )
            )
        return out

    def predict_images(
        self, image_paths: Sequence[str]
    ) -> InferenceResult:
        """1 or 4 image files -> one panorama prediction (reference
        inference.py:103-106 accepts exactly 1 or 4)."""
        if len(image_paths) not in (1, 4):
            raise ValueError("supply exactly 1 or 4 images")
        views = np.zeros(
            (1, C.NUM_PANORAMA_VIEWS, self.image_size, self.image_size, 3),
            np.uint8,
        )
        for v, p in enumerate(image_paths):
            with open(p, "rb") as f:
                views[0, v] = decode_jpeg(f.read(), self.image_size)
        if len(image_paths) == 1:
            views[0, 1:] = views[0, 0]  # replicate single image across views
        return self.predict_batch(views)[0]


class MicroBatcher:
    """Coalesces concurrent single-panorama requests into one device
    batch (the serving-side analogue of training's batched step — the
    per-request path would run the jitted program at B=1 and waste the
    chip; ROADMAP serving item).

    Requests are gathered for up to ``max_wait_ms`` or until
    ``max_batch``; the batch is padded up to a fixed bucket size so the
    engine's jitted program compiles once per bucket, not per arrival
    count."""

    def __init__(
        self,
        engine: ServingEngine,
        max_batch: int = 16,
        max_wait_ms: float = 8.0,
        buckets: Sequence[int] = (1, 4, 8, 16),
        predict_timeout_s: float = 1800.0,
        linger_ms: float = 25.0,
    ):
        import queue
        import threading

        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        # Rolling window: each arrival extends the collection deadline
        # by linger_ms (bounded by the hard cap below), so requests
        # STAGGERED by upstream decode/network still coalesce into one
        # bucket instead of splitting into padded half-batches (the
        # round-5 load run dispatched 72 bucket slots for 48 real
        # requests at concurrency 8 with the fixed 8 ms window).
        # Cost: a LONE request (idle service) waits the full linger
        # window before dispatch — +~17 ms on this box's ~250 ms p50.
        # Set linger_ms=0 to restore pure max_wait_ms behavior for
        # latency-critical low-traffic deployments.
        self.linger_s = linger_ms / 1000.0
        # Hard cap on total collection time from the first arrival —
        # bounds the latency a linger chain can add.
        self.max_linger_total_s = max(self.max_wait_s, 8 * self.linger_s)
        self.buckets = sorted(buckets)
        assert self.max_batch <= self.buckets[-1]
        # Default covers the worst-case cold-bucket jit compile (remote
        # compiles through the axon relay run 4-15+ min); warmed-up
        # deployments can tighten it.
        self.predict_timeout_s = predict_timeout_s
        self._q: "queue.Queue" = queue.Queue()
        self._thread = None
        self._lock = threading.Lock()

    def _ensure_thread(self):
        import threading

        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._loop, daemon=True
                )
                self._thread.start()

    def _loop(self):
        import queue
        import time

        while True:
            item = self._q.get()
            batch = [item]
            t0 = time.perf_counter()
            hard_deadline = t0 + self.max_linger_total_s
            # the first arrival gets the linger window too — a fixed
            # short base window can never coalesce arrivals staggered
            # by more than itself (the 8 ms window split the round-5
            # load run into padded half-batches)
            deadline = t0 + max(self.max_wait_s, self.linger_s)
            while len(batch) < self.max_batch:
                remaining = min(deadline, hard_deadline) - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                    # rolling linger: another arrival means more are
                    # likely in flight — extend the window (monotonic
                    # max so linger_ms=0 degrades to the fixed window)
                    deadline = max(
                        deadline, time.perf_counter() + self.linger_s
                    )
                except queue.Empty:
                    break
            try:
                views = np.stack([b[1] for b in batch])
                masks = np.stack([b[2] for b in batch])
                bucket = next(
                    s for s in self.buckets if s >= len(batch)
                )
                if bucket > len(batch):  # pad by repeating the last row
                    reps = bucket - len(batch)
                    views = np.concatenate(
                        [views, np.repeat(views[-1:], reps, axis=0)]
                    )
                    masks = np.concatenate(
                        [masks, np.repeat(masks[-1:], reps, axis=0)]
                    )
                results = self.engine.predict_batch(views, view_mask=masks)
                for (fut, _, _), r in zip(batch, results):
                    fut.set_result(r)
            except Exception as e:  # deliver the failure to every waiter
                for fut, _, _ in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def warmup(self, num_views: int = 4) -> None:
        """Precompile every bucket size (first-request latency otherwise
        pays a compile per bucket on TPU)."""
        size = self.engine.image_size
        for b in self.buckets:
            views = np.zeros((b, num_views, size, size, 3), np.uint8)
            masks = np.ones((b, num_views), np.float32)
            self.engine.predict_batch(views, view_mask=masks)

    def predict(
        self,
        views_u8: np.ndarray,
        view_mask: Optional[np.ndarray] = None,
        timeout: Optional[float] = None,
    ) -> InferenceResult:
        """Blocking single-panorama predict: (V, H, W, 3) uint8 ->
        InferenceResult, batched with concurrent callers.  ``timeout``
        defaults to ``predict_timeout_s`` (sized for cold-bucket jit
        compiles; see warmup())."""
        import concurrent.futures

        self._ensure_thread()
        if view_mask is None:
            view_mask = np.ones((views_u8.shape[0],), np.float32)
        fut: "concurrent.futures.Future" = concurrent.futures.Future()
        self._q.put((fut, views_u8, np.asarray(view_mask, np.float32)))
        return fut.result(
            timeout=self.predict_timeout_s if timeout is None else timeout
        )
