"""Embedding-dataset builder: batch TPU inference writing SQLite.

Re-design of the reference's GPU embedding builders (backend/s3bucket.py:
786-1094 CLIP, :1097-1396 TinyViT): a host thread pool decodes JPEGs into a
bounded queue while the TPU runs a jitted embed step on fixed-size batches;
a single writer thread batches INSERTs (reference's single-writer WAL
discipline).  float32 embedding blobs + embedding_dim column, schema
identical to the reference so readers interoperate.

This is the workload behind BASELINE.json's panoramas/sec/chip metric.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Optional

import numpy as np

from geoguessr_ai_tpu.config import BackboneConfig, EmbedBuildConfig
from geoguessr_ai_tpu.data.pipeline import ThroughputMeter, decode_jpeg
from geoguessr_ai_tpu.data.sqlite_dataset import (
    create_sqlite_from_records,
    load_sqlite_dataset,
)
from geoguessr_ai_tpu.utils.logging import logger


class Embedder:
    """Jit-once batch embedder over a vision backbone.

    quant_mode="static" (TinyViT only; EmbedBuildConfig default) runs
    the measured-fastest inference config — static-calibrated int8 MLP
    GEMMs (docs/performance.md round-3): scales calibrate on the FIRST
    batch of REAL decoded images via a host-CPU f32 forward, then the
    device program carries int8 dots with no data-dependent quant."""

    def __init__(
        self,
        backbone_cfg: BackboneConfig,
        quant_mode: str = "none",
        mesh=None,
    ):
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp

        from geoguessr_ai_tpu.ops.preprocess import fused_preprocess
        from geoguessr_ai_tpu.train.coordinator import build_backbone

        module, mean, std, image_size = build_backbone(backbone_cfg)
        self.image_size = image_size
        self.embed_dim = backbone_cfg.embed_dim
        self._mean, self._std = mean, std
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            self.variables = module.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16),
            )

        def embed(variables, images_u8):
            x = fused_preprocess(
                images_u8, tuple(mean), tuple(std), image_size
            )
            return module.apply(variables, x).astype(jnp.float32)

        # Multi-chip: shard the image batch over the mesh's data axis
        # (replicated params) — the DEVICE-parallel analog of the
        # reference's Accelerate multi-GPU embed extraction
        # (preprocessing/embed.py:36-38); XLA gathers the sharded output
        # when fetched.  Single chip: plain jit.
        self.mesh = mesh
        if mesh is not None:
            from geoguessr_ai_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
            )

            self.variables = jax.device_put(
                self.variables, replicated(mesh)
            )
            self._embed = jax.jit(
                embed,
                in_shardings=(None, batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh),
            )
        else:
            self.variables = jax.device_put(
                self.variables, jax.devices()[0]
            )
            self._embed = jax.jit(embed)

        self.quant_mode = (
            quant_mode if backbone_cfg.name == "tinyvit" else "none"
        )
        self._act_scales = None
        if self.quant_mode == "static":
            from geoguessr_ai_tpu.models.tinyvit import (
                PROD_QUANT_SITES,
                TinyViT,
                TinyViTConfig,
            )

            base = TinyViTConfig.tiny_vit_21m_512()
            self._cal_model = TinyViT(
                _dc.replace(
                    base, dtype=jnp.float32, quant_mode="calibrate"
                )
            )
            mq = TinyViT(
                _dc.replace(
                    base,
                    quant_mode="static",
                    quant_sites=PROD_QUANT_SITES,
                    fused_block_stages=(1, 3),
                    pallas_attention_stages=(),
                )
            )

            def embed_q(variables, scales, images_u8):
                x = fused_preprocess(
                    images_u8, tuple(mean), tuple(std), image_size
                )
                return mq.apply(
                    {**variables, "act_scales": scales}, x
                ).astype(jnp.float32)

            if mesh is not None:
                from geoguessr_ai_tpu.parallel.mesh import batch_sharding

                self._embed_q = jax.jit(
                    embed_q,
                    in_shardings=(None, None, batch_sharding(mesh)),
                    out_shardings=batch_sharding(mesh),
                )
            else:
                self._embed_q = jax.jit(embed_q)

    def _calibrate(self, images_u8: np.ndarray) -> None:
        """One host-CPU f32 forward on (a slice of) the first real batch
        records per-site activation abs-max."""
        import jax
        import jax.numpy as jnp

        from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

        cpu = jax.devices("cpu")[0]
        n = min(8, images_u8.shape[0])
        x = (
            images_u8[:n].astype(np.float32) / 255.0
            - np.asarray(self._mean, np.float32)
        ) / np.asarray(self._std, np.float32)
        with jax.default_device(cpu):
            stats = calibrate_act_stats(
                jax.jit(
                    lambda v, xx: self._cal_model.apply(
                        v, xx, mutable=["act_stats"]
                    )
                ),
                jax.device_put(self.variables, cpu),
                [jnp.asarray(x)],
            )
        if self.mesh is not None:
            from geoguessr_ai_tpu.parallel.mesh import replicated

            target = replicated(self.mesh)
        else:
            target = jax.devices()[0]
        self._act_scales = jax.device_put(
            jax.tree.map(jnp.asarray, stats), target
        )

    def load_params(self, variables) -> None:
        import jax

        # Mirror __init__'s placement: a mesh-mode Embedder's jitted
        # sharded embed needs mesh-replicated params — pinning to
        # devices()[0] would hand the sharded program single-device-
        # committed params (placement error / silent unsharded fallback).
        # getattr: test doubles subclass Embedder without running __init__.
        if getattr(self, "mesh", None) is not None:
            from geoguessr_ai_tpu.parallel.mesh import replicated

            target = replicated(self.mesh)
        else:
            target = jax.devices()[0]
        self.variables = jax.device_put(variables, target)
        self._act_scales = None  # recalibrate for the new weights

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        # getattr: test doubles subclass Embedder without running __init__
        if getattr(self, "quant_mode", "none") == "static":
            if self._act_scales is None:
                self._calibrate(images_u8)
            return np.asarray(
                self._embed_q(self.variables, self._act_scales, images_u8)
            )
        return np.asarray(self._embed(self.variables, images_u8))


def build_embedding_sqlite(
    src_sqlite: str,
    out_sqlite: str,
    cfg: EmbedBuildConfig = EmbedBuildConfig(),
    embedder: Optional[Embedder] = None,
    limit: Optional[int] = None,
    log_fn=None,
    predecoded: bool = False,
    resume: bool = True,
) -> int:
    """Embed every image row of a raw SQLite into an embedding SQLite.

    Returns rows written.  Telemetry records mode/processed/total/
    throughput_img_per_s/phase like the reference (s3bucket.py:960-970).

    resume=True skips (location_id, heading) rows already present in an
    existing out_sqlite, so a killed build restarts where it stopped —
    the reference's ledger-resume pattern (street_view_images_collection/
    main.py:245-263) applied to the embedding builder; the WAL writer's
    INSERT OR REPLACE keeps re-runs idempotent either way.

    predecoded=True decodes the WHOLE shard to uint8 up front and streams
    in-memory batches to the device — decouples device throughput from
    host decode so the device-limited rate is measurable on boxes with
    few cores (this image has 1; per-core decode rates in
    tools/bench_host_decode.py ground the many-core host projection).
    """
    import os

    df = load_sqlite_dataset(src_sqlite)
    if limit:
        df = df.iloc[:limit]
    if resume and os.path.exists(out_sqlite):
        import sqlite3

        with sqlite3.connect(f"file:{out_sqlite}?mode=ro", uri=True) as c:
            done = set(
                c.execute("SELECT location_id, heading FROM samples")
            )
        if done:
            keys = list(zip(df["location_id"], df["heading"].astype(int)))
            mask = np.asarray([k not in done for k in keys])
            skipped = int((~mask).sum())
            if skipped:
                logger.info(
                    f"resume: skipping {skipped} already-embedded rows"
                )
            df = df[mask]
    # Multi-host: each host embeds its own row shard (the TPU analog of
    # the reference's Accelerate gather across GPUs, preprocessing/
    # embed.py:36-38 — shards recombine by concatenating the SQLites).
    import jax

    if jax.process_count() > 1:
        from geoguessr_ai_tpu.parallel.mesh import host_shard_range

        lo, hi = host_shard_range(len(df))
        df = df.iloc[lo:hi]
    total = len(df)
    if embedder is None:
        mesh = None
        dp = getattr(cfg, "data_parallel", 0)
        if dp and dp != 1:
            from geoguessr_ai_tpu.config import MeshConfig
            from geoguessr_ai_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(
                MeshConfig(data_parallel=dp, model_parallel=1)
            )
        embedder = Embedder(
            cfg.backbone,
            quant_mode=getattr(cfg, "quant_mode", "none"),
            mesh=mesh,
        )
    meter = ThroughputMeter(
        mode=f"embed_{cfg.backbone.name}", total=total, log_fn=log_fn
    )

    decoded_q: "queue.Queue" = queue.Queue(maxsize=4)
    B = cfg.batch_size
    producer_error: list = []  # surfaced to the consumer after the sentinel

    def producer_predecoded():
        # decode the WHOLE shard up front, then stream pure-memory batches
        import concurrent.futures as cf

        rows = list(df.itertuples())
        with cf.ThreadPoolExecutor(cfg.fetch_threads) as pool:
            all_imgs = np.stack(
                list(
                    pool.map(
                        lambda r: decode_jpeg(r.image, embedder.image_size),
                        rows,
                    )
                )
            ) if rows else np.zeros(
                (0, embedder.image_size, embedder.image_size, 3), np.uint8
            )
        meter.update(0, phase="predecode_done")
        for start in range(0, len(rows), B):
            decoded_q.put(
                (rows[start : start + B], all_imgs[start : start + B])
            )

    def producer_streaming():
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(cfg.fetch_threads) as pool:
            batch_rows = []
            for row in df.itertuples():
                batch_rows.append(row)
                if len(batch_rows) == B:
                    imgs = np.stack(
                        list(
                            pool.map(
                                lambda r: decode_jpeg(
                                    r.image, embedder.image_size
                                ),
                                batch_rows,
                            )
                        )
                    )
                    decoded_q.put((batch_rows, imgs))
                    batch_rows = []
            if batch_rows:
                imgs = np.stack(
                    list(
                        pool.map(
                            lambda r: decode_jpeg(
                                r.image, embedder.image_size
                            ),
                            batch_rows,
                        )
                    )
                )
                decoded_q.put((batch_rows, imgs))

    def producer():
        # The sentinel MUST reach the queue even if decode raises on a
        # truly corrupt blob — otherwise record_stream blocks forever on
        # decoded_q.get() and the builder hangs instead of failing.
        try:
            (producer_predecoded if predecoded else producer_streaming)()
        except BaseException as e:
            producer_error.append(e)
        finally:
            decoded_q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def record_stream() -> Iterable[Dict]:
        while True:
            item = decoded_q.get()
            if item is None:
                if producer_error:
                    raise RuntimeError(
                        "embed-builder producer failed"
                    ) from producer_error[0]
                break
            rows, imgs = item
            n_real = len(rows)
            if n_real < B:  # pad to the jitted batch shape
                imgs = np.concatenate(
                    [imgs, np.zeros((B - n_real,) + imgs.shape[1:], imgs.dtype)]
                )
            embs = embedder(imgs)[:n_real]
            meter.update(n_real, phase="embed")
            for row, emb in zip(rows, embs):
                yield {
                    "location_id": row.location_id,
                    "lat": float(row.lat),
                    "lon": float(row.lon),
                    "heading": int(row.heading),
                    "capture_date": getattr(row, "capture_date", None),
                    "pano_id": getattr(row, "pano_id", None),
                    "batch_date": getattr(row, "batch_date", None),
                    "embedding": np.asarray(emb, np.float32).tobytes(),
                    "embedding_dim": int(emb.shape[-1]),
                }

    written = create_sqlite_from_records(
        out_sqlite, record_stream(), embedding=True
    )
    t.join()
    logger.info(
        f"embedded {written}/{total} rows -> {out_sqlite} "
        f"({meter.update(0)['throughput_img_per_s']:.0f} img/s)"
    )
    return written
