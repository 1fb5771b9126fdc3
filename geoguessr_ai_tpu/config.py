"""Unified typed configuration for the TPU framework.

The reference scatters configuration across four mechanisms (module constants,
per-coordinator dataclasses, argparse, .env — see /root/reference/config.py and
main_coordinator_idun.py:203-221).  Here everything lives in typed, frozen
dataclasses with a single module of physical/model constants, so a config can
be logged, serialized, and passed through jit boundaries as static data.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

# ---------------------------------------------------------------------------
# Physical / scoring constants (contract with the reference, see BASELINE.md)
# ---------------------------------------------------------------------------

#: Earth radius used by the model-side haversine matrix (meters).
#: Reference: models/utils.py:35 (rad = 6378137.0, WGS84 semi-major axis).
EARTH_RADIUS_MODEL_M = 6378137.0

#: Earth radius used by the benchmark-side haversine (meters).
#: Reference: run_benchmark.py:25-47 uses 6371000.
EARTH_RADIUS_BENCH_M = 6371000.0

#: WGS84 flattening factor. Reference: geo_utils.py:7.
WGS84_FLATTENING = 1.0 / 298.257223563

#: Haversine label-smoothing constant (km). Reference: config.py:52 (PIGEOTTO).
LABEL_SMOOTHING_CONSTANT_KM = 65.0

#: GeoGuessr score decay constant (km): score = 5000*exp(-d/DECAY).
#: Reference: config.py:49, run_benchmark.py:50-65.
GEOGUESSR_DECAY_CONSTANT_KM = 1492.7

#: PIGEOTTO geocell size bounds. Reference: config.py:29-30.
MIN_CELL_SIZE = 1000
MAX_CELL_SIZE = 2000

#: Geocell generation bounds actually used by the reference generator
#: (generate_geocells.py combine<10 / split>67).
GENERATOR_MIN_POINTS = 10
GENERATOR_MAX_POINTS = 67

# ---------------------------------------------------------------------------
# Model constants
# ---------------------------------------------------------------------------

#: HF id of the CLIP backbone. Reference: config.py:6.
CLIP_MODEL_NAME = "openai/clip-vit-large-patch14-336"
CLIP_EMBED_DIM = 1024
CLIP_IMAGE_SIZE = 336
CLIP_NORM_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_NORM_STD = (0.26862954, 0.26130258, 0.27577711)

#: timm id of the TinyViT backbone. Reference: config.py:9.
TINYVIT_MODEL_NAME = "tiny_vit_21m_512.dist_in22k_ft_in1k"
TINYVIT_EMBED_DIM = 576
TINYVIT_IMAGE_SIZE = 512
TINYVIT_NORM_MEAN = (0.485, 0.456, 0.406)  # ImageNet stats (timm data cfg)
TINYVIT_NORM_STD = (0.229, 0.224, 0.225)

#: Panorama views per location (4 headings at 0/90/180/270 + yaw seed).
NUM_PANORAMA_VIEWS = 4

#: Self-attention heads in the hierarchical view-fusion path.
#: Reference: super_guessr.py:14.
NUM_ATTENTION_HEADS = 16

#: Default top-k geocell candidates handed to the refiner.
NUM_CANDIDATES = 5

# ---------------------------------------------------------------------------
# Paths (overridable via environment)
# ---------------------------------------------------------------------------

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.environ.get("GEO_TPU_DATA_DIR", os.path.join(REPO_ROOT, "data"))
GEOCELL_DIR = os.environ.get(
    "GEO_TPU_GEOCELL_DIR", os.path.join(DATA_DIR, "geocells")
)
#: Pre-built centroid table artifact: (num_cells, 2) float32 (lng, lat).
CENTROID_TABLE_PATH = os.environ.get(
    "GEO_TPU_CENTROIDS", os.path.join(GEOCELL_DIR, "centroid_table.npz")
)
CHECKPOINT_DIR = os.environ.get(
    "GEO_TPU_CKPT_DIR", os.path.join(REPO_ROOT, "checkpoints")
)
S3_BUCKET = os.environ.get("GEO_TPU_S3_BUCKET", "cogito-geoguessr")
S3_REGION = os.environ.get("GEO_TPU_S3_REGION", "eu-north-1")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache.

    First compiles of the 21M-param model take minutes (especially through
    a remote-compile tunnel); the on-disk cache makes every later process
    start warm.  Called by the serving engine, coordinator and bench.
    Override the location with GEO_TPU_COMPILE_CACHE (set to "0" to
    disable).
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("GEO_TPU_COMPILE_CACHE")
        or os.path.join(REPO_ROOT, ".jax_cache")
    )
    if cache_dir == "0":
        return ""
    # TPU backends only: CPU AOT entries are machine-feature-pinned and
    # reload with SIGILL-risk mismatch warnings (observed), and the axon
    # remote-compile tunnel bypasses the cache anyway.
    try:
        if jax.default_backend() != "tpu":
            return ""
    except Exception:
        return ""
    # Key the directory by backend + hostname: CPU AOT entries (from
    # model.init on the host device) are machine-feature-pinned, and
    # reloading one compiled on a different machine risks SIGILL.  A
    # per-host subdir means stale cross-machine entries are never seen
    # (same-host reloads may still emit spurious tuning-flag warnings
    # from the XLA:CPU AOT loader; those are safe).
    import platform as _platform

    cache_dir = os.path.join(
        cache_dir, f"{jax.default_backend()}-{_platform.node() or 'host'}"
    )
    # Best-effort: the cache is a pure optimization, so never let it take
    # down an entry point (read-only checkouts, bad override paths, or a
    # JAX without the flag all just disable it, loudly).
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:
        import logging

        logging.getLogger("geoguessr_ai_tpu").warning(
            f"compilation cache disabled ({e})"
        )
        return ""
    return cache_dir


def _frozen(cls):
    return dataclasses.dataclass(frozen=True)(cls)


# ---------------------------------------------------------------------------
# Typed configs
# ---------------------------------------------------------------------------


@_frozen
class MeshConfig:
    """Device-mesh layout.

    data x model axes; `data` shards the batch (replacing the reference's
    Accelerate DDP, SURVEY.md §2.6), `model` optionally shards the ~12.6k-way
    cell layer and ViT MLP/attention heads (new TPU headroom).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    #: -1 = use all devices on the data axis.
    data_parallel: int = -1
    model_parallel: int = 1


@_frozen
class BackboneConfig:
    """Which vision tower feeds SuperGuessr."""

    name: str = "tinyvit"  # "tinyvit" | "clip" | "none" (raw embeddings)
    image_size: int = TINYVIT_IMAGE_SIZE
    embed_dim: int = TINYVIT_EMBED_DIM
    freeze_base: bool = False
    #: Freeze all but the last stage (reference TinyViT finetune recipe,
    #: super_guessr.py:152-153).
    freeze_all_but_last_stage: bool = True
    dtype: str = "bfloat16"  # compute dtype on TPU
    #: QAT int8-activation-storage in the TRAIN step (tinyvit only):
    #: the differentiable storage sites (models.tinyvit
    #: TRAIN_QUANT_SITES, STE-backed) run quant_mode="static" with
    #: scales calibrated at train() startup.  Off by default — the
    #: reference trains full-precision; opt in for the HBM-bytes win
    #: measured in tools/exp_r5_trainquant.py.
    qat_storage: bool = False

    @staticmethod
    def tinyvit() -> "BackboneConfig":
        return BackboneConfig(
            name="tinyvit",
            image_size=TINYVIT_IMAGE_SIZE,
            embed_dim=TINYVIT_EMBED_DIM,
        )

    @staticmethod
    def clip() -> "BackboneConfig":
        return BackboneConfig(
            name="clip", image_size=CLIP_IMAGE_SIZE, embed_dim=CLIP_EMBED_DIM
        )

    @staticmethod
    def clip_b32() -> "BackboneConfig":
        """CLIP ViT-B/32 (BASELINE.json config 2: batch embedding
        extraction)."""
        return BackboneConfig(name="clip_b32", image_size=224, embed_dim=768)


@_frozen
class ModelConfig:
    """SuperGuessr head configuration (reference super_guessr.py:20-32)."""

    backbone: BackboneConfig = BackboneConfig()
    panorama: bool = True
    hierarchical: bool = False
    should_smooth_labels: bool = True
    num_candidates: int = NUM_CANDIDATES
    embed_dim: int = TINYVIT_EMBED_DIM
    num_cells: int = 12623  # overridden by the centroid table at build time


@_frozen
class OptimizerConfig:
    """AdamW + cosine-warm-restarts (reference main_coordinator_idun.py)."""

    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    #: CosineAnnealingWarmRestarts T_0 (in epochs).
    cosine_t0: int = 1
    cosine_t_mult: int = 2
    warmup_steps: int = 0


@_frozen
class TrainConfig:
    """Training-loop knobs (reference Configuration dataclass + TRAIN_ARGS)."""

    seed: int = 330
    batch_size: int = 24  # per-replica panorama batch (reference: 24 TinyViT)
    num_epochs: int = 1000
    eval_every_steps: int = 1000
    #: Per-log host reads sync the device; 10 keeps the reference's
    #: per-batch-ish logging without a per-step pipeline stall.
    log_every_steps: int = 10
    #: Checkpoint retention: keep last + best + top-K epoch checkpoints.
    keep_last_n: int = 3
    #: Overlap checkpoint IO with the next epoch's compute (orbax async
    #: save + background last/best copies; train.checkpoints).
    async_checkpoints: bool = False
    early_stop_patience: int = 10
    monitored_metric: str = "val_loss"
    monitored_mode: str = "min"
    resume_path: Optional[str] = None
    val_fraction: float = 0.1
    optimizer: OptimizerConfig = OptimizerConfig()
    mesh: MeshConfig = MeshConfig()
    model: ModelConfig = ModelConfig()
    #: Microbatch the step into this many scanned chunks, accumulating
    #: gradients in bf16 — activation memory of one microbatch, an
    #: alternative/complement to remat for big panorama batches
    #: (train.steps.train_step).
    grad_accum_steps: int = 1
    #: Host pipeline
    prefetch_depth: int = 2
    decode_threads: int = 8


@_frozen
class PretrainConfig:
    """CLIP contrastive pretraining (reference config.py:105-136)."""

    seed: int = 42
    batch_size: int = 960
    grad_accum_steps: int = 8
    learning_rate: float = 1e-6
    weight_decay: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    num_epochs: int = 20
    warmup_ratio: float = 0.2
    lr_schedule: str = "linear"
    eval_every_steps: int = 50
    save_every_steps: int = 50
    mesh: MeshConfig = MeshConfig()


@_frozen
class EmbedBuildConfig:
    """Embedding-dataset builder (reference s3bucket.py:786-1396)."""

    #: per chip.  Reference uses 512/GPU (config.py:63); round-3 sweep
    #: with the fused-block kernels + static-int8 MLP peaks at 512
    #: (830.5 img/s; 576+ fails to compile through the relay —
    #: docs/performance.md round-3 chapters).
    batch_size: int = 512
    fetch_threads: int = 64
    backbone: BackboneConfig = BackboneConfig()
    #: "none" (bf16) or "static" — static-calibrated int8 MLP GEMMs
    #: (TinyViT only; +1.5-2.5% measured, cosine gate 0.9999).  Scales
    #: calibrate on the FIRST decoded batch (real data) on the host CPU.
    quant_mode: str = "static"
    #: 0 = single device; N>1 (or -1 = all local devices) shards each
    #: image batch over a data-axis mesh — device-parallel embed
    #: extraction (the reference's Accelerate gather, preprocessing/
    #: embed.py:36-38).  batch_size is the GLOBAL batch.
    data_parallel: int = 0
