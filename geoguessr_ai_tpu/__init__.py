"""TPU-native Street View geolocation framework.

A brand-new JAX/XLA/Pallas/pjit re-design of the CogitoNTNU/geoguessr-ai
capabilities: geocell classification over panorama embeddings (SuperGuessr),
prototype refinement (ProtoRefiner), TinyViT-21M / CLIP-ViT-L vision towers,
haversine-aware losses, SQLite/S3 dataset backends, and data-parallel (+
optional tensor-parallel) training over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md, re-architected TPU-first):
  geo/       pure-JAX geodesy + scoring (haversine, ECEF, label smoothing)
  geocells/  semantic geocell generation + manager + centroid table
  data/      SQLite/S3 panorama datasets, native JPEG decode, device prefetch
  ops/       Pallas/XLA kernels (fused preprocess, soft-CE, haversine labels)
  models/    Flax vision towers + SuperGuessr + ProtoRefiner
  parallel/  device mesh + sharding rules
  train/     jitted train/eval steps, coordinator, checkpoints, CLIP pretrain
  eval/      benchmark + metrics (GeoGuessr score)
  serving/   FastAPI app (optional dependency)
  acquisition/  point sampling + Street View collection (offline tools)
"""

__version__ = "0.1.0"

from geoguessr_ai_tpu import config as config  # noqa: F401
