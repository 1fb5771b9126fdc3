from geoguessr_ai_tpu.models.outputs import ModelOutput, TopK
from geoguessr_ai_tpu.models.positional import PositionalEncoder
from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
from geoguessr_ai_tpu.models.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_mean_token_embedding,
)
from geoguessr_ai_tpu.models.super_guessr import (
    SuperGuessr,
    decode_predictions,
    forward,
    hard_ce,
    smoothed_soft_ce,
)

__all__ = [
    "ModelOutput",
    "TopK",
    "PositionalEncoder",
    "TinyViT",
    "TinyViTConfig",
    "CLIPVisionConfig",
    "CLIPVisionTower",
    "clip_mean_token_embedding",
    "SuperGuessr",
    "decode_predictions",
    "forward",
    "hard_ce",
    "smoothed_soft_ce",
]
