from geoguessr_ai_tpu.eval.metrics import (
    geoguessr_score_np,
    haversine_km_np,
    summarize_results,
)

__all__ = ["geoguessr_score_np", "haversine_km_np", "summarize_results"]
