"""Hand-computed correctness of the on-device train/eval metrics
(train/steps._metrics): top-1/top-5, km error, GeoGuessr score against
known values (reference metric set, main_coordinator_idun.py:359-368 +
run_benchmark.py:50-117)."""

import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.train.steps import _metrics


def test_metrics_hand_computed():
    # 3 cells: Oslo, Trondheim, Sydney-ish
    centroids = jnp.asarray(
        [[10.75, 59.91], [10.40, 63.43], [151.21, -33.87]], jnp.float32
    )  # (lng, lat)
    # two samples: truth at Oslo and Trondheim
    coords = jnp.asarray([[10.75, 59.91], [10.40, 63.43]], jnp.float32)
    # sample 0 predicts Oslo (correct); sample 1 predicts Oslo (wrong,
    # truth Trondheim) with Trondheim second
    logits = jnp.asarray(
        [[5.0, 1.0, -2.0], [4.0, 3.0, -2.0]], jnp.float32
    )
    m = {k: float(v) for k, v in _metrics(
        logits, coords, centroids, jnp.asarray(0.0)
    ).items()}
    assert m["top1"] == 0.5
    assert m["top5"] == 1.0  # top-k clipped to num_cells=3; truth in set
    # sample 0 error 0 km; sample 1: Trondheim->Oslo ~392 km (R=6378137)
    assert abs(m["median_km"] - 392.0 / 2) < 3.0  # median of {0, ~392}
    assert abs(m["mean_km"] - 392.0 / 2) < 3.0
    # score: mean of 5000*exp(-d/1492.7) for d in {0, ~392}
    want = (5000.0 + 5000.0 * np.exp(-392.0 / 1492.7)) / 2
    assert abs(m["score"] - want) < 6.0


def test_eval_distances_give_true_split_median():
    """eval_step exposes per-sample distances so callers can compute the
    TRUE whole-split median (reference run_benchmark.py:284-295) instead
    of a mean of per-batch medians — the two diverge on skewed splits."""
    centroids = jnp.asarray(
        [[10.75, 59.91], [10.40, 63.43], [151.21, -33.87]], jnp.float32
    )
    # batch 1: both correct (0 km); batch 2: one correct, one ~392 km off
    batches = [
        (
            jnp.asarray([[10.75, 59.91], [10.75, 59.91]], jnp.float32),
            jnp.asarray([[5.0, 1.0, -2.0], [5.0, 1.0, -2.0]], jnp.float32),
        ),
        (
            jnp.asarray([[10.75, 59.91], [10.40, 63.43]], jnp.float32),
            jnp.asarray([[5.0, 1.0, -2.0], [4.0, 3.0, -2.0]], jnp.float32),
        ),
    ]
    dists, medians = [], []
    for coords, logits in batches:
        m = _metrics(
            logits, coords, centroids, jnp.asarray(0.0), with_distances=True
        )
        assert m["dist_km"].shape == (2,)
        dists.append(np.asarray(m["dist_km"]))
        medians.append(float(m["median_km"]))
    true_median = float(np.median(np.concatenate(dists)))
    mean_of_medians = float(np.mean(medians))
    assert true_median < 1e-3  # 3 of 4 samples are exact
    assert mean_of_medians > 90.0  # the biased aggregate would mislead


def test_metrics_perfect_predictions():
    centroids = jnp.asarray([[0.0, 0.0], [90.0, 45.0]], jnp.float32)
    coords = jnp.asarray([[0.0, 0.0], [90.0, 45.0]], jnp.float32)
    logits = jnp.asarray([[9.0, 0.0], [0.0, 9.0]], jnp.float32)
    m = _metrics(logits, coords, centroids, jnp.asarray(1.25))
    assert float(m["top1"]) == 1.0
    assert float(m["mean_km"]) < 1e-3
    assert abs(float(m["score"]) - 5000.0) < 1e-2
    assert float(m["loss"]) == 1.25
