"""CLIP pretrain tests: captions, freeze mask, contrastive loop."""

import os
import random

import numpy as np
import pytest

from geoguessr_ai_tpu.train.captions import (
    CLIMATE_DICT,
    LEFT_DRIVE,
    MONTHS,
    drives_on_right,
    select_caption,
)


def test_caption_basic_country():
    rng = random.Random(0)
    caps = {
        select_caption(
            {"country": "Norway", "region": "Trøndelag"}, rng
        )
        for _ in range(20)
    }
    assert any("in Norway." in c for c in caps)
    assert any("region of Trøndelag" in c for c in caps)
    assert all(c.startswith("A Street View photo") for c in caps)


def test_caption_the_countries_and_fallbacks():
    rng = random.Random(1)
    c = select_caption({"country": "Netherlands"}, rng)
    assert "in the Netherlands." in c
    c2 = select_caption({"country": "United States Of America"}, rng)
    assert "in the United States." in c2
    c3 = select_caption({"lat": 59.91391, "lon": 10.75225}, rng)
    assert "latitude 59.914" in c3 and "longitude 10.752" in c3
    assert select_caption({}, rng) == "A Street View photo."


def test_caption_extras_appear_with_seeds():
    found_climate = found_drive = found_month = False
    for seed in range(60):
        rng = random.Random(seed)
        c = select_caption(
            {
                "country": "Japan",
                "climate_zone": CLIMATE_DICT[14],
                "drive_right": drives_on_right("Japan"),
                "month": "May",
            },
            rng,
        )
        found_climate |= "humid subtropical climate" in c
        found_drive |= "drive on the left side" in c
        found_month |= "taken in May" in c
    assert found_climate and found_drive and found_month


def test_drive_side():
    assert drives_on_right("Norway") is True
    assert drives_on_right("Japan") is False
    assert drives_on_right(None) is None
    assert "United Kingdom" in LEFT_DRIVE
    assert MONTHS["07"] == "July"


def test_pretrain_loop_trains_only_projection(fixtures_dir):
    import jax.numpy as jnp
    import pandas as pd

    from geoguessr_ai_tpu.config import MeshConfig, PretrainConfig
    from geoguessr_ai_tpu.models.clip_text import CLIPTextConfig
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig
    from geoguessr_ai_tpu.train.pretrain_clip import (
        hash_tokenizer,
        pretrain,
        trainable_mask,
    )

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    df = pd.DataFrame(
        [
            {
                "image": blob,
                "lat": 59.9,
                "lon": 10.7,
                "country": "Norway",
                "region": "Oslo",
                "capture_date": "2023-07",
            }
            for _ in range(16)
        ]
    )
    vc = CLIPVisionConfig.test_tiny(dtype=jnp.float32)
    tc = CLIPTextConfig.test_tiny(dtype=jnp.float32)
    cfg = PretrainConfig(
        batch_size=8,
        grad_accum_steps=1,
        learning_rate=1e-3,
        num_epochs=1,
        warmup_ratio=0.0,
        mesh=MeshConfig(data_parallel=8),
    )
    tok = hash_tokenizer(vocab_size=tc.vocab_size, max_length=tc.max_length)
    out = pretrain(
        df, tok, cfg, vision_config=vc, text_config=tc, max_steps=2
    )
    assert len(out["losses"]) == 2
    assert np.isfinite(out["losses"]).all()

    # Freeze semantics: only visual_projection + logit_scale may change.
    params = out["params"]
    mask = trainable_mask(params)
    import jax

    leaves_mask = jax.tree_util.tree_leaves(mask)
    assert any(leaves_mask) and not all(leaves_mask)

    # re-init reference params with the same seed to diff
    from geoguessr_ai_tpu.models.clip_text import CLIPModel

    model = CLIPModel(vc, tc)
    init = model.init(
        jax.random.PRNGKey(cfg.seed),
        pixel_values=jnp.zeros((2, vc.image_size, vc.image_size, 3)),
        input_ids=jnp.zeros((2, tc.max_length), jnp.int32),
    )["params"]

    def assert_frozen(path, a, b):
        names = [getattr(p, "key", str(p)) for p in path]
        trainable = any(
            n in ("visual_projection", "logit_scale") for n in names
        )
        same = np.allclose(np.asarray(a), np.asarray(b))
        if not trainable:
            assert same, f"frozen param changed: {names}"

    jax.tree_util.tree_map_with_path(assert_frozen, init, params)
    # and the projection actually moved
    assert not np.allclose(
        np.asarray(init["visual_projection"]["kernel"]),
        np.asarray(params["visual_projection"]["kernel"]),
    )


def test_stop_grad_frozen_equivalent():
    """STOP_GRAD_FROZEN (XLA dead-code-eliminates the frozen towers'
    backward) is numerically identical to computing-then-zeroing those
    grads: one optimizer step with the flag on/off yields the same
    params and loss."""
    import jax
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.pretrain_clip as pc
    from geoguessr_ai_tpu.config import PretrainConfig
    from geoguessr_ai_tpu.models.clip_text import CLIPModel, CLIPTextConfig
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionConfig

    vc = CLIPVisionConfig.test_tiny(dtype=jnp.float32)
    tc = CLIPTextConfig.test_tiny(dtype=jnp.float32)
    model = CLIPModel(vc, tc)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.zeros((2, vc.image_size, vc.image_size, 3)),
        input_ids=jnp.zeros((2, tc.max_length), jnp.int32),
    )["params"]
    mask = pc.trainable_mask(params)
    tx, _ = pc.make_pretrain_optimizer(
        PretrainConfig(learning_rate=1e-3, warmup_ratio=0.0), 100
    )
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(0, 1, (4, vc.image_size, vc.image_size, 3)),
            jnp.float32,
        ),
        "input_ids": jnp.asarray(
            rng.integers(0, tc.vocab_size, (4, tc.max_length)), jnp.int32
        ),
    }
    results = {}
    for flag in (True, False):
        pc.STOP_GRAD_FROZEN = flag
        opt_state = tx.init(params)
        p2, _, loss = jax.jit(
            lambda p, o, b: pc.pretrain_step(p, o, b, model, tx, mask)
        )(params, opt_state, batch)
        results[flag] = (jax.tree.map(np.asarray, p2), float(loss))
    pc.STOP_GRAD_FROZEN = True
    assert results[True][1] == results[False][1]
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][0]),
        jax.tree_util.tree_leaves(results[False][0]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7, rtol=1e-6)
