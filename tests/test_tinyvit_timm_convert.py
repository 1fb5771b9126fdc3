"""tinyvit_from_timm converter coverage (round-2 VERDICT #6).

The flagship weight path: a synthetic timm-format state dict (keys per
timm's tiny_vit naming, reference models/tinyvit.py:28-53) is loaded into

  1. a hand-built torch TinyViT written here to timm's semantics
     (Conv2d_BN blocks, LeViT attention with dict-insertion bias indexing,
     NormMlpClassifierHead pooling) with ``load_state_dict(strict=True)``
     — so the synthetic dict provably has timm's exact key set, and
  2. our Flax TinyViT via ``tinyvit_from_timm``,

then the two full forwards are compared numerically.  A wrong key map or
transposition in the converter fails either the structural or the
numerical check — previously this 160-line mapping had zero coverage.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
from geoguessr_ai_tpu.models.torch_convert import tinyvit_from_timm
from geoguessr_ai_tpu.models.torch_tinyvit_ref import (  # noqa: F401
    TorchTinyViT,
    _timm_bias_index,
    synthetic_timm_state_dict,
)

CFG = TinyViTConfig.test_tiny(dtype=jnp.float32, exact_gelu=True)


# ---------------------------------------------------------------------------
# synthetic timm-format state dict
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class _RecordingDict(dict):
    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def test_structural_roundtrip():
    """Converted tree matches model.init exactly (paths + shapes) and
    every state-dict key is consumed."""
    sd = _RecordingDict(synthetic_timm_state_dict(CFG))
    converted = tinyvit_from_timm(sd, CFG)

    model = TinyViT(CFG)
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CFG.image_size, CFG.image_size, 3)),
    )

    for col in ("params", "batch_stats"):
        got = {
            tuple(str(getattr(p, "key", p)) for p in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                converted[col]
            )
        }
        want = {
            tuple(str(getattr(p, "key", p)) for p in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(ref[col])
        }
        assert got == want, (
            f"{col}: missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]}"
        )

    unused = set(sd.keys()) - sd.accessed
    assert not unused, f"converter ignored {sorted(unused)[:10]}"


def test_numerical_parity_full_forward():
    """Same synthetic weights through torch (timm semantics) and Flax
    (via the converter) produce the same embedding."""
    sd = synthetic_timm_state_dict(CFG)

    tm = TorchTinyViT(CFG)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    tm.eval()

    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, (2, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    converted = tinyvit_from_timm(sd, CFG)
    model = TinyViT(CFG)
    out = model.apply(
        {
            "params": converted["params"],
            "batch_stats": converted["batch_stats"],
        },
        jnp.asarray(x),
        train=False,
    )
    out = np.asarray(out)
    assert out.shape == ref.shape == (2, CFG.embed_dim)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_numerical_parity_5m_224_geometry():
    """Converter parity at the reference finetune pipeline's default
    backbone geometry, timm tiny_vit_5m_224
    (/root/reference/finetune_tinyvit/train_tinyvit_timm.py:122) —
    full-size weights, one forward, strict export round-trip."""
    from geoguessr_ai_tpu.models.torch_convert import tinyvit_to_timm

    cfg = TinyViTConfig.tiny_vit_5m_224(dtype=jnp.float32, exact_gelu=True)
    sd = synthetic_timm_state_dict(cfg, seed=3)

    tm = TorchTinyViT(cfg)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    tm.eval()

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    converted = tinyvit_from_timm(sd, cfg)
    out = np.asarray(
        TinyViT(cfg).apply(
            {
                "params": converted["params"],
                "batch_stats": converted["batch_stats"],
            },
            jnp.asarray(x),
            train=False,
        )
    )
    assert out.shape == ref.shape == (1, 320)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)

    exported = tinyvit_to_timm(converted, cfg)
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(exported[k], sd[k])


def test_bias_index_matches_timm_scheme():
    """Our sorted-unique bias indexing must equal timm's dict-insertion
    indexing for every window size used by the 21m/512 config."""
    from geoguessr_ai_tpu.models.tinyvit import _relative_bias_index

    for w in (2, 4, 7, 14, 16, 32):
        np.testing.assert_array_equal(
            _relative_bias_index(w), _timm_bias_index(w)
        )


def test_export_roundtrip_and_torch_load():
    """tinyvit_to_timm inverts tinyvit_from_timm exactly, and its output
    loads strict=True into the torch TinyViT with matching numerics."""
    from geoguessr_ai_tpu.models.torch_convert import tinyvit_to_timm

    sd = synthetic_timm_state_dict(CFG, seed=7)
    converted = tinyvit_from_timm(sd, CFG)
    exported = tinyvit_to_timm(converted, CFG)
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_allclose(exported[k], sd[k], atol=1e-7, err_msg=k)

    tm = TorchTinyViT(CFG)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=True
    )
    assert not missing and not unexpected
