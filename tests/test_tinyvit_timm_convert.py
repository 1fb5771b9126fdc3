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

CFG = TinyViTConfig.test_tiny(dtype=jnp.float32, exact_gelu=True)


# ---------------------------------------------------------------------------
# synthetic timm-format state dict
# ---------------------------------------------------------------------------


def _feature_sizes(cfg):
    """Spatial size entering each stage (patch embed /4, each merge /2)."""
    s = cfg.image_size // 4
    sizes = []
    for i in range(len(cfg.depths)):
        sizes.append(s)
        s //= 2
    return sizes


def _timm_bias_index(window: int) -> np.ndarray:
    """timm/LeViT attention_bias_idxs: dict-insertion-order offset ids."""
    points = list(itertools.product(range(window), range(window)))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int64).reshape(len(points), len(points))


def synthetic_timm_state_dict(cfg: TinyViTConfig, seed: int = 0):
    """Random weights under timm tiny_vit key names/shapes for `cfg`."""
    rng = np.random.default_rng(seed)
    sd = {}

    def convbn(prefix, cin, cout, k, groups=1):
        sd[f"{prefix}.conv.weight"] = rng.normal(
            0, 0.08, (cout, cin // groups, k, k)
        ).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = rng.uniform(0.7, 1.3, cout).astype(
            np.float32
        )
        sd[f"{prefix}.bn.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)
        sd[f"{prefix}.bn.running_mean"] = rng.normal(0, 0.05, cout).astype(
            np.float32
        )
        sd[f"{prefix}.bn.running_var"] = rng.uniform(0.6, 1.4, cout).astype(
            np.float32
        )

    def linear(prefix, fin, fout):
        sd[f"{prefix}.weight"] = rng.normal(0, 0.08, (fout, fin)).astype(
            np.float32
        )
        sd[f"{prefix}.bias"] = rng.normal(0, 0.05, fout).astype(np.float32)

    def lnorm(prefix, dim):
        sd[f"{prefix}.weight"] = rng.uniform(0.7, 1.3, dim).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.05, dim).astype(np.float32)

    e = cfg.embed_dims
    convbn("patch_embed.conv1", cfg.in_channels, e[0] // 2, 3)
    convbn("patch_embed.conv2", e[0] // 2, e[0], 3)

    for s in range(len(cfg.depths)):
        if s > 0:
            # downsample at the START of stages 1..3 (timm layout)
            convbn(f"stages.{s}.downsample.conv1", e[s - 1], e[s], 1)
            convbn(f"stages.{s}.downsample.conv2", e[s], e[s], 3, groups=e[s])
            convbn(f"stages.{s}.downsample.conv3", e[s], e[s], 1)
        for b in range(cfg.depths[s]):
            pre = f"stages.{s}.blocks.{b}"
            if s == 0:
                h = int(e[0] * cfg.mbconv_expand_ratio)
                convbn(f"{pre}.conv1", e[0], h, 1)
                convbn(f"{pre}.conv2", h, h, 3, groups=h)
                convbn(f"{pre}.conv3", h, e[0], 1)
            else:
                dim, heads, w = e[s], cfg.num_heads[s], cfg.window_sizes[s]
                num_offsets = int(_timm_bias_index(w).max()) + 1
                lnorm(f"{pre}.attn.norm", dim)
                linear(f"{pre}.attn.qkv", dim, 3 * dim)
                linear(f"{pre}.attn.proj", dim, dim)
                sd[f"{pre}.attn.attention_biases"] = rng.normal(
                    0, 0.3, (heads, num_offsets)
                ).astype(np.float32)
                convbn(f"{pre}.local_conv", dim, dim, 3, groups=dim)
                lnorm(f"{pre}.mlp.norm", dim)
                linear(f"{pre}.mlp.fc1", dim, int(dim * cfg.mlp_ratio))
                linear(f"{pre}.mlp.fc2", int(dim * cfg.mlp_ratio), dim)
    lnorm("head.norm", e[-1])
    return sd


# ---------------------------------------------------------------------------
# hand-built torch TinyViT (timm semantics)
# ---------------------------------------------------------------------------


class Conv2dBN(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=0, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(
            cin, cout, k, s, p, groups=groups, bias=False
        )
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TorchMBConv(tnn.Module):
    def __init__(self, dim, expand):
        super().__init__()
        h = int(dim * expand)
        self.conv1 = Conv2dBN(dim, h, 1)
        self.conv2 = Conv2dBN(h, h, 3, 1, 1, groups=h)
        self.conv3 = Conv2dBN(h, dim, 1)
        self.act = tnn.GELU()

    def forward(self, x):
        shortcut = x
        x = self.act(self.conv1(x))
        x = self.act(self.conv2(x))
        x = self.conv3(x)
        return self.act(x + shortcut)


class TorchPatchMerging(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = Conv2dBN(cin, cout, 1)
        self.conv2 = Conv2dBN(cout, cout, 3, 2, 1, groups=cout)
        self.conv3 = Conv2dBN(cout, cout, 1)
        self.act = tnn.GELU()

    def forward(self, x):
        return self.conv3(self.act(self.conv2(self.act(self.conv1(x)))))


class TorchAttention(tnn.Module):
    """LeViT-style: norm -> fused qkv -> per-head relative bias -> proj."""

    def __init__(self, dim, num_heads, window):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.norm = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        idx = _timm_bias_index(window)
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, int(idx.max()) + 1)
        )
        self.register_buffer(
            "attention_bias_idxs", torch.from_numpy(idx), persistent=False
        )

    def forward(self, x):  # (B, N, C)
        B, N, C = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(B, N, self.num_heads, 3 * self.head_dim)
        q, k, v = qkv.split(
            [self.head_dim, self.head_dim, self.head_dim], dim=3
        )
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TorchMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)
        self.act = tnn.GELU()

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.norm(x))))


class TorchBlock(tnn.Module):
    def __init__(self, dim, num_heads, window, mlp_ratio):
        super().__init__()
        self.window = window
        self.attn = TorchAttention(dim, num_heads, window)
        self.local_conv = Conv2dBN(dim, dim, 3, 1, 1, groups=dim)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):  # (B, C, H, W)
        B, C, H, W = x.shape
        w = min(self.window, H, W)
        res = x
        t = x.permute(0, 2, 3, 1)  # (B, H, W, C)
        pad_h, pad_w = (-H) % w, (-W) % w
        t = torch.nn.functional.pad(t, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        t = t.view(B, Hp // w, w, Wp // w, w, C).permute(0, 1, 3, 2, 4, 5)
        t = t.reshape(-1, w * w, C)
        t = self.attn(t)
        t = t.view(B, Hp // w, Wp // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        t = t.reshape(B, Hp, Wp, C)[:, :H, :W, :]
        x = res + t.permute(0, 3, 1, 2)
        x = self.local_conv(x)
        t = x.flatten(2).transpose(1, 2)  # (B, L, C)
        t = t + self.mlp(t)
        return t.transpose(1, 2).view(B, C, H, W)


class TorchStage(tnn.Module):
    def __init__(self, blocks, downsample=None):
        super().__init__()
        if downsample is not None:
            self.downsample = downsample
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        if hasattr(self, "downsample"):
            x = self.downsample(x)
        for b in self.blocks:
            x = b(x)
        return x


class TorchHead(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):  # (B, C, H, W)
        return self.norm(x.flatten(2).mean(dim=2))


class TorchTinyViT(tnn.Module):
    def __init__(self, cfg: TinyViTConfig):
        super().__init__()
        e = cfg.embed_dims
        pe = tnn.Module()
        pe.conv1 = Conv2dBN(cfg.in_channels, e[0] // 2, 3, 2, 1)
        pe.conv2 = Conv2dBN(e[0] // 2, e[0], 3, 2, 1)
        self.patch_embed = pe
        stages = []
        for s in range(len(cfg.depths)):
            if s == 0:
                blocks = [
                    TorchMBConv(e[0], cfg.mbconv_expand_ratio)
                    for _ in range(cfg.depths[0])
                ]
                stages.append(TorchStage(blocks))
            else:
                blocks = [
                    TorchBlock(
                        e[s], cfg.num_heads[s], cfg.window_sizes[s],
                        cfg.mlp_ratio,
                    )
                    for _ in range(cfg.depths[s])
                ]
                stages.append(
                    TorchStage(blocks, TorchPatchMerging(e[s - 1], e[s]))
                )
        self.stages = tnn.ModuleList(stages)
        self.head = TorchHead(e[-1])
        self.act = tnn.GELU()

    def forward(self, x):
        x = self.patch_embed.conv2(self.act(self.patch_embed.conv1(x)))
        for st in self.stages:
            x = st(x)
        return self.head(x)


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
