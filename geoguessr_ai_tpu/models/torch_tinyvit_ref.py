"""Offline torch reimplementation of timm's tiny_vit semantics.

Used as the torch-side oracle where timm itself is unavailable (this
image has no timm and no network egress): the weight converter tests
and tools/import_checkpoint.py's parity report both load state dicts
into this model with ``strict=True`` and compare forwards against the
Flax TinyViT.  Written to timm's semantics (Conv2d_BN blocks, LeViT
attention with dict-insertion bias indexing, NormMlpClassifierHead
pooling); reference consumption path: /root/reference/models/
tinyvit.py:28-53.
"""

import itertools

import numpy as np
import torch
import torch.nn as tnn

from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig


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
