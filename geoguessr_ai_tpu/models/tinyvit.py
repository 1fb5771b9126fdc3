"""TinyViT in Flax, NHWC, TPU-first.

Re-implementation of the TinyViT family (Wu et al., ECCV 2022) as consumed by
the reference through timm's ``tiny_vit_21m_512.dist_in22k_ft_in1k``
(/root/reference/models/tinyvit.py:28-53, pretrain/tinyvit_embedder.py).
This is a from-scratch Flax design, not a port: NHWC layout end-to-end (TPU
conv layout), static window partitioning that XLA lowers to pure reshapes,
bf16 compute with f32 params/BN-stats, and stochastic depth as a
batch-broadcast dropout.

Architecture (21M @ 512):
  patch_embed: two stride-2 3x3 conv+BN (GELU between)       -> 128x128x96
  stage 0:     2 x MBConv(expand 4)                          -> 128x128x96
  merge:       1x1 conv, dw 3x3 s2, 1x1 conv (+BN, GELU)     ->  64x64x192
  stage 1:     2 x [window-attn(16) + dw local conv + MLP]   ->  64x64x192
  merge                                                      ->  32x32x384
  stage 2:     6 x [window-attn(32) + dw local conv + MLP]   ->  32x32x384
  merge                                                      ->  16x16x576
  stage 3:     2 x [window-attn(16) + dw local conv + MLP]   ->  16x16x576
  head:        token mean-pool -> LayerNorm -> (B, 576)

Attention is LeViT-style: LayerNorm -> fused qkv -> per-head learned relative
attention biases -> proj; q/k/v head dim = dim/num_heads (attn_ratio 1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _gelu(x, exact: bool):
    return nn.gelu(x, approximate=not exact)


@dataclasses.dataclass(frozen=True)
class TinyViTConfig:
    image_size: int = 512
    in_channels: int = 3
    embed_dims: Tuple[int, ...] = (96, 192, 384, 576)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 18)
    window_sizes: Tuple[int, ...] = (16, 16, 32, 16)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    #: tanh-approximated GELU is ~2.2x faster than exact erf GELU on the TPU
    #: VPU and differs by <1e-3; set True only for strict timm-weight parity.
    exact_gelu: bool = False
    #: Rematerialize blocks in the backward pass (activation
    #: checkpointing): trades ~30% more FLOPs for O(depth) less activation
    #: memory, enabling larger train batches.
    remat: bool = False
    #: Selective remat: which stages checkpoint when remat=True (None =
    #: all).  The early stages carry the big activations (stage 0/1 run
    #: at 128^2/64^2 resolution), so ``(0, 1)`` buys most of the memory
    #: back for a fraction of the recompute.
    remat_stages: Any = None
    #: jax.checkpoint policy: "full" recomputes everything;
    #: "dots" = dots_with_no_batch_dims_saveable (matmul outputs are
    #: saved, elementwise chains recompute — cheaper backward at some
    #: memory cost).
    remat_policy: str = "full"
    #: Legacy alias: True selects quant_mode="dynamic" (kept for
    #: checkpoint/config back-compat; prefer quant_mode).
    quantize_gemms: bool = False
    #: int8 GEMM path (ops/quant.py) for the pointwise convs, qkv/proj
    #: and MLP matmuls — inference-only; accuracy gated in
    #: tests/test_quant.py.
    #:   "none"      bf16 GEMMs (default).
    #:   "dynamic"   per-row activation abs-max in-graph.  MEASURED
    #:               (v5e): NOT adopted — at B=320 it OOMs at compile
    #:               (the abs-max reduce around the qkv projection breaks
    #:               the score-dot fusion, materializing the f32
    #:               (320,12,1024,1024) score tensor XLA otherwise
    #:               windows away).
    #:   "static"    scales calibrated OFFLINE (a "calibrate" forward
    #:               accumulates per-site activation abs-max into the
    #:               'act_stats' collection; pass that tree back as
    #:               'act_scales').  Quantize is then elementwise — no
    #:               data-dependent reduce — so the program keeps the
    #:               bf16 fusion structure with int8 dots.
    #:   "calibrate" exact bf16 forward that records per-site abs-max
    #:               (run with mutable=['act_stats']).
    quant_mode: str = "none"
    #: Which GEMM sites the int8 path applies to ("conv" = pointwise
    #: convs, "qkv"/"proj" = attention projections, "fc1"/"fc2" = MLP).
    #: Used to bisect the terminal-side compile failures full-int8
    #: programs hit in this environment, and to exclude sites where int8
    #: measures slower.
    quant_sites: Tuple[str, ...] = ("conv", "qkv", "proj", "fc1", "fc2")
    #: Which stages quantize (0 = MBConv stage; patch-embed/downsample
    #: convs follow the stage they feed).
    quant_stages: Tuple[int, ...] = (0, 1, 2, 3)
    #: Per-stage fused Pallas window attention (ops/window_attention.py,
    #: qkv-fused kernel — QKV_KERNEL_MIN_N).  MEASURED e2e @ B=320 bf16
    #: (round 2): stages (1,) 734, (1, 3) 742 img/s vs 705 for round 1's
    #: head-major stage-1 config — the fused (W, N, 3D) boundary removes
    #: the projection-layout einsums that made the round-1 head-major
    #: kernels lose at stages 2/3.  Stage 2 STILL loses in every design
    #: tried (three kernels measured 579-689 vs 693; the hd=32 score
    #: contraction runs at 1/4 MXU depth either way and XLA schedules the
    #: softmax/probs traffic well at N=1024) — XLA remains its default.
    #: () disables Pallas entirely.
    pallas_attention_stages: Tuple[int, ...] = (3,)
    #: Fully-fused block-attention kernel (LN + qkv GEMM + attention +
    #: out-proj in ONE pallas_call; ops/window_attention.py
    #: fused_block_attention) for the small-N stages — removes the qkv
    #: tensor's HBM round-trip and the pallas-boundary layout copies the
    #: round-3 per-fusion profile found (~12 ms at stage 1).  Takes
    #: precedence over pallas_attention_stages for listed stages.
    #: MEASURED e2e (v5e, B=320 bf16): stage-1 fused-block + stage-3 qkv
    #: kernel = **801.5 img/s** vs 742.8 for round-2's qkv-kernel (1, 3)
    #: default (+7.9%) — tools/exp_fused_block.py.  Stage-3 fused-block
    #: needs the WB auto-sizing (score stack VMEM) and is being measured.
    fused_block_stages: Tuple[int, ...] = (1,)
    #: Stage-2 no-proj fused block (LN + qkv GEMM + attention in ONE
    #: pallas_call, out-proj stays XLA; ops/window_attention.py
    #: fused_block_attention_noproj) — round-4 VERDICT #3 attempt #5:
    #: grid (head_chunk, window) keeps the (hb, N, N) bias chunk and qkv
    #: weight chunk VMEM-resident across windows, removing the
    #: (W, N, 3D) qkv HBM round trip without the 25 MB full-bias
    #: residency the four failed designs needed.  Takes precedence over
    #: pallas/fused_block stage lists for listed stages.
    #: MEASURED e2e (v5e, B=512, fused 1+3 + static-int8 MLP baseline
    #: 205.5 panos/s re-measure): head-sequential bq=256 = 208.7,
    #: bq=512 = **213.2 panos/s** (tools/exp_r4_s2noproj.py, min cosine
    #: 0.999997); head-batched crashed scoped VMEM (18.77 MB > 16 MB).
    #: Default ON — the VJP routes through the measured-best hybrid
    #: training path (XLA fwd recompute + Pallas q-tiled backward).
    fused_block_noproj_stages: Tuple[int, ...] = (2,)
    #: Fused stage-0 MBConv Pallas kernel (ops/mbconv.py): expand GEMM +
    #: dw 3x3 + project GEMM + residual + GELUs in ONE pallas_call with
    #: the 4x-expanded activation VMEM-resident — removes ~25 GB/step of
    #: HBM round trips at B=512 (the round-4b profile charged stage 0
    #: ~127 ms of the 592 ms embed step).  Inference-only: BN folds into
    #: per-channel scale/bias from running stats; training keeps the XLA
    #: path (batch stats).  Engages only when the conv sites are not
    #: int8-quantized and quant_mode != "calibrate" (calibration must
    #: record conv-site activation stats).
    fused_mbconv: bool = False
    #: Route fused-block stages whose maps are multi-window (stage 1 at
    #: 64x64/w16) through the 4D kernel (ops/window_attention.py
    #: fused_block_attention_4d): the window partition moves from
    #: materialized transposes (~19 ms of copy fusions at B=512,
    #: round-4b profile) into the BlockSpec index map.
    fused_block_4d: bool = False
    #: Stages whose attention blocks run under ``lax.scan`` over the
    #: block axis (params/batch_stats stacked along axis 0) instead of
    #: the unrolled Python loop — a PROGRAM-SIZE lever for training,
    #: where the round-4b profile's 74 ms elementwise/convert tail is
    #: spread over a 4,884-fusion program dominated by the 6 stage-2
    #: block repetitions (VERDICT r4 #2's untried structural item).
    #: Restrictions (asserted): only non-conv stages, drop_path_rate
    #: == 0 (per-block rates would break block homogeneity), remat_stages
    #: must not list a scanned stage (use scan_remat for those),
    #: and the stage must not be int8-quantized (per-site act_scales
    #: don't stack).  Changes the param-tree layout for listed stages
    #: (stage{N}_scan/block/... stacked) — checkpoints and the torch
    #: converter only speak the unrolled layout, so this is an opt-in
    #: measurement knob, not the production default.
    #: MEASURED (v5e, round 5): scan WITHOUT remat OOMs at compile even
    #: at B=16 (scan2 by 250 MB, scan123 by 6.2 GB) — lax.scan forfeits
    #: the unrolled schedule's cross-block buffer reuse, so every
    #: scanned block's residuals live simultaneously as stacked temps.
    scan_stages: Tuple[int, ...] = ()
    #: jax.checkpoint each scanned block's body (the classic
    #: scan-of-remat pattern): bounds scan's live residuals to one
    #: block's carry at the cost of recomputing the block in the
    #: backward — the memory fix for the scan OOM above.
    scan_remat: bool = False

    @staticmethod
    def tiny_vit_21m_512(**overrides) -> "TinyViTConfig":
        return TinyViTConfig(**overrides)

    @staticmethod
    def tiny_vit_21m_224(**overrides) -> "TinyViTConfig":
        return TinyViTConfig(
            image_size=224, window_sizes=(7, 7, 14, 7), **overrides
        )

    @staticmethod
    def tiny_vit_5m_224(**overrides) -> "TinyViTConfig":
        """timm ``tiny_vit_5m_224`` geometry — the reference finetune
        pipeline's default backbone
        (/root/reference/finetune_tinyvit/train_tinyvit_timm.py:122)."""
        return TinyViTConfig(
            image_size=224,
            embed_dims=(64, 128, 160, 320),
            depths=(2, 2, 6, 2),
            num_heads=(2, 4, 5, 10),
            window_sizes=(7, 7, 14, 7),
            **overrides,
        )

    @staticmethod
    def tiny_vit_11m_224(**overrides) -> "TinyViTConfig":
        """timm ``tiny_vit_11m_224`` geometry — completes the TinyViT
        family the reference's finetune pipeline can select from
        (5m/11m/21m; /root/reference/finetune_tinyvit/
        train_tinyvit_timm.py model-name argument)."""
        return TinyViTConfig(
            image_size=224,
            embed_dims=(64, 128, 256, 448),
            depths=(2, 2, 6, 2),
            num_heads=(2, 4, 8, 14),
            window_sizes=(7, 7, 14, 7),
            **overrides,
        )

    @staticmethod
    def test_tiny(**overrides) -> "TinyViTConfig":
        """Miniature config for fast CPU tests."""
        return TinyViTConfig(
            image_size=64,
            embed_dims=(16, 32, 64, 80),
            depths=(1, 1, 2, 1),
            num_heads=(1, 2, 4, 5),
            window_sizes=(2, 2, 4, 2),
            **overrides,
        )

    @property
    def embed_dim(self) -> int:
        return self.embed_dims[-1]

    @property
    def effective_quant_mode(self) -> str:
        if self.quant_mode != "none":
            return self.quant_mode
        return "dynamic" if self.quantize_gemms else "none"


_ALL_QUANT_SITES = ("conv", "qkv", "proj", "fc1", "fc2")

#: The measured-optimal static-int8 site set for the production embed
#: path (round-5 e2e ladders, tools/exp_r5_int8.py + exp_r5_int8b.py @
#: B=512 real chip): fc1/fc2 MLP GEMMs collect XLA's 2x int8 MXU mode;
#: "dw" stores the activations feeding the bytes-bound depthwise convs
#: int8 in HBM (985.3 -> 1036.7 img/s, +5.2%); "stem" stores
#: patch-embed conv1's 3.2 GB GELU output int8 (-> 1047.5, +1.1%).
#: CLOSED NEGATIVE: "conv" (int8 through the conv emitters, 798.1 —
#: the int8 emitter loses the bf16 conv's BN/GELU epilogue fusions;
#: probes 0.63-0.93x) and "dwout" (dw output -> conv3, 1019.9 — the dw
#: epilogue already fuses into conv3's operand read, so the quantize
#: only adds VPU work).  qkv/proj sites crash the terminal compile
#: helper (round-4b ledger).
#: "localdw" (round-5 second ladder, tools/exp_r5_embed2.py) stores the
#: attention-residual tensor feeding each TinyViTBlock local_conv int8:
#: 1046.1 -> 1054.3 img/s (+0.8%, cosine 0.99998) — the same
#: bytes-halving mechanism at the site the fusion map named
#: (multiply_reduce_fusion reads it at 8.64 ms/stage-1 block).
PROD_QUANT_SITES = ("fc1", "fc2", "dw", "stem", "localdw")
#: Differentiable subset for TRAIN steps (QAT-storage): the int8
#: STORAGE boundaries ride an STE (ops.quant.fake_quant_static_ste) so
#: gradients pass through; the fc1/fc2 COMPUTE-int8 GEMMs are excluded
#: (int8_static_matmul has no VJP — inference-only).
TRAIN_QUANT_SITES = ("dw", "stem", "localdw")


def _quant_gemm(
    mdl, x, kernel, bias, dtype, quant: str, name: str,
    site: str = "conv", sites: Tuple[str, ...] = _ALL_QUANT_SITES,
):
    """'...c,cd->...d' GEMM dispatch shared by every quantizable site.

    quant is one of "none"/"dynamic"/"static"/"calibrate" (see
    TinyViTConfig.quant_mode).  "calibrate" records the activation
    abs-max under the 'act_stats' collection (running max across
    batches) and runs the exact bf16 GEMM; "static" reads the same leaf
    from 'act_scales'.  ``site`` must be in ``sites`` for the int8 modes
    to engage (calibration always records, so one calibration serves any
    site subset).
    """
    if quant in ("dynamic", "static") and site not in sites:
        quant = "none"
    if quant == "dynamic":
        from geoguessr_ai_tpu.ops.quant import int8_einsum_nc_cd

        return int8_einsum_nc_cd(x, kernel, bias=bias, out_dtype=dtype)
    if quant == "calibrate":
        stat = mdl.variable(
            "act_stats", name, lambda: jnp.zeros((), jnp.float32)
        )
        if not mdl.is_initializing():
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
    elif quant == "static":
        from geoguessr_ai_tpu.ops.quant import int8_static_einsum_nc_cd

        amax = mdl.variable(
            "act_scales", name, lambda: jnp.full((), 127.0, jnp.float32)
        )
        return int8_static_einsum_nc_cd(
            x, kernel, amax.value, bias=bias, out_dtype=dtype
        )
    y = jnp.einsum(
        "...c,cd->...d",
        x,
        kernel.astype(dtype),
        preferred_element_type=dtype,
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class _PointwiseConv(nn.Module):
    """1x1 conv lowered to an einsum matmul.

    XLA's conv path runs ~2x slower than the equivalent GEMM for 1x1
    kernels at TinyViT's shapes (measured on v5e: 12.8ms vs 6.7ms for
    (2M,96)@(96,384)), and elementwise epilogues fuse into the GEMM for
    free.  Param layout matches nn.Conv ((1,1,Cin,Cout) "kernel") so
    checkpoints stay interchangeable.
    """

    features: int
    dtype: Any = jnp.bfloat16
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        return _quant_gemm(
            self, x, kernel[0, 0], None, self.dtype, self.quant, "in_amax",
            site="conv", sites=self.quant_sites,
        )


#: Lower depthwise 3x3 convs to 9 shifted multiply-adds instead of
#: conv_general_dilated.  MEASURED (v5e, B=320 e2e): LOSES — 574 vs 740
#: img/s; XLA's depthwise conv lowering beats the strided-slice MAC form
#: (the 9 shifted slices materialize).  Kept as a parity-tested opt-in
#: knob; default stays the conv lowering.
DW_SHIFTED = False

#: 1x1 lowering for PatchMerging conv1 (which feeds a stride-2 dw conv):
#: "conv" avoids the einsum-GEMM -> dw layout copy.  See ConvBN.
PM_CONV1_LOWERING = "conv"
#: same knob for MBConv conv1 (feeds the stride-1 dw conv at stage 0).
MB_CONV1_LOWERING = "conv"
#: and for the 1x1 convs CONSUMING a dw output (MBConv conv3 /
#: PatchMerging conv3) — the dw emitter's output layout may force the
#: mirror-image copy into an einsum GEMM.
MB_CONV3_LOWERING = "einsum"
PM_CONV3_LOWERING = "einsum"

#: Round-5 int8 campaign (VERDICT r4 #1): when True, conv sites whose
#: measured-best lowering is the XLA CONV emitter (MBConv/PatchMerging
#: conv1, the kxk patch-embed convs) quantize through
#: ops.quant.int8_static_conv instead of falling back to the einsum GEMM
#: path — the fallback would undo the wave-2 layout win (the einsum
#: output layout forces a 3.2 GB copy into the dw emitter).  Applies in
#: quant_mode "static"/"calibrate" only; calibration must run with the
#: SAME value of this flag as the static forward (the recorded
#: 'act_stats' tree paths differ per branch).
CONV_INT8_EMITTER = False


def _record_or_read_amax(mdl, x, quant: str, name: str):
    """calibrate: record abs-max under 'act_stats'/name and return None;
    static: return the calibrated amax from 'act_scales'/name."""
    if quant == "calibrate":
        stat = mdl.variable(
            "act_stats", name, lambda: jnp.zeros((), jnp.float32)
        )
        if not mdl.is_initializing():
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        return None
    amax = mdl.variable(
        "act_scales", name, lambda: jnp.full((), 127.0, jnp.float32)
    )
    return amax.value


def _maybe_quant_store(
    mdl, x, quant: str, sites: Tuple[str, ...], site: str, amax_name: str
):
    """Opt-in int8 HBM *storage* across a fusion boundary — compute
    stays bf16 (ops.quant.fake_quant_static); the producer fusion's
    epilogue writes int8 (half the bytes) and the consumer's operand
    fusion dequantizes.  Sites (each a bytes-bound boundary the
    round-4b/5 profiles named):

    * "dw"    — the activation feeding each depthwise conv (LANDED
                round 5: embed 985.3 -> 1036.7 img/s).
    * "dwout" — the depthwise conv's GELU output feeding the conv3 1x1
                (the dw write + conv3 read, the twin boundary of "dw").
    * "stem"  — patch-embed conv1's GELU output feeding conv2 (3.2 GB
                @ B=512, the largest single activation in the model).
    * "localdw" — the attention-residual tensor feeding each
                TinyViTBlock local_conv (stages 1-3; the round-5
                fusion map shows the stage-1 local_conv+LN-stat fusion
                reading this tensor unquantized at 8.64 ms/block).

    Calibration always records (one calibration serves any site
    subset, matching _quant_gemm's contract)."""
    if quant == "calibrate":
        _record_or_read_amax(mdl, x, quant, amax_name)
        return x
    if quant == "static" and site in sites:
        from geoguessr_ai_tpu.ops.quant import fake_quant_static_ste

        # STE variant: primal identical to fake_quant_static (embed
        # programs unchanged); differentiable so train steps can use
        # the storage sites too (round-5 train QAT-storage lever).
        return fake_quant_static_ste(
            x, _record_or_read_amax(mdl, x, quant, amax_name)
        )
    return x


def _maybe_quant_dw_input(mdl, x, quant: str, sites: Tuple[str, ...]):
    """Site "dw" storage (see _maybe_quant_store)."""
    return _maybe_quant_store(mdl, x, quant, sites, "dw", "dw_in_amax")


class _DWConvParams(nn.Module):
    """Param holder with nn.Conv's depthwise tree layout ({conv:{kernel
    (k, k, 1, C)}}) so both depthwise lowerings share checkpoints."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, 1, self.features),
            jnp.float32,
        )


def _dw_conv3x3_shifted(x, w, stride: int, dtype):
    """Depthwise 3x3 'same' conv as 9 shifted slices x broadcast MACs.

    x: (B, H, W, C); w: (3, 3, 1, C).  Matches nn.Conv(strides, pad=1,
    feature_group_count=C) for even H/W."""
    B, H, W, C = x.shape
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, Ho, Wo, C), dtype)
    w = w.astype(dtype)
    for di in range(3):
        for dj in range(3):
            sl = xp[
                :,
                di : di + (Ho - 1) * stride + 1 : stride,
                dj : dj + (Wo - 1) * stride + 1 : stride,
                :,
            ]
            out = out + sl.astype(dtype) * w[di, dj, 0]
    return out


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, NHWC.  BN stats live in 'batch_stats'.

    ``pointwise_lowering``: "einsum" lowers 1x1 convs to a GEMM (2x
    faster than XLA's conv path STANDALONE — the round-1 verdict), but
    when the consumer is a depthwise conv the GEMM's output layout
    ({2,3,1,0}) forces a full layout copy into the dw emitter's
    {0,3,2,1} (the 10 ms copy.241 in the round-4b profile).  "conv"
    keeps XLA's conv emitter, whose output feeds the dw directly —
    measured 2x faster for the 1x1->dw pair (22.45 vs 44.80 ms at the
    downsample0 shape, tools ledger round 4b).  Both share the nn.Conv
    parameter tree."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.bfloat16
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES
    pointwise_lowering: str = "einsum"

    @nn.compact
    def __call__(self, x, train: bool):
        conv_quant_active = self.quant != "none" and (
            self.quant == "calibrate" or "conv" in self.quant_sites
        )
        # int8 on the conv EMITTER itself (round 5): engages for sites
        # whose measured-best lowering is a conv op — kxk dense convs
        # and "conv"-lowered 1x1s — so conv-site quantization no longer
        # forces the einsum fallback (and its dw-feeding layout copy).
        use_int8_emitter = (
            CONV_INT8_EMITTER
            and conv_quant_active
            and self.quant in ("static", "calibrate")
            and self.groups == 1
            and (self.kernel > 1 or self.pointwise_lowering == "conv")
        )
        if use_int8_emitter:
            cin = x.shape[-1]
            w = _ConvKernelParam(
                (self.kernel, self.kernel, cin, self.features), name="conv"
            )()
            amax = _record_or_read_amax(self, x, self.quant, "in_amax")
            pad = self.kernel // 2
            if amax is None:  # calibrate: exact conv, stats recorded
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    w.astype(self.dtype),
                    window_strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype,
                )
            else:
                from geoguessr_ai_tpu.ops.quant import int8_static_conv

                x = int8_static_conv(
                    x,
                    w,
                    amax,
                    stride=self.stride,
                    padding=pad,
                    out_dtype=self.dtype,
                )
        elif (
            self.kernel == 1
            and self.stride == 1
            and self.groups == 1
            and self.pointwise_lowering == "conv"
            and not conv_quant_active
        ):
            x = nn.Conv(
                self.features,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        elif self.kernel == 1 and self.stride == 1 and self.groups == 1:
            x = _PointwiseConv(
                self.features,
                dtype=self.dtype,
                quant=self.quant, quant_sites=self.quant_sites,
                name="conv",
            )(x)
        elif (
            DW_SHIFTED
            and self.kernel == 3
            and self.groups == self.features
            and x.shape[-1] == self.features
        ):
            w = _DWConvParams(3, self.features, name="conv")()
            x = _dw_conv3x3_shifted(x, w, self.stride, self.dtype)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=self.kernel // 2,
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return x


class _ConvKernelParam(nn.Module):
    """Param holder with nn.Conv's tree layout ({kernel})."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape,
            jnp.float32,
        )


class _BNParams(nn.Module):
    """Param holder with nn.BatchNorm's tree layout (scale/bias params +
    mean/var batch_stats) so the fused-MBConv path shares checkpoints
    with the stock ConvBN."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.dim,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.dim,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


class _ConvBNParams(nn.Module):
    """ConvBN's parameter tree (conv/kernel + bn stats) without running
    the ops — feeds the fused-MBConv kernel's folded-BN form."""

    features: int
    kernel_size: int = 1
    depthwise: bool = False

    @nn.compact
    def __call__(self, cin: int):
        shape = (
            self.kernel_size,
            self.kernel_size,
            1 if self.depthwise else cin,
            self.features,
        )
        w = _ConvKernelParam(shape, name="conv")()
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        return w, scale, bias, mean, var


class DropPath(nn.Module):
    """Stochastic depth: zero a whole sample's residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MBConv(nn.Module):
    """MobileNet-style inverted bottleneck with BN and GELU (conv stage)."""

    features: int
    expand_ratio: float
    drop_path: float
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        hidden = int(x.shape[-1] * self.expand_ratio)
        conv_quant_active = self.quant == "calibrate" or (
            self.quant in ("dynamic", "static")
            and "conv" in self.quant_sites
        )
        if self.fused and not train and not conv_quant_active:
            from geoguessr_ai_tpu.ops.mbconv import fold_bn, fused_mbconv

            cin = x.shape[-1]
            w1, g1, be1, m1, v1 = _ConvBNParams(hidden, name="conv1")(cin)
            w2, g2, be2, m2, v2 = _ConvBNParams(
                hidden, kernel_size=3, depthwise=True, name="conv2"
            )(hidden)
            w3, g3, be3, m3, v3 = _ConvBNParams(
                self.features, name="conv3"
            )(hidden)
            s1, b1 = fold_bn(g1, be1, m1, v1)
            s2, b2 = fold_bn(g2, be2, m2, v2)
            s3, b3 = fold_bn(g3, be3, m3, v3)
            return fused_mbconv(
                x.astype(self.dtype),
                w1[0, 0], s1, b1,
                w2[:, :, 0, :], s2, b2,
                w3[0, 0], s3, b3,
                exact_gelu=self.exact_gelu,
            )
        shortcut = x
        x = ConvBN(
            hidden, 1, dtype=self.dtype, quant=self.quant, quant_sites=self.quant_sites,
            pointwise_lowering=MB_CONV1_LOWERING, name="conv1"
        )(x, train)
        x = _gelu(x, self.exact_gelu)
        x = _maybe_quant_dw_input(self, x, self.quant, self.quant_sites)
        x = ConvBN(
            hidden, 3, groups=hidden, dtype=self.dtype, name="conv2"
        )(x, train)
        x = _gelu(x, self.exact_gelu)
        x = _maybe_quant_store(
            self, x, self.quant, self.quant_sites, "dwout", "dwout_amax"
        )
        x = ConvBN(
            self.features,
            1,
            dtype=self.dtype,
            quant=self.quant, quant_sites=self.quant_sites,
            pointwise_lowering=MB_CONV3_LOWERING,
            name="conv3",
        )(x, train)
        x = DropPath(self.drop_path)(x, deterministic=not train)
        x = shortcut + x
        return _gelu(x, self.exact_gelu)


class PatchEmbed(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x, train: bool):
        # The stem convs only quantize through the int8 conv emitter
        # (CONV_INT8_EMITTER); they never had an einsum form.  conv1
        # consumes normalized pixels (K = 27 — too shallow for the MXU
        # int8 mode to matter, but int8 halves the 805 MB@B=512 input
        # read); conv2 is the 48->96 GEMM-conv at 256^2.
        x = ConvBN(
            self.features // 2, 3, stride=2, dtype=self.dtype,
            quant=self.quant, quant_sites=self.quant_sites,
            name="conv1",
        )(x, train)
        x = _gelu(x, self.exact_gelu)
        x = _maybe_quant_store(
            self, x, self.quant, self.quant_sites, "stem", "stem_amax"
        )
        x = ConvBN(
            self.features, 3, stride=2, dtype=self.dtype,
            quant=self.quant, quant_sites=self.quant_sites,
            name="conv2",
        )(x, train)
        return x


class PatchMerging(nn.Module):
    """Downsample 2x and change channels: 1x1 -> dw 3x3 s2 -> 1x1 (+BN/GELU)."""

    features: int
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x, train: bool):
        # conv1 feeds the stride-2 depthwise conv: the conv lowering
        # avoids the GEMM->dw layout copy (see ConvBN docstring).
        x = ConvBN(
            self.features, 1, dtype=self.dtype, quant=self.quant, quant_sites=self.quant_sites,
            pointwise_lowering=PM_CONV1_LOWERING,
            name="conv1",
        )(x, train)
        x = _gelu(x, self.exact_gelu)
        x = _maybe_quant_dw_input(self, x, self.quant, self.quant_sites)
        x = ConvBN(
            self.features,
            3,
            stride=2,
            groups=self.features,
            dtype=self.dtype,
            name="conv2",
        )(x, train)
        x = _gelu(x, self.exact_gelu)
        x = _maybe_quant_store(
            self, x, self.quant, self.quant_sites, "dwout", "dwout_amax"
        )
        x = ConvBN(
            self.features, 1, dtype=self.dtype, quant=self.quant, quant_sites=self.quant_sites,
            pointwise_lowering=PM_CONV3_LOWERING,
            name="conv3",
        )(x, train)
        return x


def _relative_bias_index(window: int) -> np.ndarray:
    """(N, N) index into the unique-offset bias table for an NxN window."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    rel = coords[:, None, :] - coords[None, :, :]  # (N, N, 2)
    rel = np.abs(rel)
    offsets = rel[..., 0] * window + rel[..., 1]
    # re-index to dense unique ids (matches LeViT's dict-of-offsets scheme)
    uniq, inv = np.unique(offsets, return_inverse=True)
    return inv.reshape(offsets.shape).astype(np.int32)


class _LNParams(nn.Module):
    """Parameter holder with nn.LayerNorm's tree layout (scale + bias)
    so the fused-block kernel path shares checkpoints with the stock
    LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree layout (kernel (in, out) +
    bias), so attention paths that consume reshaped weight views share
    checkpoints with a plain Dense."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class WindowAttention(nn.Module):
    """LeViT-style attention with learned relative biases over one window.

    Input: (B, N, C) window tokens.  Includes its own pre-LayerNorm.
    """

    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    fused_block: bool = False
    fused_block_noproj: bool = False
    #: x is the raw (B, H, W, C) map; the window partition happens in
    #: the 4D kernel's BlockSpec (fused-block path only).
    four_d: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x):
        if self.four_d:
            from geoguessr_ai_tpu.ops.window_attention import (
                fused_block_attention_4d,
            )

            C = x.shape[-1]
            ln_scale, ln_bias = _LNParams(C, name="norm")()
            qkv_kernel, qkv_bias = _DenseParams(3 * self.dim, name="qkv")(C)
            proj_kernel, proj_bias = _DenseParams(self.dim, name="proj")(
                self.dim
            )
            bias_idx = _relative_bias_index(self.window)
            biases = self.param(
                "attention_biases",
                nn.initializers.zeros,
                (self.num_heads, int(bias_idx.max()) + 1),
                jnp.float32,
            )
            return fused_block_attention_4d(
                x.astype(self.dtype),
                ln_scale,
                ln_bias,
                qkv_kernel,
                qkv_bias,
                proj_kernel,
                proj_bias,
                biases[:, bias_idx],
                (self.dim // self.num_heads) ** -0.5,
                self.num_heads,
                self.window,
            )

        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        if self.fused_block_noproj and N % 128 == 0:
            from geoguessr_ai_tpu.ops.window_attention import (
                fused_block_attention_noproj,
            )

            ln_scale, ln_bias = _LNParams(C, name="norm")()
            qkv_kernel, qkv_bias = _DenseParams(3 * self.dim, name="qkv")(C)
            proj_kernel, proj_bias = _DenseParams(self.dim, name="proj")(
                self.dim
            )
            bias_idx = _relative_bias_index(self.window)
            biases = self.param(
                "attention_biases",
                nn.initializers.zeros,
                (self.num_heads, int(bias_idx.max()) + 1),
                jnp.float32,
            )
            out = fused_block_attention_noproj(
                x.astype(self.dtype),
                ln_scale,
                ln_bias,
                qkv_kernel,
                qkv_bias,
                biases[:, bias_idx],
                scale,
                self.num_heads,
            )
            return _quant_gemm(
                self, out, proj_kernel, proj_bias, self.dtype, self.quant,
                "proj_in_amax", site="proj", sites=self.quant_sites,
            )

        if self.fused_block and N % 128 == 0:
            from geoguessr_ai_tpu.ops.window_attention import (
                fused_block_attention,
            )

            ln_scale, ln_bias = _LNParams(C, name="norm")()
            qkv_kernel, qkv_bias = _DenseParams(3 * self.dim, name="qkv")(C)
            proj_kernel, proj_bias = _DenseParams(self.dim, name="proj")(
                self.dim
            )
            bias_idx = _relative_bias_index(self.window)
            biases = self.param(
                "attention_biases",
                nn.initializers.zeros,
                (self.num_heads, int(bias_idx.max()) + 1),
                jnp.float32,
            )
            return fused_block_attention(
                x.astype(self.dtype),
                ln_scale,
                ln_bias,
                qkv_kernel,
                qkv_bias,
                proj_kernel,
                proj_bias,
                biases[:, bias_idx],
                scale,
                self.num_heads,
            )

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)

        # Raw projection params (Dense-compatible tree: qkv/kernel (C, 3D),
        # qkv/bias, proj/kernel (D, C), proj/bias) so both attention paths
        # and converted checkpoints share one layout.
        qkv_kernel, qkv_bias = _DenseParams(
            3 * self.dim, name="qkv"
        )(C)
        proj_kernel, proj_bias = _DenseParams(self.dim, name="proj")(
            self.dim
        )

        bias_idx = _relative_bias_index(self.window)  # (N, N)
        num_offsets = int(bias_idx.max()) + 1
        biases = self.param(
            "attention_biases",
            nn.initializers.zeros,
            (self.num_heads, num_offsets),
            jnp.float32,
        )
        attn_bias = biases[:, bias_idx]  # (H, N, N)

        # Pallas fused path: keeps the (N, N) scores in VMEM (the XLA path
        # materializes them f32 in HBM).  Needs lane-aligned N.  The
        # head-major (W, H, N, hd) kernel layout is emitted/consumed
        # directly by the projection einsums — materializing transposes
        # around the pallas_call instead costs more than the kernel saves
        # (measured 525 vs 668 img/s end-to-end).
        from geoguessr_ai_tpu.ops import window_attention as _wa

        if self.use_pallas and N % 128 == 0 and N >= _wa.QKV_KERNEL_MIN_N:
            # Large windows: the qkv-fused kernel consumes the raw
            # (B, N, 3D) projection — no layout einsums at the boundary
            # (those cost more than the kernel saves; see the per-fusion
            # profile notes on pallas_attention_stages).
            from geoguessr_ai_tpu.ops.window_attention import (
                window_attention_qkv,
            )

            qkv = _quant_gemm(
                self, x, qkv_kernel, qkv_bias, self.dtype, self.quant,
                "qkv_in_amax", site="qkv", sites=self.quant_sites,
            )
            out = window_attention_qkv(
                qkv, attn_bias, scale, self.num_heads
            )
            return _quant_gemm(
                self, out, proj_kernel, proj_bias, self.dtype, self.quant,
                "proj_in_amax", site="proj", sites=self.quant_sites,
            )

        if self.use_pallas and N % 128 == 0:
            from geoguessr_ai_tpu.ops.window_attention import (
                window_attention,
            )

            # channel layout matches the XLA branch's reshape/split:
            # output channel c -> (head = c // (3*hd), slot = (c % (3*hd))
            # // hd) with slot 0/1/2 = q/k/v.
            wk = qkv_kernel.reshape(
                C, self.num_heads, 3, head_dim
            ).astype(self.dtype)
            wb = qkv_bias.reshape(
                self.num_heads, 3, 1, head_dim
            ).astype(self.dtype)
            q = (
                jnp.einsum(
                    "bnc,chd->bhnd",
                    x,
                    wk[:, :, 0],
                    preferred_element_type=self.dtype,
                )
                + wb[:, 0]
            )
            k = (
                jnp.einsum(
                    "bnc,chd->bhnd",
                    x,
                    wk[:, :, 1],
                    preferred_element_type=self.dtype,
                )
                + wb[:, 1]
            )
            v = (
                jnp.einsum(
                    "bnc,chd->bhnd",
                    x,
                    wk[:, :, 2],
                    preferred_element_type=self.dtype,
                )
                + wb[:, 2]
            )
            out = window_attention(q, k, v, attn_bias, scale)
            # back-projection consumes head-major directly
            return (
                jnp.einsum(
                    "bhnd,hdc->bnc",
                    out,
                    proj_kernel.reshape(
                        self.num_heads, head_dim, self.dim
                    ).astype(self.dtype),
                    preferred_element_type=self.dtype,
                )
                + proj_bias.astype(self.dtype)
            )

        qkv = _quant_gemm(
            self, x, qkv_kernel, qkv_bias, self.dtype, self.quant,
            "qkv_in_amax", site="qkv", sites=self.quant_sites,
        )
        # Plain f32-scores XLA attention FORWARD — the measured-best
        # stage-2 forward (bf16 score storage, probs-barrier, and four
        # Pallas forward designs all lost e2e; docs/performance.md) —
        # via window_attention_qkv_xla: the primal trace is the same
        # reshape/split/einsum/softmax graph as before, but training
        # gets the Pallas q-tiled BACKWARD instead of XLA autodiff's
        # HBM-resident (B*nW, H, N, N) probs/dscore tensors (the
        # dominant line of the round-4 train-step profile).
        from geoguessr_ai_tpu.ops.window_attention import (
            window_attention_qkv_xla,
        )

        out = window_attention_qkv_xla(
            qkv, attn_bias, scale, self.num_heads
        )
        return _quant_gemm(
            self, out, proj_kernel, proj_bias, self.dtype, self.quant,
            "proj_in_amax", site="proj", sites=self.quant_sites,
        )


#: Hand-rolled MLP LayerNorm (trace-time knob, see the knob NOTE above):
#: statistics reduce in f32 but the normalize emits straight to compute
#: dtype without an x.astype(f32) value tensor.  The round-5 fusion map
#: shows nn.LayerNorm(dtype=f32) materializing a full f32 LAYOUT copy of
#: the stage-1 MLP input (copy.211/220, 4.49 ms each @ B=512) because
#: XLA places the GEMM relayout on the f32 tensor; hand-rolling lets the
#: relayout ride the half-width bf16/s8 side.  Numerics: stats identical
#: (f32 reductions); the normalize multiply rounds once in bf16 — gated
#: by the e2e cosine check in the experiment ladder.
MLP_LN_HANDROLLED = False


class _LNParams(nn.Module):
    """scale/bias with nn.LayerNorm's param tree (so both LN lowerings
    share checkpoints)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class Mlp(nn.Module):
    """Pre-norm MLP (TinyViT keeps the LayerNorm inside the MLP block)."""

    hidden: int
    out: int
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x):
        if MLP_LN_HANDROLLED:
            scale, bias = _LNParams(x.shape[-1], name="norm")()
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - (
                jnp.square(mean)
            )
            inv = jax.lax.rsqrt(var + 1e-5)
            x = (
                (xf - mean) * (inv * scale) + bias
            ).astype(self.dtype)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32)
            ).astype(self.dtype)
        fc1_k, fc1_b = _DenseParams(self.hidden, name="fc1")(x.shape[-1])
        fc2_k, fc2_b = _DenseParams(self.out, name="fc2")(self.hidden)
        x = _quant_gemm(
            self, x, fc1_k, fc1_b, self.dtype, self.quant, "fc1_in_amax",
            site="fc1", sites=self.quant_sites,
        )
        x = _gelu(x, self.exact_gelu)
        return _quant_gemm(
            self, x, fc2_k, fc2_b, self.dtype, self.quant, "fc2_in_amax",
            site="fc2", sites=self.quant_sites,
        )


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B*nH*nW, window*window, C).  Static shapes only —
    this lowers to reshapes/transposes XLA fuses away."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_unpartition(
    x: jax.Array, window: int, hw: Tuple[int, int]
) -> jax.Array:
    H, W = hw
    B = x.shape[0] // ((H // window) * (W // window))
    x = x.reshape(B, H // window, W // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class TinyViTBlock(nn.Module):
    """window attention -> depthwise local conv -> MLP, all residual."""

    dim: int
    num_heads: int
    window: int
    mlp_ratio: float
    drop_path: float
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    use_pallas_attention: bool = False
    use_fused_block: bool = False
    use_fused_block_noproj: bool = False
    fused_block_4d: bool = False
    quant: str = "none"
    quant_sites: Tuple[str, ...] = _ALL_QUANT_SITES

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        w = min(self.window, H, W)

        res = x
        if (H, W) == (w, w):
            tokens = x.reshape(B, H * W, C)
            tokens = WindowAttention(
                self.dim,
                self.num_heads,
                w,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                fused_block=self.use_fused_block,
                fused_block_noproj=self.use_fused_block_noproj,
                quant=self.quant, quant_sites=self.quant_sites,
                name="attn",
            )(tokens)
            attn_out = tokens.reshape(B, H, W, C)
        elif (
            self.fused_block_4d
            and self.use_fused_block
            and not self.use_fused_block_noproj
            and H % w == 0
            and W % w == 0
            and (w * w) % 128 == 0
        ):
            # multi-window fused-block stage: the partition lives in the
            # 4D kernel's BlockSpec — no transpose/reshape copies.
            attn_out = WindowAttention(
                self.dim,
                self.num_heads,
                w,
                dtype=self.dtype,
                fused_block=True,
                four_d=True,
                quant=self.quant, quant_sites=self.quant_sites,
                name="attn",
            )(x)
        else:
            pad_h = (-H) % w
            pad_w = (-W) % w
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            windows = window_partition(xp, w)
            windows = WindowAttention(
                self.dim,
                self.num_heads,
                w,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                fused_block=self.use_fused_block,
                fused_block_noproj=self.use_fused_block_noproj,
                quant=self.quant, quant_sites=self.quant_sites,
                name="attn",
            )(windows)
            attn_out = window_unpartition(windows, w, (H + pad_h, W + pad_w))
            attn_out = attn_out[:, :H, :W, :]
        x = res + DropPath(self.drop_path)(attn_out, deterministic=not train)

        x = _maybe_quant_store(
            self, x, self.quant, self.quant_sites, "localdw",
            "localdw_in_amax",
        )
        x = ConvBN(
            self.dim, 3, groups=self.dim, dtype=self.dtype, name="local_conv"
        )(x, train)

        mlp_out = Mlp(
            int(self.dim * self.mlp_ratio),
            self.dim,
            dtype=self.dtype,
            exact_gelu=self.exact_gelu,
            quant=self.quant, quant_sites=self.quant_sites,
            name="mlp",
        )(x.reshape(B, H * W, C)).reshape(B, H, W, C)
        return x + DropPath(self.drop_path)(mlp_out, deterministic=not train)


class _ScanBlockBody(nn.Module):
    """One TinyViTBlock iteration under nn.scan (config.scan_stages):
    wraps the block with the (carry, ys) signature scan requires.
    drop_path is fixed 0.0 — scan requires block homogeneity (asserted
    at the call site)."""

    dim: int
    num_heads: int
    window: int
    mlp_ratio: float
    dtype: Any = jnp.bfloat16
    exact_gelu: bool = False
    use_pallas_attention: bool = False
    use_fused_block: bool = False
    use_fused_block_noproj: bool = False
    fused_block_4d: bool = False
    remat_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        block_cls = (
            nn.remat(TinyViTBlock, static_argnums=(2,))
            if self.remat_block
            else TinyViTBlock
        )
        x = block_cls(
            self.dim,
            self.num_heads,
            self.window,
            self.mlp_ratio,
            0.0,
            dtype=self.dtype,
            exact_gelu=self.exact_gelu,
            use_pallas_attention=self.use_pallas_attention,
            use_fused_block=self.use_fused_block,
            use_fused_block_noproj=self.use_fused_block_noproj,
            fused_block_4d=self.fused_block_4d,
            name="block",
        )(x, train)
        return x, ()


class TinyViT(nn.Module):
    """TinyViT feature extractor.  __call__ returns (B, embed_dim) pooled
    embeddings (the reference consumes timm's num_classes=0 pooled output)."""

    config: TinyViTConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array, train: bool = False):
        cfg = self.config
        dtype = cfg.dtype
        x = pixel_values.astype(dtype)

        # window_attention selects Pallas-vs-XLA per lowering platform
        # (lax.platform_dependent), so no device check is needed here.
        pallas_stages = cfg.pallas_attention_stages
        quant_mode = cfg.effective_quant_mode

        def stage_quant(stage: int) -> str:
            # calibration always records every site; the int8 modes honor
            # the quant_stages mask
            if quant_mode in ("static", "dynamic") and (
                stage not in cfg.quant_stages
            ):
                return "none"
            return quant_mode

        # Per-block stochastic-depth schedule (linear ramp, timm convention).
        total_blocks = sum(cfg.depths)
        dpr = np.linspace(0.0, cfg.drop_path_rate, total_blocks).tolist()

        x = PatchEmbed(
            cfg.embed_dims[0],
            dtype=dtype,
            exact_gelu=cfg.exact_gelu,
            quant=stage_quant(0),
            quant_sites=cfg.quant_sites,
            name="patch_embed",
        )(x, train)

        remat_stages = (
            set(cfg.remat_stages)
            if cfg.remat_stages is not None
            else set(range(len(cfg.depths)))
        )
        policy = None
        if cfg.remat_policy == "dots":
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )

        def classes_for(stage: int):
            if cfg.remat and stage in remat_stages:
                return (
                    nn.remat(MBConv, static_argnums=(2,), policy=policy),
                    nn.remat(
                        TinyViTBlock, static_argnums=(2,), policy=policy
                    ),
                )
            return MBConv, TinyViTBlock

        block_idx = 0
        for stage in range(len(cfg.depths)):
            mbconv_cls, block_cls = classes_for(stage)
            if stage == 0:
                for d in range(cfg.depths[0]):
                    x = mbconv_cls(
                        cfg.embed_dims[0],
                        cfg.mbconv_expand_ratio,
                        dpr[block_idx],
                        dtype=dtype,
                        exact_gelu=cfg.exact_gelu,
                        quant=stage_quant(0),
                        quant_sites=cfg.quant_sites,
                        fused=cfg.fused_mbconv,
                        name=f"stage0_block{d}",
                    )(x, train)
                    block_idx += 1
            elif stage in cfg.scan_stages and cfg.depths[stage] > 1:
                assert cfg.drop_path_rate == 0.0, (
                    "scan_stages needs homogeneous blocks "
                    "(drop_path_rate == 0)"
                )
                assert not (
                    cfg.remat
                    and (
                        cfg.remat_stages is None
                        or stage in cfg.remat_stages
                    )
                ), (
                    "a scanned stage cannot also be remat'd via "
                    "remat_stages — use scan_remat (per-block "
                    "checkpoint inside the scan body) instead"
                )
                assert stage_quant(stage) == "none", (
                    "scan_stages: per-block act_scales don't stack"
                )
                scan_cls = nn.scan(
                    _ScanBlockBody,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast,),
                    length=cfg.depths[stage],
                )
                x, _ = scan_cls(
                    cfg.embed_dims[stage],
                    cfg.num_heads[stage],
                    cfg.window_sizes[stage],
                    cfg.mlp_ratio,
                    dtype=dtype,
                    exact_gelu=cfg.exact_gelu,
                    use_pallas_attention=stage in pallas_stages,
                    use_fused_block=stage in cfg.fused_block_stages,
                    use_fused_block_noproj=(
                        stage in cfg.fused_block_noproj_stages
                    ),
                    fused_block_4d=cfg.fused_block_4d,
                    remat_block=cfg.scan_remat,
                    name=f"stage{stage}_scan",
                )(x, train)
                block_idx += cfg.depths[stage]
            else:
                for d in range(cfg.depths[stage]):
                    x = block_cls(
                        cfg.embed_dims[stage],
                        cfg.num_heads[stage],
                        cfg.window_sizes[stage],
                        cfg.mlp_ratio,
                        dpr[block_idx],
                        dtype=dtype,
                        exact_gelu=cfg.exact_gelu,
                        use_pallas_attention=stage in pallas_stages,
                        use_fused_block=stage in cfg.fused_block_stages,
                        use_fused_block_noproj=(
                            stage in cfg.fused_block_noproj_stages
                        ),
                        fused_block_4d=cfg.fused_block_4d,
                        quant=stage_quant(stage),
                        quant_sites=cfg.quant_sites,
                        name=f"stage{stage}_block{d}",
                    )(x, train)
                    block_idx += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(
                    cfg.embed_dims[stage + 1],
                    dtype=dtype,
                    exact_gelu=cfg.exact_gelu,
                    quant=stage_quant(stage + 1),
                    quant_sites=cfg.quant_sites,
                    name=f"downsample{stage}",
                )(x, train)

        # Head: token mean-pool then LayerNorm (timm NormMlpClassifierHead
        # with num_classes=0 returns normed pooled features).
        x = x.reshape(x.shape[0], -1, cfg.embed_dims[-1])
        x = jnp.mean(x.astype(jnp.float32), axis=1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_head")(x)
        return x
