#!/usr/bin/env python
"""Analytic speed-of-light decomposition of the TinyViT-21M-512 embed
forward (the bench.py headline path) on TPU v5e.

Walks the model geometry (models/tinyvit.py; reference architecture
timm tiny_vit_21m_512 — finetune_tinyvit/train_tinyvit_timm.py) and
counts, per component: MXU FLOPs, the MXU contraction depth (K), and
minimum HBM traffic.  Each component gets two speed-of-light times:

  naive SoL   = max(flops / PEAK_BF16, bytes / HBM_BW)
  mapped SoL  = max(flops / (PEAK_BF16 * eff_K), bytes / HBM_BW)

where eff_K = min(1, K/128) is the structural MXU-lane efficiency: a
contraction depth below the 128x128 systolic array's K dimension wastes
the idle lanes no matter how the op is scheduled (the measured mechanism
behind every stage-2 attention kernel verdict: head_dim=32 caps the
score/probs GEMMs at 25%).  "mapped SoL" is therefore the achievable
floor for THIS architecture on THIS chip — the gap between naive and
mapped SoL is the model's fault (small K), not the implementation's.

v5e constants: 197 bf16 TFLOPs/chip, 819 GB/s HBM (public spec).
Depthwise convs and norms carry ~zero MXU FLOPs; their floor is pure
HBM bytes (the VPU keeps up at these shapes — measured dw conv time
~= its bytes/BW floor, docs/performance.md round-3 profile).

Usage: python tools/roofline.py [--batch 512] [--measured profile.json]
"""
import argparse
import json

PEAK_BF16 = 197e12
HBM_BW = 819e9
#: VPU f32 throughput estimate (4 SIMD units x 1024 lanes x ~0.94 GHz).
#: Calibrated by the round-4b MBConv gelu ablation: 6.5G tanh-gelu
#: elements cost 36 ms => ~21 VPU ops/gelu at this rate.
VPU_F32 = 3.85e12
#: VPU ops per softmax element (max pass, sub, exp~4, sum pass, div).
SOFTMAX_OPS = 8
BF16 = 2


def conv2d(name, cat, hw, cin, cout, k=1, stride=1, dw=False, in_bytes=BF16,
           out_bytes=BF16):
    """FLOPs/bytes for one conv at output resolution hw (post-stride)."""
    out_hw = hw // stride
    if dw:
        flops = 2 * out_hw * out_hw * cout * k * k  # per-channel 3x3: VPU
        kdim = 0
    else:
        flops = 2 * out_hw * out_hw * cout * cin * k * k
        kdim = cin * k * k
    bytes_ = (
        hw * hw * cin * in_bytes          # read input
        + out_hw * out_hw * cout * out_bytes  # write output
    )
    return dict(name=name, cat=cat, flops=flops, kdim=kdim, bytes=bytes_)


def gemm(name, cat, m, k, n, in_bytes=BF16, out_bytes=BF16,
         extra_bytes=0.0, vpu_ops=0.0):
    return dict(
        name=name, cat=cat, flops=2 * m * k * n, kdim=k,
        bytes=m * k * in_bytes + m * n * out_bytes + extra_bytes,
        vpu=vpu_ops,
    )


def elementwise(name, cat, nelem, passes=0.0, elem_bytes=BF16):
    """BN/LN/GELU/residual chains: XLA fuses these into the producer
    GEMM/conv epilogue (verified in every per-fusion profile — they never
    appear as standalone HBM passes on the measured path), so the
    min-traffic floor charges them zero extra bytes.  `passes` can model
    an unfused pass for what-if analysis."""
    return dict(name=name, cat=cat, flops=0, kdim=0,
                bytes=nelem * passes * elem_bytes)


def build_components():
    """Per-IMAGE component list for tiny_vit_21m_512."""
    comps = []
    # ---- patch embed: 3x3 s2 3->48 @512->256, 3x3 s2 48->96 @256->128
    comps.append(conv2d("patch conv1 3x3s2 3->48", "patch/downsample conv",
                        512, 3, 48, k=3, stride=2))
    comps.append(conv2d("patch conv2 3x3s2 48->96", "patch/downsample conv",
                        256, 48, 96, k=3, stride=2))
    # ---- stage 0: 2 x MBConv @128^2, C=96, expand 4 (hidden 384)
    for b in range(2):
        comps.append(conv2d(f"s0 mbconv{b} 1x1 96->384", "conv 1x1/3x3",
                            128, 96, 384))
        comps.append(conv2d(f"s0 mbconv{b} dw3x3 @384", "dw conv",
                            128, 384, 384, k=3, dw=True))
        comps.append(conv2d(f"s0 mbconv{b} 1x1 384->96", "conv 1x1/3x3",
                            128, 384, 96))
        comps.append(elementwise(f"s0 mbconv{b} bn/gelu/res",
                                 "norm", 128 * 128 * (384 * 2 + 96 * 2)))
    # ---- transformer stages
    dims = (96, 192, 384, 576)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 18)
    wins = (16, 16, 32, 16)
    res = {1: 64, 2: 32, 3: 16}
    for s in (1, 2, 3):
        C, L, H, Wn = dims[s], depths[s], heads[s], wins[s]
        R = res[s]
        T = R * R              # tokens
        N = Wn * Wn            # window tokens
        W = T // N             # windows per image
        # patch merging from previous stage (at previous resolution)
        Rp = R * 2
        Cp = dims[s - 1]
        comps.append(conv2d(f"merge{s} 1x1 {Cp}->{C}",
                            "patch/downsample conv", Rp, Cp, C))
        comps.append(conv2d(f"merge{s} dw3x3s2 @{C}",
                            "patch/downsample conv", Rp, C, C, k=3,
                            stride=2, dw=True))
        comps.append(conv2d(f"merge{s} 1x1 {C}->{C}",
                            "patch/downsample conv", R, C, C))
        for b in range(L):
            p = f"s{s} blk{b}"
            comps.append(gemm(f"{p} qkv", "attn qkv+proj", T, C, 3 * C))
            # scores q@k^T contracts over head_dim (K set to 32 by
            # fix_attention_kdims); probs@v contracts over N.
            # softmax over the (W*N, N) score tile is pure VPU work
            # the MXU cannot hide (scores stay in VMEM in every
            # winning kernel — the VPU term IS the stage-2 floor).
            comps.append(gemm(f"{p} scores", "attn scores/probs",
                              W * N, C, N,
                              vpu_ops=SOFTMAX_OPS * W * H * N * N))
            comps.append(gemm(f"{p} probs@v", "attn scores/probs",
                              W * N, N, C))
            comps.append(gemm(f"{p} proj", "attn qkv+proj", T, C, C))
            comps.append(conv2d(f"{p} local dw3x3", "dw conv",
                                R, C, C, k=3, dw=True))
            # static-int8 MLP: activations enter the GEMMs as int8
            comps.append(gemm(f"{p} fc1", "mlp", T, C, 4 * C,
                              in_bytes=1, out_bytes=BF16))
            comps.append(gemm(f"{p} fc2", "mlp", T, 4 * C, C,
                              in_bytes=1, out_bytes=BF16))
            comps.append(elementwise(f"{p} LNs/gelu/res", "norm",
                                     T * (C * 4 + 4 * C)))
    # final: mean-pool + norm (negligible)
    comps.append(elementwise("final norm/pool", "norm", 16 * 16 * 576))
    return comps


# Attention score/probs GEMM shapes need head_dim as contraction for
# scores (K=hd=32) and N for probs@v; the helper above charged scores
# with K=C which is wrong — patch it here (kept out of the builder for
# readability).
def fix_attention_kdims(comps):
    for c in comps:
        if c["name"].endswith(" scores"):
            c["kdim"] = 32       # head_dim: q @ k^T contracts over hd
    return comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--measured", default=None,
                    help="JSON {category: ms} from exp_r4_profile")
    args = ap.parse_args()
    B = args.batch

    comps = fix_attention_kdims(build_components())
    by_cat = {}
    for c in comps:
        eff = min(1.0, c["kdim"] / 128.0) if c["kdim"] else 1.0
        t_flops = c["flops"] / PEAK_BF16
        t_vpu = c.get("vpu", 0.0) / VPU_F32
        t_mapped = max(
            (c["flops"] / (PEAK_BF16 * eff)) if c["flops"] else 0.0,
            t_vpu,
        )
        t_bytes = c["bytes"] / HBM_BW
        d = by_cat.setdefault(
            c["cat"],
            dict(flops=0.0, bytes=0.0, naive=0.0, mapped=0.0),
        )
        d["flops"] += c["flops"]
        d["bytes"] += c["bytes"]
        d["naive"] += max(t_flops, t_bytes)
        d["mapped"] += max(t_mapped, t_bytes)

    measured = {}
    if args.measured:
        with open(args.measured) as f:
            measured = json.load(f)

    total_flops = sum(d["flops"] for d in by_cat.values())
    print(f"TinyViT-21M-512 embed forward @ B={B}: "
          f"{total_flops / 1e9:.1f} GFLOP/img "
          f"({total_flops * B / 1e12:.1f} TFLOP/step)")
    print(f"{'category':26s} {'GFLOP/img':>10s} {'MB/img':>8s} "
          f"{'naive ms':>9s} {'mapped ms':>10s} {'meas ms':>8s} {'%SoL':>6s}")
    tot_n = tot_m = 0.0
    rows = sorted(by_cat.items(), key=lambda kv: -kv[1]["mapped"])
    for cat, d in rows:
        naive_ms = d["naive"] * B * 1e3
        mapped_ms = d["mapped"] * B * 1e3
        tot_n += naive_ms
        tot_m += mapped_ms
        meas = measured.get(cat)
        pct = f"{100 * mapped_ms / meas:.0f}%" if meas else "-"
        print(f"{cat:26s} {d['flops'] / 1e9:10.2f} "
              f"{d['bytes'] / 1e6:8.1f} {naive_ms:9.1f} {mapped_ms:10.1f} "
              f"{meas if meas is not None else '-':>8} {pct:>6s}")
    meas_total = sum(measured.values()) if measured else None
    print(f"{'TOTAL':26s} {total_flops / 1e9:10.2f} "
          f"{sum(d['bytes'] for d in by_cat.values()) / 1e6:8.1f} "
          f"{tot_n:9.1f} {tot_m:10.1f} "
          f"{meas_total if meas_total is not None else '-':>8}")
    print(f"\nnaive roofline:  {B / (tot_n / 1e3):.0f} img/s "
          f"({B / 4 / (tot_n / 1e3):.0f} panos/s)")
    print(f"mapped roofline: {B / (tot_m / 1e3):.0f} img/s "
          f"({B / 4 / (tot_m / 1e3):.0f} panos/s)")
    if meas_total:
        print(f"measured:        {B / (meas_total / 1e3):.0f} img/s = "
              f"{100 * tot_m / meas_total:.0f}% of mapped SoL "
              f"({100 * tot_n / meas_total:.0f}% of naive)")


if __name__ == "__main__":
    main()
