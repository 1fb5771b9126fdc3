#!/usr/bin/env python
"""Analytic speed-of-light decomposition of TinyViT embed forward and
(round 5) the full train step on TPU v5e.

Walks the model geometry (models/tinyvit.py; reference architecture
timm tiny_vit_*) and counts, per component: MXU FLOPs, the MXU
contraction depth (K), and minimum HBM traffic.  Each component gets two
speed-of-light times:

  naive SoL   = max(flops / PEAK_BF16, bytes / HBM_BW)
  mapped SoL  = max(flops / (PEAK_BF16 * eff_K), bytes / HBM_BW)

where eff_K = min(1, K/128) is the structural MXU-lane efficiency: a
contraction depth below the 128x128 systolic array's K dimension wastes
the idle lanes no matter how the op is scheduled (the measured mechanism
behind every stage-2 attention kernel verdict: head_dim=32 caps the
score/probs GEMMs at 25%).  "mapped SoL" is therefore the achievable
floor for THIS architecture on THIS chip — the gap between naive and
mapped SoL is the model's fault (small K), not the implementation's.

--train adds the backward pass (VERDICT r4 #2's missing denominator):
per GEMM/conv, dx (kdim = n) and dw (kdim = m) GEMMs at 2x fwd bytes;
the attention score/prob GEMMs + softmax recomputed once in the
backward (both the merged Pallas kernels and XLA's stage-2 VJP
recompute rather than stash the (W*N, N) probs — the measured-best
arrangement, docs/performance.md round-4 chapters); BN stat passes; the
12.6k-cell head + soft-CE; and the AdamW update's parameter traffic.
The model assumes perfect overlap/occupancy, so at the production
micro-batch (B=16 panos = 64 images — the measured 16 GB HBM capacity
wall) it is a FLOOR that ignores the small-batch latency effects the
flat 4,884-fusion profile shows; the honest reading is "how much of the
step is physics vs schedule", not "48 panos/s is reachable".

v5e constants: 197 bf16 TFLOPs/chip, 819 GB/s HBM (public spec).
Depthwise convs and norms carry ~zero MXU FLOPs; their floor is pure
HBM bytes (the VPU keeps up at these shapes — measured dw conv time
~= its bytes/BW floor, docs/performance.md round-3 profile).

Usage: python tools/roofline.py [--batch 512] [--model tiny_vit_21m_512]
         [--train] [--measured profile.json]
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

#: Geometry table (timm presets; models/tinyvit.py config staticmethods).
#: head_dim per stage derives as dims[s] // heads[s] (ADVICE r4: the old
#: hardcoded hd=32 silently misreported other presets).
GEOMETRIES = {
    "tiny_vit_21m_512": dict(
        img=512, dims=(96, 192, 384, 576), depths=(2, 2, 6, 2),
        heads=(3, 6, 12, 18), wins=(16, 16, 32, 16)),
    "tiny_vit_21m_224": dict(
        img=224, dims=(96, 192, 384, 576), depths=(2, 2, 6, 2),
        heads=(3, 6, 12, 18), wins=(7, 7, 14, 7)),
    "tiny_vit_11m_224": dict(
        img=224, dims=(64, 128, 256, 448), depths=(2, 2, 6, 2),
        heads=(2, 4, 8, 14), wins=(7, 7, 14, 7)),
    "tiny_vit_5m_224": dict(
        img=224, dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
        heads=(2, 4, 5, 10), wins=(7, 7, 14, 7)),
}


def conv2d(name, cat, hw, cin, cout, k=1, stride=1, dw=False, in_bytes=BF16,
           out_bytes=BF16):
    """FLOPs/bytes for one conv at input resolution hw."""
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
    # m/n for the backward wgrad/dgrad GEMM shapes
    return dict(name=name, cat=cat, flops=flops, kdim=kdim, bytes=bytes_,
                m=out_hw * out_hw, n=cout)


def gemm(name, cat, m, k, n, in_bytes=BF16, out_bytes=BF16,
         extra_bytes=0.0, vpu_ops=0.0):
    return dict(
        name=name, cat=cat, flops=2 * m * k * n, kdim=k,
        bytes=m * k * in_bytes + m * n * out_bytes + extra_bytes,
        vpu=vpu_ops, m=m, n=n,
    )


def elementwise(name, cat, nelem, passes=0.0, elem_bytes=BF16):
    """BN/LN/GELU/residual chains: XLA fuses these into the producer
    GEMM/conv epilogue (verified in every per-fusion profile — they never
    appear as standalone HBM passes on the measured path), so the
    min-traffic floor charges them zero extra bytes.  `passes` can model
    an unfused pass (train mode charges BN/LN one stats pass)."""
    return dict(name=name, cat=cat, flops=0, kdim=0,
                bytes=nelem * passes * elem_bytes, nelem=nelem)


def build_components(model="tiny_vit_21m_512", int8_mlp=True, train=False):
    """Per-IMAGE component list for the given preset."""
    g = GEOMETRIES[model]
    img, dims, depths, heads, wins = (
        g["img"], g["dims"], g["depths"], g["heads"], g["wins"])
    mlp_bytes = 1 if int8_mlp else BF16
    comps = []
    # ---- patch embed: 3x3 s2 3->dims0/2, 3x3 s2 /2->dims0
    comps.append(conv2d("patch conv1 3x3s2", "patch/downsample conv",
                        img, 3, dims[0] // 2, k=3, stride=2))
    comps.append(conv2d("patch conv2 3x3s2", "patch/downsample conv",
                        img // 2, dims[0] // 2, dims[0], k=3, stride=2))
    r0 = img // 4
    # ---- stage 0: MBConvs, expand 4
    hidden = dims[0] * 4
    for b in range(depths[0]):
        comps.append(conv2d(f"s0 mbconv{b} 1x1 expand", "conv 1x1/3x3",
                            r0, dims[0], hidden))
        comps.append(conv2d(f"s0 mbconv{b} dw3x3", "dw conv",
                            r0, hidden, hidden, k=3, dw=True))
        comps.append(conv2d(f"s0 mbconv{b} 1x1 project", "conv 1x1/3x3",
                            r0, hidden, dims[0]))
        comps.append(elementwise(f"s0 mbconv{b} bn/gelu/res", "norm",
                                 r0 * r0 * (hidden * 2 + dims[0] * 2),
                                 passes=1.0 if train else 0.0))
    # ---- transformer stages
    for s in (1, 2, 3):
        C, L, H, Wn = dims[s], depths[s], heads[s], wins[s]
        hd = C // H
        R = img // (4 * 2 ** s)
        T = R * R              # tokens
        N = min(Wn, R) ** 2    # window tokens
        W = max(1, T // N)     # windows per image
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
            # scores q@k^T contracts over head_dim (kdim=hd); probs@v
            # contracts over N.  softmax over the (W*N, N) score tile is
            # pure VPU work the MXU cannot hide (scores stay in VMEM in
            # every winning kernel — the VPU term IS the stage-2 floor).
            sc = gemm(f"{p} scores", "attn scores/probs", W * N, C, N,
                      vpu_ops=SOFTMAX_OPS * W * H * N * N)
            sc["kdim"] = hd
            comps.append(sc)
            comps.append(gemm(f"{p} probs@v", "attn scores/probs",
                              W * N, N, C))
            comps.append(gemm(f"{p} proj", "attn qkv+proj", T, C, C))
            comps.append(conv2d(f"{p} local dw3x3", "dw conv",
                                R, C, C, k=3, dw=True))
            comps.append(gemm(f"{p} fc1", "mlp", T, C, 4 * C,
                              in_bytes=mlp_bytes, out_bytes=BF16))
            comps.append(gemm(f"{p} fc2", "mlp", T, 4 * C, C,
                              in_bytes=mlp_bytes, out_bytes=BF16))
            comps.append(elementwise(f"{p} LNs/gelu/res", "norm",
                                     T * (C * 4 + 4 * C),
                                     passes=1.0 if train else 0.0))
    # final: mean-pool + norm (negligible)
    comps.append(elementwise("final norm/pool", "norm",
                             (img // 32) ** 2 * dims[-1]))
    return comps


def add_backward(comps, batch_images):
    """Expand to fwd + bwd components (per image unless noted).

    Per dense GEMM/conv (m, k, n): dx = do @ w^T (kdim=n) and
    dw = x^T @ do (kdim = m*batch — the batch dim joins the
    contraction), each at ~fwd FLOPs, with ~2x fwd bytes total.
    Attention: the backward RECOMPUTES scores/softmax (the merged
    Pallas kernels and XLA's stage-2 VJP both recompute rather than
    stash — measured-best, round-4 chapters) then runs the 4 attn bwd
    dots.  dw convs: dgrad mirrors the conv (bytes), wgrad is a small
    reduce.  Train runs bf16 compute like the fwd.
    """
    out = list(comps)
    for c in comps:
        if c["flops"] and c["kdim"]:  # dense GEMM/conv
            m, n, k = c["m"], c["n"], c["kdim"]
            is_attn = "scores" in c["name"] or "probs" in c["name"]
            vpu = c.get("vpu", 0.0)
            cat = "attn bwd" if is_attn else "bwd " + c["cat"]
            # recompute of the fwd op inside the bwd (attention only)
            if is_attn:
                out.append(dict(name=c["name"] + " (bwd recompute)",
                                cat="attn bwd", flops=c["flops"],
                                kdim=c["kdim"], bytes=c["bytes"] * 0.5,
                                vpu=vpu))
            out.append(dict(name=c["name"] + " (dx)", cat=cat,
                            flops=c["flops"], kdim=n,
                            bytes=c["bytes"], vpu=vpu if is_attn else 0.0))
            out.append(dict(name=c["name"] + " (dw)", cat=cat,
                            flops=c["flops"],
                            kdim=min(128, m * batch_images),
                            bytes=c["bytes"]))
        elif c["cat"] == "dw conv":
            out.append(dict(name=c["name"] + " (dgrad)", cat="bwd dw conv",
                            flops=c["flops"], kdim=0, bytes=c["bytes"]))
        elif c["cat"] == "norm" and c["bytes"]:
            out.append(dict(name=c["name"] + " (bwd)", cat="norm",
                            flops=0, kdim=0, bytes=c["bytes"]))
    return out


def train_extras(batch_panos, num_cells=12647, embed_dim=576,
                 n_params=28.5e6):
    """Per-STEP (not per-image) components of the SuperGuessr train
    step beyond the tower: view-mean fusion, cell head fwd+bwd,
    soft-CE + haversine label assignment, AdamW update."""
    B = batch_panos
    comps = []
    comps.append(gemm("cell head fwd", "head/loss", B, embed_dim,
                      num_cells))
    comps.append(gemm("cell head dx", "head/loss", B, num_cells,
                      embed_dim))
    comps.append(gemm("cell head dw", "head/loss", embed_dim, B,
                      num_cells))
    # haversine label matrix (B x cells) + softmax-CE: VPU, ~30 ops/elem
    comps.append(dict(name="labels+softCE", cat="head/loss", flops=0,
                      kdim=0, bytes=B * num_cells * 4 * 2,
                      vpu=30.0 * B * num_cells))
    # AdamW: read p, m, v, g (f32) + write p, m, v
    comps.append(dict(name="adamw update", cat="optimizer", flops=0,
                      kdim=0, bytes=n_params * 4 * 7))
    return comps


def main():
    ap = argparse.ArgumentParser(
        description="TinyViT structural roofline (fwd, or fwd+bwd train)")
    ap.add_argument("--batch", type=int, default=512,
                    help="images for fwd mode; PANORAMAS (x4 images) "
                         "for --train")
    ap.add_argument("--model", default="tiny_vit_21m_512",
                    choices=sorted(GEOMETRIES))
    ap.add_argument("--train", action="store_true",
                    help="fwd+bwd+optimizer SuperGuessr step roofline")
    ap.add_argument("--measured", default=None,
                    help="JSON {category: ms} from exp_r4_profile")
    args = ap.parse_args()
    B = args.batch
    n_images = B * 4 if args.train else B

    comps = build_components(args.model, int8_mlp=not args.train,
                             train=args.train)
    if args.train:
        comps = add_backward(comps, n_images)
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

    # scale per-image cats by image count, then add per-step extras
    for d in by_cat.values():
        for k in d:
            d[k] *= n_images
    if args.train:
        for c in train_extras(B):
            eff = min(1.0, c["kdim"] / 128.0) if c["kdim"] else 1.0
            t_flops = c["flops"] / PEAK_BF16
            t_vpu = c.get("vpu", 0.0) / VPU_F32
            t_mapped = max(
                (c["flops"] / (PEAK_BF16 * eff)) if c["flops"] else 0.0,
                t_vpu)
            t_bytes = c["bytes"] / HBM_BW
            d = by_cat.setdefault(
                c["cat"],
                dict(flops=0.0, bytes=0.0, naive=0.0, mapped=0.0))
            d["flops"] += c["flops"]
            d["bytes"] += c["bytes"]
            d["naive"] += max(t_flops, t_bytes)
            d["mapped"] += max(t_mapped, t_bytes)

    measured = {}
    if args.measured:
        with open(args.measured) as f:
            measured = json.load(f)

    total_flops = sum(d["flops"] for d in by_cat.values())
    unit = "pano" if args.train else "img"
    mode = "train step (fwd+bwd+opt)" if args.train else "embed forward"
    print(f"{args.model} {mode} @ B={B} {unit}s: "
          f"{total_flops / n_images / 1e9:.1f} GFLOP/img "
          f"({total_flops / 1e12:.2f} TFLOP/step)")
    print(f"{'category':26s} {'GFLOP/step':>11s} {'GB/step':>8s} "
          f"{'naive ms':>9s} {'mapped ms':>10s} {'meas ms':>8s} {'%SoL':>6s}")
    tot_n = tot_m = 0.0
    rows = sorted(by_cat.items(), key=lambda kv: -kv[1]["mapped"])
    for cat, d in rows:
        naive_ms = d["naive"] * 1e3
        mapped_ms = d["mapped"] * 1e3
        tot_n += naive_ms
        tot_m += mapped_ms
        meas = measured.get(cat)
        pct = f"{100 * mapped_ms / meas:.0f}%" if meas else "-"
        print(f"{cat:26s} {d['flops'] / 1e9:11.2f} "
              f"{d['bytes'] / 1e9:8.2f} {naive_ms:9.1f} {mapped_ms:10.1f} "
              f"{meas if meas is not None else '-':>8} {pct:>6s}")
    meas_total = sum(measured.values()) if measured else None
    print(f"{'TOTAL':26s} {total_flops / 1e9:11.2f} "
          f"{sum(d['bytes'] for d in by_cat.values()) / 1e9:8.2f} "
          f"{tot_n:9.1f} {tot_m:10.1f} "
          f"{meas_total if meas_total is not None else '-':>8}")
    per = B
    print(f"\nnaive roofline:  {per / (tot_n / 1e3):.0f} {unit}/s")
    print(f"mapped roofline: {per / (tot_m / 1e3):.0f} {unit}/s")
    if meas_total:
        print(f"measured:        {per / (meas_total / 1e3):.1f} {unit}/s = "
              f"{100 * tot_m / meas_total:.0f}% of mapped SoL "
              f"({100 * tot_n / meas_total:.0f}% of naive)")


if __name__ == "__main__":
    main()
