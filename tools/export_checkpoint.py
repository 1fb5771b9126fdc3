#!/usr/bin/env python
"""Export an orbax training checkpoint to a reference-compatible .pt file.

The inverse of the reference->here loaders: SuperGuessr head params go to
the reference's state-dict naming (cell_layer.*, self_attn.*) and a
TinyViT backbone to timm naming under the reference's ``base_model.``
prefix — so a model trained on TPU here can be evaluated by the PyTorch
reference (inference.py:126-156 shape-filtered load).

Usage: python tools/export_checkpoint.py --checkpoint <orbax dir>/best \
           --out model.pt [--backbone tinyvit] [--heads 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def export(
    checkpoint: str,
    out: str,
    backbone: str = "tinyvit",
    num_attention_heads: int = 16,
) -> dict:
    import orbax.checkpoint as ocp
    import torch

    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig
    from geoguessr_ai_tpu.models.torch_convert import (
        super_guessr_head_to_reference,
        tinyvit_to_timm,
    )

    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(checkpoint)
    )
    state = restored["state"] if "state" in restored else restored
    params = state["params"]
    sd = super_guessr_head_to_reference(
        params, num_attention_heads=num_attention_heads
    )
    if backbone == "tinyvit" and "backbone" in params:
        bb = tinyvit_to_timm(
            {
                "params": params["backbone"],
                "batch_stats": state.get("batch_stats", {}).get(
                    "backbone", {}
                ),
            },
            TinyViTConfig.tiny_vit_21m_512(),
        )
        sd.update(
            {f"base_model.backbone.{k}": v for k, v in bb.items()}
        )
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
        out,
    )
    return sd


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="orbax dir (e.g. <run>/best)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--backbone", default="tinyvit", choices=("tinyvit", "none"))
    ap.add_argument("--heads", type=int, default=16)
    args = ap.parse_args()
    sd = export(args.checkpoint, args.out, args.backbone, args.heads)
    print(f"wrote {args.out}: {len(sd)} tensors")


if __name__ == "__main__":
    main()
