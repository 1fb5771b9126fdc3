#!/usr/bin/env python
"""Import reference / timm / HF weights into an orbax checkpoint, with a
fixture-panorama parity report.

The one-command half of the real-weight runbook (the day pretrained
weights are reachable, parity is this command, not an integration
project):

  python tools/import_checkpoint.py --pt epoch_0018_4.610809.pt \
      --out checkpoints/imported --report parity.json

then evaluate exactly like the reference does
(/root/reference/run_benchmark.py:146):

  python run_benchmark.py --num-samples 100 --sqlite-path data.sqlite \
      --checkpoint checkpoints/imported

Accepted --pt formats (auto-detected from the key set):
  * reference SuperGuessr training checkpoint — ``model_state_dict``
    with ``cell_layer.*`` / ``self_attn.*`` head keys and an optional
    ``base_model.*`` backbone (reference inference.py:126-156);
  * raw timm tiny_vit state dict (``patch_embed.conv1.conv.weight`` …);
  * HF CLIP vision state dict (``vision_model.…``).

The parity report runs the tests/fixtures panorama through the torch
side (TorchTinyViT — timm-semantics reimplementation, or transformers'
CLIPVisionModel) and the converted Flax model, and records per-view
embedding cosine + max abs diff.  NOTE on orderings: a reference
checkpoint's cell_layer is ordered by ITS proto_df.csv geocell_index
(a filesystem-order contract — see tests/test_reference_oracle.py);
pass that proto_df via --proto-df so decode uses the matching centroid
table.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def _detect_format(sd) -> str:
    if any(k.startswith("cell_layer.") for k in sd):
        return "reference"
    if any(k.startswith("vision_model.") for k in sd):
        return "hf_clip"
    if any(".attn.qkv." in k or k.startswith("patch_embed.conv1") for k in sd):
        return "timm_tinyvit"
    raise ValueError(
        f"unrecognized state dict (sample keys: {sorted(sd)[:5]})"
    )


def _fixture_batch(image_size, mean, std):
    import numpy as np

    from geoguessr_ai_tpu.data.pipeline import decode_jpeg

    import glob

    paths = sorted(glob.glob(os.path.join(FIXDIR, "heading=*.jpg")))
    views = np.stack(
        [decode_jpeg(open(p, "rb").read(), image_size) for p in paths]
    )
    x = views.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _tinyvit_parity(timm_sd, cfg) -> dict:
    """Fixture-panorama embedding parity: TorchTinyViT vs converted Flax."""
    import jax
    import numpy as np
    import torch

    from geoguessr_ai_tpu.config import TINYVIT_NORM_MEAN, TINYVIT_NORM_STD
    from geoguessr_ai_tpu.models.tinyvit import TinyViT
    from geoguessr_ai_tpu.models.torch_convert import tinyvit_from_timm
    from geoguessr_ai_tpu.models.torch_tinyvit_ref import TorchTinyViT

    import jax.numpy as jnp

    pcfg = dataclasses.replace(cfg, dtype=jnp.float32, exact_gelu=True)
    tm = TorchTinyViT(pcfg)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in timm_sd.items()},
        strict=True,
    )
    tm.eval()
    x = _fixture_batch(cfg.image_size, TINYVIT_NORM_MEAN, TINYVIT_NORM_STD)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    conv = tinyvit_from_timm(timm_sd, pcfg)
    got = np.asarray(
        TinyViT(pcfg).apply(
            {"params": conv["params"], "batch_stats": conv["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    )
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    return {
        "torch_oracle": "TorchTinyViT (timm semantics)",
        "views": int(x.shape[0]),
        "min_cosine": float(cos.min()),
        "max_abs_diff": float(np.abs(got - want).max()),
    }


def _clip_parity(hf_sd, cfg) -> dict:
    """Fixture parity vs transformers' real CLIPVisionModel (offline —
    config built locally, weights from the state dict)."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import CLIP_NORM_MEAN, CLIP_NORM_STD
    from geoguessr_ai_tpu.models.clip_vit import CLIPVisionTower
    from geoguessr_ai_tpu.models.torch_convert import clip_vision_from_hf
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel

    hf_cfg = HFConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.mlp_dim,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
    )
    tm = CLIPVisionModel(hf_cfg)
    tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in hf_sd.items()},
        strict=False,
    )
    tm.eval()
    x = _fixture_batch(cfg.image_size, CLIP_NORM_MEAN, CLIP_NORM_STD)
    with torch.no_grad():
        want = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2))
            .pooler_output.numpy()
        )
    pcfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = clip_vision_from_hf(hf_sd, pcfg)
    got = np.asarray(
        CLIPVisionTower(pcfg).apply(
            {"params": params}, jnp.asarray(x)
        ).pooler_output
    )
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    return {
        "torch_oracle": "transformers.CLIPVisionModel",
        "views": int(x.shape[0]),
        "min_cosine": float(cos.min()),
        "max_abs_diff": float(np.abs(got - want).max()),
    }


def import_checkpoint(
    pt_path: str,
    out_dir: str,
    preset: str = "tiny_vit_21m_512",
    parity: bool = True,
    proto_df: str | None = None,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.models.torch_convert import (
        merge_params,
        super_guessr_head_from_reference,
        tinyvit_from_timm,
    )
    from geoguessr_ai_tpu.train.checkpoints import load_torch_checkpoint

    # Normalize: a trailing-slash --out would put the sidecar INSIDE the
    # checkpoint dir where inference.py/run_benchmark.py's
    # `checkpoint.rstrip('/') + "_centroids.npz"` auto-detection misses
    # it (decode would silently fall back to the repo's default table —
    # a permuted cell ordering).
    out_dir = out_dir.rstrip("/")
    sd = load_torch_checkpoint(pt_path)
    fmt = _detect_format(sd)
    cfg = getattr(TinyViTConfig, preset)()
    report: dict = {"source": pt_path, "format": fmt, "tensors": len(sd)}

    if fmt == "hf_clip":
        from geoguessr_ai_tpu.models.clip_vit import (
            CLIPVisionConfig,
            CLIPVisionTower,
        )
        from geoguessr_ai_tpu.models.torch_convert import clip_vision_from_hf

        ccfg = CLIPVisionConfig.vit_l_14_336()
        params = clip_vision_from_hf(sd, ccfg)
        state = {"params": params, "batch_stats": {}}
        if parity:
            report["parity"] = _clip_parity(sd, ccfg)
    elif fmt == "timm_tinyvit":
        conv = tinyvit_from_timm(sd, cfg)
        state = {
            "params": conv["params"],
            "batch_stats": conv["batch_stats"],
        }
        if parity:
            report["parity"] = _tinyvit_parity(sd, cfg)
    else:  # reference SuperGuessr checkpoint
        from geoguessr_ai_tpu.models.super_guessr import SuperGuessr

        num_cells = int(np.asarray(sd["cell_layer.weight"]).shape[0])
        report["num_cells"] = num_cells
        hierarchical = "self_attn.in_proj_weight" in sd
        bb_sd = {
            k.split("base_model.", 1)[1].split("backbone.", 1)[-1]
            .split("model.", 1)[-1]: v
            for k, v in sd.items()
            if k.startswith("base_model.")
        }
        model = SuperGuessr(
            num_cells=num_cells,
            backbone=TinyViT(cfg) if bb_sd else None,
            panorama=True,
            hierarchical=hierarchical,
            embed_dim=cfg.embed_dim if bb_sd else int(
                np.asarray(sd["cell_layer.weight"]).shape[1]
            ),
        )
        if bb_sd:
            dummy = jnp.zeros((1, 4, cfg.image_size, cfg.image_size, 3))
            variables = model.init(jax.random.PRNGKey(0), pixel_values=dummy)
        else:
            variables = model.init(
                jax.random.PRNGKey(0),
                embedding=jnp.zeros((1, 4, model.embed_dim)),
            )
        params = dict(variables["params"])
        batch_stats = dict(variables.get("batch_stats", {}))
        if bb_sd:
            conv = tinyvit_from_timm(bb_sd, cfg)
            params["backbone"] = conv["params"]
            batch_stats["backbone"] = conv["batch_stats"]
            if parity:
                report["parity"] = _tinyvit_parity(bb_sd, cfg)
        params = merge_params(
            params, super_guessr_head_from_reference(sd, num_cells=num_cells)
        )
        report["head_subtrees"] = sorted(
            super_guessr_head_from_reference(sd, num_cells=num_cells)
        )
        state = {"params": params, "batch_stats": batch_stats}

    if proto_df:
        # rebuild the matching centroid table artifact next to the
        # checkpoint (the cell_layer ordering contract travels WITH the
        # checkpoint's proto_df, not with this repo's table)
        import pandas as pd

        df = pd.read_csv(proto_df).drop_duplicates("geocell_index")
        df = df.sort_values("geocell_index")
        np.savez(
            os.path.join(out_dir + "_centroids.npz"),
            centroids=df[["centroid_lng", "centroid_lat"]].values.astype(
                np.float32
            ),
            country=df["country"].astype(str).values,
            admin1=df["admin1"].astype(str).values,
            cell_id=df["cell_id"].astype(str).values,
        )
        report["centroid_table"] = out_dir + "_centroids.npz"

    state = jax.tree.map(jnp.asarray, state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_dir), {"state": state}, force=True)
    # StandardCheckpointer saves asynchronously — block until the
    # checkpoint is on disk before reporting it usable.
    ckptr.wait_until_finished()
    report["orbax_dir"] = os.path.abspath(out_dir)
    return report


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--pt", required=True, help="source .pt file")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument(
        "--preset", default="tiny_vit_21m_512",
        choices=("tiny_vit_21m_512", "tiny_vit_21m_224", "tiny_vit_5m_224",
                 "test_tiny"),
    )
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (conversion needs no TPU; "
                    "avoids queueing behind remote TPU compiles)")
    ap.add_argument("--proto-df", default=None,
                    help="the checkpoint's proto_df.csv (ordering contract)")
    ap.add_argument("--report", default=None, help="write report JSON here")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    report = import_checkpoint(
        args.pt, args.out, preset=args.preset,
        parity=not args.no_parity, proto_df=args.proto_df,
    )
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
