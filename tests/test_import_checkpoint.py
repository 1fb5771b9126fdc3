"""tools/import_checkpoint.py — the real-weight import runbook
(round-3 VERDICT #4): .pt -> convert -> orbax -> fixture parity report,
exercised end-to-end with synthetic-weight .pt files."""

import json
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")


def _head_sd(num_cells, dim, rng):
    return {
        "cell_layer.weight": rng.normal(0, 0.05, (num_cells, dim)).astype(
            np.float32
        ),
        "cell_layer.bias": rng.normal(0, 0.01, (num_cells,)).astype(
            np.float32
        ),
    }


def test_import_reference_checkpoint_with_backbone(tmp_path):
    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig
    from geoguessr_ai_tpu.models.torch_tinyvit_ref import (
        synthetic_timm_state_dict,
    )
    from import_checkpoint import import_checkpoint

    cfg = TinyViTConfig.test_tiny()
    rng = np.random.default_rng(0)
    sd = {
        f"base_model.backbone.{k}": v
        for k, v in synthetic_timm_state_dict(cfg, seed=2).items()
    }
    sd.update(_head_sd(50, cfg.embed_dim, rng))
    pt = tmp_path / "ref.pt"
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
        pt,
    )

    report = import_checkpoint(
        str(pt), str(tmp_path / "orbax"), preset="test_tiny"
    )
    assert report["format"] == "reference"
    assert report["num_cells"] == 50
    assert report["parity"]["min_cosine"] > 0.999
    assert report["parity"]["max_abs_diff"] < 1e-3

    # the orbax output is loadable and runs
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.models.tinyvit import TinyViT

    restored = ocp.StandardCheckpointer().restore(report["orbax_dir"])
    model = SuperGuessr(
        num_cells=50, backbone=TinyViT(cfg), panorama=True,
        embed_dim=cfg.embed_dim,
    )
    emb, logits = model.apply(
        {
            "params": restored["state"]["params"],
            "batch_stats": restored["state"]["batch_stats"],
        },
        pixel_values=jnp.zeros((1, 4, cfg.image_size, cfg.image_size, 3)),
    )
    assert logits.shape == (1, 50)
    assert np.isfinite(np.asarray(logits)).all()
    # imported head weights actually present (not random init)
    np.testing.assert_allclose(
        np.asarray(restored["state"]["params"]["cell_layer"]["kernel"]),
        sd["cell_layer.weight"].T,
        atol=1e-6,
    )


def test_import_raw_timm_state_dict(tmp_path):
    from geoguessr_ai_tpu.models.tinyvit import TinyViTConfig
    from geoguessr_ai_tpu.models.torch_tinyvit_ref import (
        synthetic_timm_state_dict,
    )
    from import_checkpoint import import_checkpoint

    cfg = TinyViTConfig.test_tiny()
    sd = synthetic_timm_state_dict(cfg, seed=5)
    pt = tmp_path / "timm.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pt)

    report = import_checkpoint(
        str(pt), str(tmp_path / "orbax"), preset="test_tiny"
    )
    assert report["format"] == "timm_tinyvit"
    assert report["parity"]["min_cosine"] > 0.999


def test_import_cli_and_proto_df(tmp_path):
    """CLI end-to-end incl. the --proto-df ordering-contract sidecar."""
    import pandas as pd

    rng = np.random.default_rng(1)
    sd = _head_sd(20, 16, rng)
    pt = tmp_path / "head.pt"
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
        pt,
    )
    pd.DataFrame(
        {
            "geocell_index": np.arange(20),
            "country": ["X"] * 20,
            "admin1": ["Y"] * 20,
            "cell_id": [f"c{i}" for i in range(20)],
            "centroid_lng": rng.uniform(-180, 180, 20),
            "centroid_lat": rng.uniform(-85, 85, 20),
        }
    ).to_csv(tmp_path / "proto_df.csv", index=False)

    out = subprocess.run(
        [
            sys.executable, "tools/import_checkpoint.py",
            "--pt", str(pt), "--out", str(tmp_path / "orbax"),
            "--preset", "test_tiny", "--no-parity", "--cpu",
            "--proto-df", str(tmp_path / "proto_df.csv"),
            "--report", str(tmp_path / "report.json"),
        ],
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.load(open(tmp_path / "report.json"))
    assert report["format"] == "reference"
    z = np.load(report["centroid_table"])
    assert z["centroids"].shape == (20, 2)
