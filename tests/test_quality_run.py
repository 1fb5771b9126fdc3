"""Smoke test of the quality-run pipeline (tools/quality_run.py): tiny
synthetic world through the REAL coordinator + the learned-refiner
evaluation stage, asserting the artifact fields exist and training beat
chance."""

import importlib.util
import json
import os
import sys

import numpy as np


def _load_tool():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "quality_run.py",
    )
    spec = importlib.util.spec_from_file_location("quality_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quality_run_end_to_end(tmp_path, monkeypatch):
    qr = _load_tool()
    out = str(tmp_path / "QUALITY.json")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "quality_run.py",
            "--cells", "6",
            "--locations", "96",
            "--epochs", "10",
            "--batch-size", "16",
            "--noise", "8",
            "--refine",
            "--out", out,
        ],
    )
    try:
        qr.main()
    except SystemExit as e:  # exit(1) = below 3x chance; still wrote JSON
        assert e.code in (None, 0), "quality run failed to beat 3x chance"
    q = json.load(open(out))
    for field in (
        "quality_val_top1",
        "quality_val_median_km",
        "quality_refined_top1",
        "quality_refined_median_km",
        "quality_chance_top1",
    ):
        assert field in q, field
    assert np.isfinite(q["quality_val_median_km"])
    assert q["quality_val_top1"] > 3 * q["quality_chance_top1"]
