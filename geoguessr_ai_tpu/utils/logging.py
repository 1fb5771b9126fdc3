"""Observability: W&B / TensorBoard / stdout metric logging, all optional.

Mirrors the reference's logging surface (SURVEY.md §5.5): W&B is primary
with an online -> disabled fallback (main_coordinator_idun.py:695-720),
TensorBoard secondary, tqdm/stdout for SLURM logs.  Every backend is gated
on import so the framework runs in a bare image.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Dict, Optional

logger = logging.getLogger("geoguessr_ai_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def try_init_wandb(project: str, config: Optional[dict] = None, **kwargs):
    """W&B init with the reference's online->disabled fallback."""
    try:
        import wandb
    except ImportError:
        return None
    try:
        return wandb.init(project=project, config=config, **kwargs)
    except Exception:
        try:
            return wandb.init(
                project=project, config=config, mode="disabled", **kwargs
            )
        except Exception:
            return None


class MetricsLogger:
    """Fans metrics out to W&B (if importable), TensorBoard (if torch is
    present), and structured stdout lines."""

    def __init__(
        self,
        project: str = "geoguessr-tpu",
        run_config: Optional[dict] = None,
        tensorboard_dir: Optional[str] = None,
        stdout_every: int = 1,
    ):
        self.wandb_run = try_init_wandb(project, run_config)
        self.tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self.tb = None
        self.stdout_every = max(1, stdout_every)
        self._count = 0

    def log(self, metrics: Dict[str, float], step: int) -> None:
        scalars = {
            k: float(v)
            for k, v in metrics.items()
            if isinstance(v, (int, float)) or hasattr(v, "item")
        }
        if self.wandb_run is not None:
            try:
                self.wandb_run.log(scalars, step=step)
            except Exception:
                pass
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        self._count += 1
        if self._count % self.stdout_every == 0:
            logger.info(json.dumps({"step": step, **scalars}))

    def summary(self, key: str, value) -> None:
        if self.wandb_run is not None:
            try:
                self.wandb_run.summary[key] = value
            except Exception:
                pass
        logger.info(json.dumps({"summary": {key: value}}))

    def finish(self) -> None:
        if self.wandb_run is not None:
            try:
                self.wandb_run.finish()
            except Exception:
                pass
        if self.tb is not None:
            self.tb.close()


class StepTimer:
    """Rolling steps/sec + imgs/sec, for the per-batch log line."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)
