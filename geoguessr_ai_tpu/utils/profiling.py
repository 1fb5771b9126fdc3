"""Tracing / profiling utilities.

TPU equivalent of the reference's torch.profiler integration
(training/train_eval_loop.py:22-34: schedule(wait=2, warmup=2, active=10,
repeat=2) writing TensorBoard traces): a step-scheduled wrapper around
``jax.profiler`` emitting Perfetto/XProf traces that TensorBoard's profile
plugin reads from the same log dir.
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass
from typing import Optional

import jax


@dataclass
class ProfileSchedule:
    """torch.profiler.schedule-compatible stepping: skip `wait`, then
    `warmup`, then capture `active` steps, `repeat` times."""

    wait: int = 2
    warmup: int = 2
    active: int = 10
    repeat: int = 2


class StepProfiler:
    """Step-driven profiler (reference generate_profiler,
    train_eval_loop.py:22-34).

    Usage:
        prof = StepProfiler("runs/profile")
        for batch in loader:
            ...
            prof.step()
    """

    def __init__(
        self,
        log_dir: str = "runs/profile",
        schedule: Optional[ProfileSchedule] = None,
    ):
        self.log_dir = log_dir
        self.schedule = schedule or ProfileSchedule()
        self._step = 0
        self._cycle = 0
        self._tracing = False
        os.makedirs(log_dir, exist_ok=True)

    def step(self) -> None:
        s = self.schedule
        if self._cycle >= s.repeat:
            return
        pos = self._step
        start_at = s.wait + s.warmup
        stop_at = start_at + s.active
        if pos == start_at and not self._tracing:
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        self._step += 1
        if self._step >= stop_at and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            self._cycle += 1
            self._step = 0

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Context-managed whole-region trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
