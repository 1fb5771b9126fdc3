"""Checkpoint store: last / best / top-K-with-pruning + resume.

Reproduces the reference's retention scheme (main_coordinator_idun.py:
509-674) on Orbax: ``last`` every epoch, ``best`` on monitored-metric
improvement, per-epoch ``epoch_%04d_%.6f`` directories kept only while in
the top-K (metric parsed back out of the directory name for pruning, exactly
like the reference's filename-encoded metrics), plus full resume of
model/optimizer/step/epoch/best state.
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

_EPOCH_DIR_RE = re.compile(r"^epoch_(\d{4})_(-?[\d.]+)$")


def _checkpointer():
    return ocp.StandardCheckpointer()


@dataclass
class CheckpointConfig:
    directory: str
    keep_top_k: int = 3
    monitored_mode: str = "min"  # "min" (loss) or "max" (score)
    # Async saves: orbax's StandardCheckpointer is an AsyncCheckpointer
    # under the hood — when True, save_epoch returns as soon as the
    # device->host copy is snapshotted and the directory commit runs in a
    # background thread, overlapping checkpoint IO with the next epoch's
    # compute.  The store waits for the in-flight save before touching the
    # same paths again (overwrite/prune/restore), so artifacts are always
    # complete when read back.
    async_save: bool = False


class CheckpointStore:
    """Filesystem layout:
        <dir>/last/          — newest state (overwritten each save)
        <dir>/best/          — best monitored metric so far
        <dir>/epoch_0018_4.610809/ — top-K per-epoch checkpoints
    """

    def __init__(self, cfg: CheckpointConfig):
        self.cfg = cfg
        os.makedirs(cfg.directory, exist_ok=True)
        self._ckptr = _checkpointer()
        self._bg: Optional[Any] = None  # in-flight finalize thread
        self._bg_error: Optional[BaseException] = None

    # -- helpers ---------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(os.path.abspath(self.cfg.directory), name)

    def _is_better(self, value: float, reference: float) -> bool:
        if self.cfg.monitored_mode == "min":
            return value < reference
        return value > reference

    def _epoch_dirs(self) -> List[Tuple[str, int, float]]:
        out = []
        for name in os.listdir(self.cfg.directory):
            m = _EPOCH_DIR_RE.match(name)
            if m:
                out.append((name, int(m.group(1)), float(m.group(2))))
        return out

    def _save_tree(self, name: str, tree: Any) -> None:
        # Defensive recreation: survive the checkpoint dir being removed
        # mid-run (reference main_coordinator_idun.py:555-563).
        os.makedirs(self.cfg.directory, exist_ok=True)
        path = self._path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, tree)

    def _join(self) -> None:
        """Finish any in-flight async finalize before touching the store."""
        if self._bg is not None:
            self._bg.join()
            self._bg = None
        self._ckptr.wait_until_finished()
        if self._bg_error is not None:
            err, self._bg_error = self._bg_error, None
            raise err

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has fully committed
        (including the last/best copies and pruning)."""
        self._join()

    def _copy_tree(self, src_name: str, dst_name: str) -> None:
        src, dst = self._path(src_name), self._path(dst_name)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    # -- public API ------------------------------------------------------

    def save_epoch(
        self,
        state: Any,
        epoch: int,
        monitored_value: float,
        best_value: Optional[float],
        extra: Optional[Dict] = None,
    ) -> float:
        """Save last/best/top-K for this epoch.  Returns the new best value.

        `state` is any pytree (e.g. train.state.TrainState); `extra` metadata
        (config, metric names) rides along in the tree.
        """
        # Resolve the new best BEFORE writing anything, so the 'last'
        # checkpoint's meta carries the post-epoch best (a resume after an
        # improving epoch must not revert to the stale best and let a
        # worse epoch overwrite the 'best' checkpoint).  NaN monitored
        # values never become best — NaN comparisons would otherwise
        # poison all later _is_better checks.
        monitored_is_valid = not np.isnan(monitored_value)
        improved = monitored_is_valid and (
            best_value is None
            or np.isnan(best_value)
            or self._is_better(monitored_value, best_value)
        )
        new_best = monitored_value if improved else best_value
        tree = {
            "state": state,
            "meta": {
                "epoch": np.asarray(epoch, np.int64),
                "monitored_value": np.asarray(monitored_value, np.float64),
                "best_value": np.asarray(
                    new_best if new_best is not None else monitored_value,
                    np.float64,
                ),
                **(extra or {}),
            },
        }

        # The tree is written to disk ONCE (one device->host snapshot);
        # 'last' and 'best' are host-side directory copies of it.  NaN
        # epochs get no metric-encoded directory, so 'last' is primary.
        self._join()
        if monitored_is_valid:
            primary = f"epoch_{epoch:04d}_{monitored_value:.6f}"
        else:
            primary = "last"
        self._save_tree(primary, tree)

        def _finalize() -> None:
            try:
                self._ckptr.wait_until_finished()
                if primary != "last":
                    self._copy_tree(primary, "last")
                if improved:
                    self._copy_tree(primary, "best")
                if monitored_is_valid:
                    self._prune()
                    if primary in {n for n, _, _ in self._epoch_dirs()}:
                        self._notify_artifact(primary)
            except BaseException as e:  # surfaced at the next store op
                self._bg_error = e

        if self.cfg.async_save:
            import threading

            self._bg = threading.Thread(target=_finalize, daemon=True)
            self._bg.start()
        else:
            _finalize()
            if self._bg_error is not None:
                err, self._bg_error = self._bg_error, None
                raise err
        return float(new_best) if new_best is not None else float("nan")

    def _notify_artifact(self, name: str) -> None:
        """Upload a kept epoch checkpoint as a W&B artifact when W&B is
        active (reference main_coordinator_idun.py:592-612)."""
        try:
            import wandb

            if wandb.run is None:
                return
            art = wandb.Artifact(name=f"checkpoint-{name}", type="model")
            art.add_dir(self._path(name))
            wandb.run.log_artifact(art)
        except Exception:
            pass

    def _prune(self) -> None:
        dirs = self._epoch_dirs()
        if len(dirs) <= self.cfg.keep_top_k:
            return
        reverse = self.cfg.monitored_mode == "max"
        dirs.sort(key=lambda t: t[2], reverse=reverse)
        for name, _, _ in dirs[self.cfg.keep_top_k :]:
            shutil.rmtree(self._path(name), ignore_errors=True)

    def kept_epochs(self) -> List[str]:
        self._join()
        return sorted(n for n, _, _ in self._epoch_dirs())

    def restore(
        self, target: Any, name: str = "last"
    ) -> Tuple[Any, Dict]:
        """Restore (state, meta) from <dir>/<name> into the target pytree
        structure (reference resume: main_coordinator_idun.py:268-283).

        Sharding-aware: jax.Array leaves in the target are replaced by
        abstract ShapeDtypeStructs carrying their shardings, so orbax
        reads each host's shards straight into their device placement —
        no full-array host materialization on large meshes (ROADMAP #9)."""
        path = self._path(name)
        self._join()

        def as_abstract(x):
            try:
                import jax

                if isinstance(x, jax.Array) and hasattr(x, "sharding"):
                    # Only pin COMMITTED arrays to their sharding.  Leaves
                    # the runtime placed by default (e.g. optimizer scalars
                    # from an un-jitted tx.init) must stay free to move, or
                    # the restored state mixes committed single-device
                    # scalars with mesh-committed params and the next
                    # jitted step rejects the device mismatch.
                    if getattr(x, "_committed", False):
                        return jax.ShapeDtypeStruct(
                            x.shape, x.dtype, sharding=x.sharding
                        )
                    return jax.ShapeDtypeStruct(x.shape, x.dtype)
            except Exception:
                pass
            return x

        import jax as _jax

        meta_template = {
            "epoch": np.zeros((), np.int64),
            "monitored_value": np.zeros((), np.float64),
            "best_value": np.zeros((), np.float64),
            # Loop/logging step counter (reference restores epoch AND step,
            # main_coordinator_idun.py:268-283).  Older checkpoints lack the
            # key; the fallback below retries without it.
            "global_step": np.zeros((), np.int64),
        }
        template = {
            "state": _jax.tree_util.tree_map(as_abstract, target),
            "meta": dict(meta_template),
        }
        try:
            restored = self._ckptr.restore(path, target=template)
        except Exception:
            template["meta"].pop("global_step")
            restored = self._ckptr.restore(path, target=template)
            restored["meta"]["global_step"] = np.zeros((), np.int64)
        return restored["state"], restored["meta"]

    def has(self, name: str) -> bool:
        self._join()
        return os.path.isdir(self._path(name))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pt training checkpoint into numpy arrays.

    Unwraps ``model_state_dict`` if present (reference inference.py:126-156)
    so converters in models/torch_convert.py can map names/shapes across.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {
        k: v.detach().cpu().numpy()
        for k, v in blob.items()
        if hasattr(v, "detach")
    }
