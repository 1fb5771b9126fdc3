"""Device mesh + sharding rules.

The TPU-native communication layer (SURVEY.md §2.6): a single
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding — the equivalent
of the reference's Accelerate-DDP all-reduce, train_eval_loop.py:184-202)
and an optional ``model`` axis (tensor sharding of the ~12.6k-way cell layer
and ViT MLP/attention projections — new headroom the reference lacks).

Design follows the scaling-book recipe: pick a mesh, annotate param/batch
shardings, and let GSPMD insert the collectives (all-reduce over ICI for
gradients, all-gather/reduce-scatter around model-sharded matmuls).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoguessr_ai_tpu.config import MeshConfig


def maybe_initialize_distributed() -> int:
    """Initialize jax.distributed on multi-host TPU slices (reference
    equivalent: Accelerate's process-group setup, SURVEY.md §5.8).

    No-ops on single-host; returns the process count.  TPU pods populate
    the coordinator address from metadata, so no arguments are needed.
    """
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host / already initialized
    return jax.process_count()


def host_shard_range(total: int) -> tuple:
    """[start, stop) rows this host owns of a length-`total` dataset —
    per-host input sharding replacing torch DataLoader worker sharding
    (backend/data.py:97-111)."""
    n = jax.process_count()
    i = jax.process_index()
    per = (total + n - 1) // n
    return min(i * per, total), min((i + 1) * per, total)


def create_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    data_parallel == -1 uses all devices not consumed by the model axis.

    Multi-slice topologies (devices spanning >1 slice over DCN): the
    device matrix is laid out so the MODEL axis always stays inside a
    slice (its all-gather/reduce-scatter around every sharded matmul must
    ride ICI) while the data axis's once-per-step gradient all-reduce
    spans slices — the standard scaling-book axis placement.  Detection
    uses ``device.slice_index`` when the runtime exposes it.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} does not cover {n} devices"
        )
    arr = np.asarray(dcn_aware_order(devices, mp)).reshape(dp, mp)
    return Mesh(arr, axis_names=(cfg.data_axis, cfg.model_axis))


def dcn_aware_order(devices: Sequence, model_parallel: int) -> list:
    """Order devices so reshape(dp, mp) keeps every model-axis row inside
    one slice (per-matmul collectives on ICI; only the data axis's
    per-step gradient all-reduce crosses DCN).  Single-slice topologies
    pass through unchanged; raises if the model axis cannot avoid DCN."""
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) <= 1 or model_parallel <= 1:
        return list(devices)
    per_slice: dict = {}
    for d in devices:
        per_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    sizes = {len(v) for v in per_slice.values()}
    if len(sizes) == 1 and next(iter(sizes)) % model_parallel == 0:
        return [d for sid in sorted(per_slice) for d in per_slice[sid]]
    raise ValueError(
        f"model_parallel={model_parallel} does not divide the per-slice "
        f"device counts {sorted(sizes)} — a model axis crossing DCN would "
        "put per-matmul collectives on the slow interconnect"
    )


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


# Dense-layer names whose kernels are column-sharded on the model axis.
# GSPMD propagates the matching input/output shardings and inserts the
# collectives; annotating only the big matmul weights is sufficient.
_COL_SHARDED_KERNELS = (
    "cell_layer",  # (D, ~12.6k) classifier — the largest single matmul
    "qkv",
    "fc1",
    "mlp_fc1",
)
_ROW_SHARDED_KERNELS = (
    "proj",
    "fc2",
    "mlp_fc2",
)


def param_spec(path: tuple, leaf, cfg: MeshConfig = MeshConfig()) -> P:
    """PartitionSpec for one parameter, keyed by its flax path.

    Column-parallel for expanding matmuls (qkv/fc1/cell_layer), row-parallel
    for contracting ones (proj/fc2) — the standard Megatron-style pairing,
    expressed purely as weight annotations for GSPMD.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    if leaf.ndim >= 2:
        owner = names[-2] if len(names) >= 2 else ""
        if names[-1] == "kernel":
            if any(owner == k or owner.endswith(k) for k in _COL_SHARDED_KERNELS):
                return P(*([None] * (leaf.ndim - 1) + [cfg.model_axis]))
            if any(owner == k or owner.endswith(k) for k in _ROW_SHARDED_KERNELS):
                return P(*([cfg.model_axis] + [None] * (leaf.ndim - 1)))
    return P()


def shard_variables(variables, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Apply param_spec to a flax variables pytree -> NamedSharding pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, cfg)),
        variables,
    )


def put_variables(variables, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Device-put a variables pytree with its mesh shardings."""
    shardings = shard_variables(variables, mesh, cfg)
    return jax.device_put(variables, shardings)
