#!/usr/bin/env python
"""Two-process multi-host dry run (ROADMAP: multi-host input pipeline).

Spawns 2 real jax.distributed processes (CPU backend, 4 virtual devices
each = an 8-device global mesh) and verifies the multi-host plumbing the
single-host tests cannot: distributed init, disjoint host_shard_range
coverage, process_allgather of per-host embed shards (the reference's
``accelerator.gather`` role, preprocessing/embed.py:36-38), and a global
dp=8 all-reduce through a pjit'd step.

Usage: python tools/multihost_dryrun.py        # orchestrates both ranks
       (exit 0 = every check passed on both ranks)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("MULTIHOST_DRYRUN_PORT", "8476"))


def worker(rank: int) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=rank,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from geoguessr_ai_tpu.parallel.mesh import host_shard_range

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == 2 * n_local, (n_global, n_local)

    # 1) host shard ranges: disjoint cover of the dataset
    total = 103
    lo, hi = host_shard_range(total)
    ranges = multihost_utils.process_allgather(
        jnp.asarray([lo, hi], jnp.int32)
    )
    ranges = np.asarray(ranges).reshape(2, 2)
    assert ranges[0, 0] == 0 and ranges[1, 1] == total, ranges
    assert ranges[0, 1] == ranges[1, 0], ranges  # contiguous, disjoint

    # 2) per-host embed shards -> global gather (embed-builder role).
    # Collectives need equal shapes, so ragged host shards are padded to
    # the max shard size and carry their true count (the builder itself
    # recombines shards via STORAGE — per-host SQLite files — so ragged
    # shards only matter for collective-style gathers like this one).
    per = (total + 1) // 2
    local_emb = np.zeros((per, 8), np.float32)
    local_emb[: hi - lo] = rank + 1
    gathered = multihost_utils.process_allgather(local_emb, tiled=False)
    counts = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray([hi - lo], jnp.int32)
        )
    ).reshape(-1)
    assert gathered.shape[0] == 2, gathered.shape
    assert float(gathered[0][: counts[0]].mean()) == 1.0
    assert float(gathered[1][: counts[1]].mean()) == 2.0
    assert int(counts.sum()) == total

    # 3) global dp mesh step: pjit mean-grad all-reduce across hosts
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global, 1), ("data", "model"))
    spec = NamedSharding(mesh, P("data"))

    @jax.jit
    def step(x):
        return jnp.mean(x * x)

    host_batch = np.full((n_local, 4), float(rank + 1), np.float32)
    global_x = multihost_utils.host_local_array_to_global_array(
        host_batch, mesh, P("data")
    )
    out = step(global_x)
    # mean over both hosts' data: (n_local*1^2 + n_local*2^2)/(2*n_local)
    want = (1.0 + 4.0) / 2.0
    assert out.is_fully_replicated  # XLA all-reduced across hosts
    got = float(out)
    assert abs(got - want) < 1e-6, (got, want)

    print(f"[rank {rank}] all multi-host checks passed", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--rank":
        worker(int(sys.argv[2]))
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            env=env,
            cwd=REPO,
        )
        for r in (0, 1)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"multihost dryrun failed: exit codes {codes}")
    print("MULTIHOST DRYRUN OK (2 processes x 4 devices)")


if __name__ == "__main__":
    main()
