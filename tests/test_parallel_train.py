"""Mesh sharding + train/eval step tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
from geoguessr_ai_tpu.models import SuperGuessr, TinyViT, TinyViTConfig
from geoguessr_ai_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    put_variables,
)
from geoguessr_ai_tpu.train.state import (
    TrainState,
    cosine_warm_restarts,
    create_train_state,
)
from geoguessr_ai_tpu.train.steps import make_sharded_steps

NUM_CELLS = 32


def _setup(mesh_cfg, devices=None):
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
    model = SuperGuessr(
        num_cells=NUM_CELLS,
        backbone=TinyViT(cfg),
        panorama=True,
        embed_dim=cfg.embed_dim,
        dtype=jnp.float32,
    )
    x = jnp.zeros((2, 4, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x)
    mesh = create_mesh(mesh_cfg, devices=devices)
    variables = put_variables(variables, mesh, mesh_cfg)
    state = create_train_state(
        model, variables, OptimizerConfig(learning_rate=1e-3), 10
    )
    rng = np.random.default_rng(0)
    centroids = jnp.asarray(
        rng.uniform(-60, 60, (NUM_CELLS, 2)), dtype=jnp.float32
    )
    return cfg, model, mesh, state, centroids


def _batch(cfg, mesh, mesh_cfg, B=8):
    rng = np.random.default_rng(1)
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, 4, cfg.image_size, cfg.image_size, 3)),
            dtype=jnp.float32,
        ),
        "coords": jnp.asarray(
            rng.uniform(-60, 60, (B, 2)), dtype=jnp.float32
        ),
    }
    return jax.device_put(batch, batch_sharding(mesh, mesh_cfg))


def test_data_parallel_train_step_runs_and_improves():
    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    cfg, model, mesh, state, centroids = _setup(mesh_cfg)
    jit_train, jit_eval = make_sharded_steps(mesh, mesh_cfg)
    batch = _batch(cfg, mesh, mesh_cfg)
    losses = []
    for _ in range(4):
        state, metrics = jit_train(state, batch, centroids)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch -> loss must drop
    assert int(state.step) == 4
    ev = jit_eval(state, batch, centroids)
    for key in ("loss", "top1", "top5", "mean_km", "median_km", "score"):
        assert np.isfinite(float(ev[key])), key


def test_model_parallel_2x4_mesh():
    mesh_cfg = MeshConfig(data_parallel=4, model_parallel=2)
    cfg, model, mesh, state, centroids = _setup(mesh_cfg)
    # cell_layer kernel must actually be sharded over the model axis:
    # local shard of the column-sharded (D, num_cells) kernel holds
    # num_cells / model_parallel columns (a replicated array would keep
    # the full num_cells and fail here).
    k = state.params["cell_layer"]["kernel"]
    local = k.sharding.shard_shape(k.shape)
    assert local[-1] == NUM_CELLS // 2, (local, k.shape)
    assert local[0] == k.shape[0]
    jit_train, _ = make_sharded_steps(mesh, mesh_cfg)
    batch = _batch(cfg, mesh, mesh_cfg)
    state, metrics = jit_train(state, batch, centroids)
    assert np.isfinite(float(metrics["loss"]))
    # wandb.watch stand-in: global model-health norms ride the metrics
    assert float(metrics["grad_norm"]) > 0
    assert float(metrics["param_norm"]) > 0


def test_dp8_matches_single_device():
    """Same init + same batch: one dp=8 train step must match a single-
    device step numerically — the strongest cheap multi-chip correctness
    evidence available on the CPU mesh (gradients all-reduced by GSPMD
    must equal the unsharded full-batch gradient)."""
    cfg8 = MeshConfig(data_parallel=8, model_parallel=1)
    cfg, model, mesh8, state8, centroids = _setup(cfg8)
    jit8, _ = make_sharded_steps(mesh8, cfg8)
    batch8 = _batch(cfg, mesh8, cfg8)
    state8, m8 = jit8(state8, batch8, centroids)

    cfg1 = MeshConfig(data_parallel=1, model_parallel=1)
    _, _, mesh1, state1, _ = _setup(cfg1, devices=jax.devices()[:1])
    jit1, _ = make_sharded_steps(mesh1, cfg1)
    batch1 = _batch(cfg, mesh1, cfg1)
    state1, m1 = jit1(state1, batch1, centroids)

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
    )
    # Updated params agree leaf-by-leaf.  Tolerance note: Adam's first
    # step is ~lr*sign(g), so for a near-zero gradient element any
    # reduction-order noise between the all-reduced and single-device sum
    # can flip the sign and move the update by up to 2*lr (=2e-3 here);
    # everything else matches to float32 noise.
    flat8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    flat1 = jax.tree_util.tree_leaves(jax.device_get(state1.params))
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5e-3, rtol=1e-4
        )


def test_cosine_warm_restarts_schedule():
    sched = cosine_warm_restarts(1.0, steps_per_cycle=10, t_mult=2)
    # start of cycle = base lr; end of first cycle ~ 0; restart jumps back up
    assert float(sched(0)) == 1.0
    assert float(sched(9)) < 0.1
    assert float(sched(10)) > 0.9  # restarted
    assert float(sched(29)) < 0.1  # second cycle is 20 steps
    assert float(sched(30)) > 0.9


def test_dcn_aware_order():
    """Multi-slice device ordering: model-axis rows must stay inside one
    slice (per-matmul collectives on ICI, not DCN)."""
    from geoguessr_ai_tpu.parallel.mesh import dcn_aware_order

    class D:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

        def __repr__(self):
            return f"D{self.id}@{self.slice_index}"

    # interleaved arrival order across 2 slices of 4 devices each
    devs = [D(i, i % 2) for i in range(8)]
    ordered = dcn_aware_order(devs, model_parallel=2)
    rows = [ordered[i : i + 2] for i in range(0, 8, 2)]
    for row in rows:
        assert len({d.slice_index for d in row}) == 1, rows
    # mp that can't fit inside a slice raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="DCN"):
        dcn_aware_order([D(i, i % 3) for i in range(6)], model_parallel=4)
    # single slice passes through unchanged
    single = [D(i, 0) for i in range(4)]
    assert dcn_aware_order(single, 2) == single


def test_sharded_restore_preserves_shardings(tmp_path):
    """CheckpointStore.restore places restored leaves per the target's
    shardings (abstract-template restore, ROADMAP #9)."""
    from geoguessr_ai_tpu.train.checkpoints import (
        CheckpointConfig,
        CheckpointStore,
    )

    mesh_cfg = MeshConfig(data_parallel=4, model_parallel=2)
    cfg, model, mesh, state, centroids = _setup(mesh_cfg)
    store = CheckpointStore(
        CheckpointConfig(directory=str(tmp_path), keep_top_k=1)
    )
    store.save_epoch(jax.device_get(state), 0, 1.0, None)
    restored, meta = store.restore(state, "best")
    k0 = state.params["cell_layer"]["kernel"]
    k1 = restored.params["cell_layer"]["kernel"]
    assert k1.sharding.shard_shape(k1.shape) == k0.sharding.shard_shape(
        k0.shape
    )
    np.testing.assert_allclose(
        np.asarray(k1), np.asarray(k0), atol=1e-7
    )


def test_grad_accum_matches_single_step():
    """grad_accum_steps=4 with f32 accumulation reproduces the plain
    step's update exactly (no-BN model: microbatching is then pure
    gradient linearity); bf16 accumulation tracks it loosely."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step
    from geoguessr_ai_tpu.config import OptimizerConfig

    K, D, B = 13, 16, 8
    rng = np.random.default_rng(0)
    model = SuperGuessr(
        num_cells=K, backbone=None, panorama=True, embed_dim=D,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), embedding=jnp.zeros((1, 4, D))
    )
    centroids = jnp.asarray(
        np.stack(
            [rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], axis=-1
        ),
        jnp.float32,
    )
    batch = {
        "embedding": jnp.asarray(
            rng.normal(0, 1, (B, 4, D)), jnp.float32
        ),
        "coords": jnp.asarray(
            np.stack(
                [rng.uniform(-170, 170, B), rng.uniform(-60, 60, B)],
                axis=-1,
            ),
            jnp.float32,
        ),
    }

    def fresh():
        return create_train_state(
            model, variables, OptimizerConfig(), 10
        )

    s1, m1 = train_step(fresh(), batch, centroids)
    s4, m4 = train_step(
        fresh(), batch, centroids, grad_accum_steps=4,
        accum_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        float(m4["loss"]), float(m1["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s4.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )

    sb, mb = train_step(
        fresh(), batch, centroids, grad_accum_steps=4,
        accum_dtype=jnp.bfloat16,
    )
    assert np.isfinite(float(mb["loss"]))
    np.testing.assert_allclose(
        float(mb["grad_norm"]), float(m1["grad_norm"]), rtol=0.05
    )


def test_grad_accum_with_batch_stats_runs():
    """BN-carrying backbone path: scanned microbatches must thread
    batch_stats through the carry and produce a finite update."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import train_step
    from geoguessr_ai_tpu.config import OptimizerConfig

    tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
    K = 7
    model = SuperGuessr(
        num_cells=K, backbone=TinyViT(tv), panorama=True,
        embed_dim=tv.embed_dim, dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(0, 1, (4, 4, tv.image_size, tv.image_size, 3)),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x[:1])
    centroids = jnp.asarray(
        np.stack([rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], -1),
        jnp.float32,
    )
    state = create_train_state(model, variables, OptimizerConfig(), 10)
    batch = {
        "pixel_values": x,
        "coords": jnp.asarray(
            np.stack([rng.uniform(-170, 170, 4), rng.uniform(-60, 60, 4)], -1),
            jnp.float32,
        ),
    }
    old_stats = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state2, metrics = train_step(state, batch, centroids, grad_accum_steps=2)
    assert np.isfinite(float(metrics["loss"]))
    # BN stats actually updated through the scan carry
    new_stats = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(old_stats), np.asarray(new_stats))


def test_grad_accum_under_mesh_shardings():
    """Scanned microbatching composes with data-axis sharding: the
    (B, ...) -> (k, B/k, ...) reshape splits the sharded batch dim and
    GSPMD must still produce the same update as the unsharded step."""
    import jax
    import jax.numpy as jnp

    from geoguessr_ai_tpu.config import MeshConfig, OptimizerConfig
    from geoguessr_ai_tpu.models.super_guessr import SuperGuessr
    from geoguessr_ai_tpu.parallel.mesh import batch_sharding, create_mesh
    from geoguessr_ai_tpu.train.state import create_train_state
    from geoguessr_ai_tpu.train.steps import make_sharded_steps, train_step

    K, D, B = 11, 16, 16
    rng = np.random.default_rng(2)
    model = SuperGuessr(
        num_cells=K, backbone=None, panorama=True, embed_dim=D,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), embedding=jnp.zeros((1, 4, D))
    )
    centroids = jnp.asarray(
        np.stack([rng.uniform(-170, 170, K), rng.uniform(-60, 60, K)], -1),
        jnp.float32,
    )
    batch = {
        "embedding": jnp.asarray(rng.normal(0, 1, (B, 4, D)), jnp.float32),
        "coords": jnp.asarray(
            np.stack([rng.uniform(-170, 170, B), rng.uniform(-60, 60, B)], -1),
            jnp.float32,
        ),
    }
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    jit_train, _ = make_sharded_steps(mesh, grad_accum_steps=2)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))

    def fresh():
        # deep-copy: the jitted step DONATES its state, whose leaves
        # would otherwise alias `variables` across calls
        v = jax.tree.map(jnp.array, variables)
        return create_train_state(model, v, OptimizerConfig(), 10)

    s_sharded, m_sharded = jit_train(fresh(), sharded_batch, centroids)
    s_plain, m_plain = train_step(
        fresh(), batch, centroids, grad_accum_steps=2,
        accum_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_plain["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sharded.params),
        jax.tree_util.tree_leaves(s_plain.params),
    ):
        # cross-replica reduction order perturbs grads at f32 epsilon;
        # Adam's normalized update amplifies that to ~1e-5 on params
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )


def test_qat_storage_train_step_under_mesh_shardings():
    """dp-sharded train step with the QAT-storage backbone: calibrated
    act_scales ride TrainState.extra_variables through put_variables
    (replicated scalars) and the sharded step runs finite."""
    import dataclasses

    from geoguessr_ai_tpu.models.tinyvit import TRAIN_QUANT_SITES
    from geoguessr_ai_tpu.ops.quant import calibrate_act_stats

    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)

    def make(quant_mode, sites):
        return SuperGuessr(
            num_cells=NUM_CELLS,
            backbone=TinyViT(
                dataclasses.replace(
                    cfg, quant_mode=quant_mode, quant_sites=sites
                )
            ),
            panorama=True,
            embed_dim=cfg.embed_dim,
            dtype=jnp.float32,
        )

    model = make("static", TRAIN_QUANT_SITES)
    x = jnp.zeros((2, 4, cfg.image_size, cfg.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), pixel_values=x)
    cal = make("calibrate", TRAIN_QUANT_SITES)
    stats = calibrate_act_stats(
        lambda vv, xx: cal.apply(vv, pixel_values=xx, mutable=["act_stats"]),
        {k: v for k, v in variables.items() if k != "act_scales"},
        [jnp.asarray(
            np.random.default_rng(0).normal(
                size=(2, 4, cfg.image_size, cfg.image_size, 3)
            ),
            jnp.float32,
        )],
    )
    variables = {**variables, "act_scales": stats}
    mesh = create_mesh(mesh_cfg)
    variables = put_variables(variables, mesh, mesh_cfg)
    state = create_train_state(
        model, variables, OptimizerConfig(learning_rate=1e-3), 10
    )
    assert "act_scales" in state.extra_variables
    centroids = jnp.asarray(
        np.random.default_rng(0).uniform(-60, 60, (NUM_CELLS, 2)),
        jnp.float32,
    )
    jit_train, jit_eval = make_sharded_steps(mesh, mesh_cfg)
    batch = _batch(cfg, mesh, mesh_cfg)
    losses = []
    for _ in range(3):
        state, metrics = jit_train(state, batch, centroids)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    ev = jit_eval(state, batch, centroids)
    assert np.isfinite(float(ev["loss"]))
