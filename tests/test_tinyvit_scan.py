"""scan_stages: the lax.scan-over-blocks program (config.scan_stages)
must compute exactly what the unrolled loop computes.

The scanned stack holds each listed stage's block params/batch_stats
stacked along axis 0 (stage{N}_scan/block/...); stacking the unrolled
per-block trees must reproduce the unrolled forward to float-fusion
tolerance (same math/order; scan compiles the body once, so XLA's
fusion rounding differs in the last ulp), in eval AND train mode (BN running-stat updates
carried through the scan).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.models.tinyvit import TinyViT, TinyViTConfig

SCAN_STAGE = 2  # test_tiny depths (1, 1, 2, 1): the only depth>1 stage


def _stack_stage(tree, depth: int, stage: int):
    """Map unrolled {stage2_block0, stage2_block1, ...} entries of a
    variable collection into the scanned {stage2_scan: {block: ...}}
    layout (leaves stacked along axis 0)."""
    out = {k: v for k, v in tree.items()
           if not k.startswith(f"stage{stage}_block")}
    blocks = [tree[f"stage{stage}_block{d}"] for d in range(depth)]
    out[f"stage{stage}_scan"] = {
        "block": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    }
    return out


def _unstack_stage(tree, depth: int, stage: int):
    out = {k: v for k, v in tree.items() if k != f"stage{stage}_scan"}
    stacked = tree[f"stage{stage}_scan"]["block"]
    for d in range(depth):
        out[f"stage{stage}_block{d}"] = jax.tree.map(
            lambda x, dd=d: x[dd], stacked
        )
    return out


def test_scan_stage_matches_unrolled():
    cfg_u = TinyViTConfig.test_tiny(dtype=jnp.float32)
    cfg_s = dataclasses.replace(cfg_u, scan_stages=(SCAN_STAGE,))
    depth = cfg_u.depths[SCAN_STAGE]
    assert depth > 1

    model_u, model_s = TinyViT(cfg_u), TinyViT(cfg_s)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (2, cfg_u.image_size, cfg_u.image_size, 3)
        ),
        jnp.float32,
    )
    v_u = model_u.init(jax.random.PRNGKey(0), x)
    v_s = {
        col: _stack_stage(tree, depth, SCAN_STAGE)
        for col, tree in v_u.items()
    }

    # scanned init builds the same tree structure (shapes stacked)
    v_s_init = model_s.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        v_s_init
    ) == jax.tree_util.tree_structure(v_s)

    # eval mode: bit-exact
    out_u = model_u.apply(v_u, x)
    out_s = model_s.apply(v_s, x)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=2e-5, atol=2e-5
    )

    # train mode: output and the mutated BN running stats agree
    out_u_t, mut_u = model_u.apply(
        v_u, x, train=True, mutable=["batch_stats"]
    )
    out_s_t, mut_s = model_s.apply(
        v_s, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_u_t), np.asarray(out_s_t), rtol=2e-5, atol=2e-5
    )
    stats_s_unstacked = _unstack_stage(
        mut_s["batch_stats"], depth, SCAN_STAGE
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        ),
        mut_u["batch_stats"],
        stats_s_unstacked,
    )


def test_scan_remat_grads_match_unrolled():
    """scan_remat (jax.checkpoint inside the scan body) must not change
    numerics: grads of a scalar loss match the unrolled program's grads
    (mapped through the stacked layout), with and without scan_remat."""
    cfg_u = TinyViTConfig.test_tiny(dtype=jnp.float32)
    depth = cfg_u.depths[SCAN_STAGE]

    model_u = TinyViT(cfg_u)
    x = jnp.asarray(
        np.random.default_rng(1).normal(
            0, 1, (2, cfg_u.image_size, cfg_u.image_size, 3)
        ),
        jnp.float32,
    )
    v_u = model_u.init(jax.random.PRNGKey(0), x)

    def loss_u(params):
        out = model_u.apply({**v_u, "params": params}, x)
        return jnp.sum(out**2)

    g_u = jax.grad(loss_u)(v_u["params"])
    g_u_stacked = _stack_stage(g_u, depth, SCAN_STAGE)

    for scan_remat in (False, True):
        cfg_s = dataclasses.replace(
            cfg_u, scan_stages=(SCAN_STAGE,), scan_remat=scan_remat
        )
        model_s = TinyViT(cfg_s)
        v_s = {
            col: _stack_stage(tree, depth, SCAN_STAGE)
            for col, tree in v_u.items()
        }

        def loss_s(params):
            out = model_s.apply({**v_s, "params": params}, x)
            return jnp.sum(out**2)

        g_s = jax.grad(loss_s)(v_s["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            g_u_stacked,
            g_s,
        )
