"""Vectorized ProtoRefiner tests."""

import numpy as np
import pandas as pd

from geoguessr_ai_tpu.models.proto_refiner import (
    ProtoRefiner,
    PrototypeBank,
    build_prototype_bank,
    refine,
)

D = 8


def _bank():
    """3 cells: cell 0 protos near e0, cell 1 near e1, cell 2 empty."""
    emb = np.zeros((3, 2, D), np.float32)
    coords = np.zeros((3, 2, 2), np.float32)
    mask = np.zeros((3, 2), np.float32)
    emb[0, 0, 0] = 1.0
    coords[0, 0] = (10.0, 60.0)
    mask[0, 0] = 1.0
    emb[1, 0, 1] = 1.0
    coords[1, 0] = (11.0, 61.0)
    mask[1, 0] = 1.0
    return PrototypeBank(embeddings=emb, coords=coords, mask=mask)


def test_refiner_moves_to_matching_prototype():
    bank = _bank()
    r = ProtoRefiner(bank, topk=2)
    # query matches cell 1's prototype; geocell probs slightly prefer cell 0
    q = np.zeros((1, D), np.float32)
    q[0, 1] = 1.0
    ids = np.array([[0, 1]], np.int32)
    probs = np.array([[0.5, 0.45]], np.float32)
    init = np.array([[10.0, 60.0]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    assert cells[0] == 1
    assert changed[0]
    np.testing.assert_allclose(coords[0], [11.0, 61.0], atol=1e-5)


def test_refiner_respects_max_refinement():
    bank = _bank()
    bank.coords[1, 0] = (150.0, -30.0)  # 15000+ km away
    r = ProtoRefiner(bank, topk=2, max_refinement=1000.0)
    q = np.zeros((1, D), np.float32)
    q[0, 1] = 1.0
    ids = np.array([[0, 1]], np.int32)
    probs = np.array([[0.5, 0.45]], np.float32)
    init = np.array([[10.0, 60.0]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    # refinement cancelled: keep the initial prediction
    assert cells[0] == 0
    assert not changed[0]
    np.testing.assert_allclose(coords[0], init[0], atol=1e-5)


def test_refiner_empty_cell_fallback():
    bank = _bank()
    r = ProtoRefiner(bank, topk=2)
    q = np.zeros((2, D), np.float32)
    q[:, 0] = 1.0
    ids = np.array([[2, 0], [2, 2]], np.int32)  # cell 2 has no protos
    probs = np.array([[0.6, 0.4], [0.9, 0.1]], np.float32)
    init = np.array([[10.0, 60.0], [20.0, 50.0]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    # sample 0: cell 0 has a matching proto -> switches to it
    assert cells[0] == 0
    # sample 1: no candidate has protos -> stays at initial coords
    np.testing.assert_allclose(coords[1], init[1], atol=1e-5)


def test_build_bank_from_proto_df():
    proto_df = pd.DataFrame(
        [
            {
                "geocell_index": 0,
                "cluster_id": 0,
                "count": 2,
                "indices": [5, 6],
                "centroid_lat": 60.0,
                "centroid_lng": 10.0,
            },
            {
                "geocell_index": 1,
                "cluster_id": 0,
                "count": 0,
                "indices": [],
                "centroid_lat": -30.0,
                "centroid_lng": 150.0,
            },
        ]
    )
    embs = {5: np.ones(D, np.float32), 6: 3 * np.ones(D, np.float32)}
    coords = {5: (10.0, 60.0), 6: (10.2, 60.2)}
    bank = build_prototype_bank(proto_df, embs, coords, 2, D, max_protos=2)
    np.testing.assert_allclose(bank.embeddings[0, 0], 2 * np.ones(D))
    np.testing.assert_allclose(bank.coords[0, 0], [10.1, 60.1], atol=1e-5)
    assert bank.mask[0, 0] == 1.0
    # empty cluster: no embedding -> masked out, centroid coords kept
    assert bank.mask[1, 0] == 0.0
    np.testing.assert_allclose(bank.coords[1, 0], [150.0, -30.0])


def test_bank_save_load_roundtrip(tmp_path):
    bank = _bank()
    p = str(tmp_path / "bank.npz")
    bank.save(p)
    loaded = PrototypeBank.load(p)
    np.testing.assert_array_equal(loaded.embeddings, bank.embeddings)
    np.testing.assert_array_equal(loaded.mask, bank.mask)


def _member_bank():
    """Members for cell 1 proto 0: two images at distinct coords."""
    emb = np.zeros((3, 2, 4, D), np.float16)
    coords = np.zeros((3, 2, 4, 2), np.float32)
    mask = np.zeros((3, 2, 4), np.float32)
    # member 0 ~ e1 (matches query), member 1 ~ e2
    emb[1, 0, 0, 1] = 1.0
    coords[1, 0, 0] = (11.5, 61.5)
    mask[1, 0, 0] = 1.0
    emb[1, 0, 1, 2] = 1.0
    coords[1, 0, 1] = (12.5, 62.5)
    mask[1, 0, 1] = 1.0
    from geoguessr_ai_tpu.models.proto_refiner import MemberBank

    return MemberBank(embeddings=emb, coords=coords, mask=mask)


def test_member_stage_picks_closest_member():
    bank = _bank()
    r = ProtoRefiner(bank, topk=2, member_bank=_member_bank())
    q = np.zeros((1, D), np.float32)
    q[0, 1] = 1.0  # closest to member 0 of cell 1's cluster
    ids = np.array([[0, 1]], np.int32)
    probs = np.array([[0.4, 0.6]], np.float32)
    init = np.array([[11.0, 61.0]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    assert cells[0] == 1
    # refined guess is member 0's coords, not the cluster centroid
    np.testing.assert_allclose(coords[0], [11.5, 61.5], atol=1e-5)


def test_member_stage_falls_back_to_centroid_when_no_members():
    bank = _bank()
    mb = _member_bank()
    mb.mask[:] = 0.0  # no stored members anywhere
    r = ProtoRefiner(bank, topk=2, member_bank=mb)
    q = np.zeros((1, D), np.float32)
    q[0, 1] = 1.0
    ids = np.array([[0, 1]], np.int32)
    probs = np.array([[0.4, 0.6]], np.float32)
    init = np.array([[11.0, 61.0]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    assert cells[0] == 1
    np.testing.assert_allclose(coords[0], [11.0, 61.0], atol=1e-5)


def test_member_bank_save_load_roundtrip_with_projection(tmp_path):
    from geoguessr_ai_tpu.models.proto_refiner import (
        MemberBank,
        make_projection,
    )

    proj = make_projection(D, 4, seed=1)
    assert proj.shape == (D, 4)
    # orthonormal columns
    np.testing.assert_allclose(proj.T @ proj, np.eye(4), atol=1e-5)
    mb = _member_bank()
    mb = MemberBank(
        embeddings=mb.embeddings[..., :4],
        coords=mb.coords,
        mask=mb.mask,
        projection=proj,
    )
    p = str(tmp_path / "members.npz")
    mb.save(p)
    loaded = MemberBank.load(p)
    np.testing.assert_array_equal(loaded.embeddings, mb.embeddings)
    np.testing.assert_allclose(loaded.projection, proj)
    assert loaded.max_members == 4


def test_refinement_lift_on_synthetic_queries():
    """ROADMAP #7 validation: on a synthetic world where the classifier's
    top-1 is often wrong but the true cell is in the top-k, prototype
    refinement must recover accuracy and cut the distance error."""
    import jax.numpy as jnp

    from geoguessr_ai_tpu.geo import haversine
    from geoguessr_ai_tpu.models.proto_refiner import refine

    rng = np.random.default_rng(0)
    K, P, D, B, topk = 16, 4, 32, 96, 5
    # well-separated cells, tight prototype clusters
    cell_lng = rng.uniform(-150, 150, K)
    cell_lat = rng.uniform(-55, 55, K)
    protos = rng.normal(0, 1, (K, P, D)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    bank_coords = np.stack(
        [
            np.repeat(cell_lng[:, None], P, 1) + rng.normal(0, 0.02, (K, P)),
            np.repeat(cell_lat[:, None], P, 1) + rng.normal(0, 0.02, (K, P)),
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.ones((K, P), np.float32)

    true_cell = rng.integers(0, K, B)
    query = protos[true_cell, rng.integers(0, P, B)] + rng.normal(
        0, 0.05, (B, D)
    ).astype(np.float32)

    # classifier: true cell in top-k but top-1 is a DIFFERENT cell for
    # half the batch
    topk_ids = np.zeros((B, topk), np.int32)
    topk_probs = np.zeros((B, topk), np.float32)
    for b in range(B):
        others = rng.permutation([c for c in range(K) if c != true_cell[b]])
        wrong_first = b % 2 == 0
        ids = (
            [others[0], true_cell[b], *others[1 : topk - 1]]
            if wrong_first
            else [true_cell[b], *others[: topk - 1]]
        )
        topk_ids[b] = ids
        topk_probs[b] = np.array([0.4, 0.3, 0.15, 0.1, 0.05], np.float32)
    initial_lnglat = np.stack(
        [cell_lng[topk_ids[:, 0]], cell_lat[topk_ids[:, 0]]], -1
    ).astype(np.float32)
    true_lnglat = np.stack(
        [cell_lng[true_cell], cell_lat[true_cell]], -1
    ).astype(np.float32)

    refined, cell, changed = refine(
        jnp.asarray(protos),
        jnp.asarray(bank_coords),
        jnp.asarray(mask),
        jnp.asarray(query),
        jnp.asarray(topk_ids),
        jnp.asarray(topk_probs),
        jnp.asarray(initial_lnglat),
        temperature=0.3,
        max_refinement_km=25000.0,
    )
    d_initial = np.asarray(haversine(jnp.asarray(true_lnglat), jnp.asarray(initial_lnglat)))
    d_refined = np.asarray(haversine(jnp.asarray(true_lnglat), jnp.asarray(refined)))
    acc_initial = float(np.mean(topk_ids[:, 0] == true_cell))
    acc_refined = float(np.mean(np.asarray(cell) == true_cell))
    assert acc_initial <= 0.55  # the setup really is hard
    assert acc_refined > 0.9, (acc_initial, acc_refined)
    assert np.median(d_refined) < 0.2 * max(np.median(d_initial), 1.0), (
        np.median(d_initial),
        np.median(d_refined),
    )
