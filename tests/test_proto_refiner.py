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
