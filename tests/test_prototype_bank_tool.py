"""Prototype-bank tool: coordinate-join correctness with a stub manager."""

import numpy as np
import pandas as pd

from geoguessr_ai_tpu.geocells.manager import PointInfo


class _StubManager:
    """Two cells; cell 0 has clusters 0/1, cell 1 has cluster 0."""

    num_cells = 2

    def __init__(self):
        self.point_info = {
            # (lat, lng) -> PointInfo
            (10.0, 20.0): PointInfo("X", "A", "c0", 0, 10.0, 20.0, 0),
            (10.1, 20.1): PointInfo("X", "A", "c0", 0, 10.1, 20.1, 0),
            (11.0, 21.0): PointInfo("X", "A", "c0", 1, 11.0, 21.0, 0),
            (-5.0, 30.0): PointInfo("X", "B", "c1", 0, -5.0, 30.0, 1),
        }


def test_bank_joins_by_coordinates_and_fuses_headings():
    from tools.build_prototype_bank import build_bank_from_manager

    D = 8
    rows = []
    # location (10.0, 20.0): two headings with embeddings 1 and 3 -> fused 2
    for h, scale in ((0, 1.0), (90, 3.0)):
        rows.append(
            {
                "lat": 10.0,
                "lon": 20.0,
                "heading": h,
                "embedding": np.full(D, scale, np.float32),
            }
        )
    rows.append(
        {"lat": 10.1, "lon": 20.1, "heading": 0,
         "embedding": np.full(D, 4.0, np.float32)}
    )
    rows.append(
        {"lat": 11.0, "lon": 21.0, "heading": 0,
         "embedding": np.full(D, 10.0, np.float32)}
    )
    rows.append(
        {"lat": -5.0, "lon": 30.0, "heading": 0,
         "embedding": np.full(D, -1.0, np.float32)}
    )
    emb_df = pd.DataFrame(rows)

    bank = build_bank_from_manager(_StubManager(), emb_df, max_protos=2)
    assert bank.num_cells == 2
    # cell 0, biggest cluster (cluster 0: locations fused 2.0 and 4.0 -> 3.0)
    np.testing.assert_allclose(bank.embeddings[0, 0], np.full(D, 3.0))
    np.testing.assert_allclose(bank.coords[0, 0], [20.05, 10.05], atol=1e-6)
    # cell 0, second cluster (cluster 1: 10.0)
    np.testing.assert_allclose(bank.embeddings[0, 1], np.full(D, 10.0))
    # cell 1
    np.testing.assert_allclose(bank.embeddings[1, 0], np.full(D, -1.0))
    np.testing.assert_allclose(bank.mask, [[1, 1], [1, 0]])


def test_member_bank_aligns_slots_and_projects():
    from tools.build_prototype_bank import (
        build_bank_from_manager,
        build_member_bank_from_manager,
    )

    D = 8
    rows = [
        {"lat": 10.0, "lon": 20.0, "heading": 0,
         "embedding": np.full(D, 2.0, np.float32)},
        {"lat": 10.1, "lon": 20.1, "heading": 0,
         "embedding": np.full(D, 4.0, np.float32)},
        {"lat": 11.0, "lon": 21.0, "heading": 0,
         "embedding": np.full(D, 10.0, np.float32)},
        {"lat": -5.0, "lon": 30.0, "heading": 0,
         "embedding": np.full(D, -1.0, np.float32)},
    ]
    emb_df = pd.DataFrame(rows)
    mgr = _StubManager()
    bank = build_bank_from_manager(mgr, emb_df, max_protos=2)
    mbank = build_member_bank_from_manager(
        mgr, emb_df, max_protos=2, max_members=2, reduce_dim=4
    )
    # shapes: same (cells, protos) layout as the prototype bank
    assert mbank.embeddings.shape[:2] == bank.embeddings.shape[:2]
    assert mbank.embeddings.shape[2:] == (2, 4)
    assert mbank.projection.shape == (D, 4)
    # slot (0, 0) = cell 0's biggest cluster: both members stored
    np.testing.assert_allclose(mbank.mask[0, 0], [1, 1])
    got = {tuple(np.round(c, 4)) for c in mbank.coords[0, 0].astype(float)}
    assert got == {(20.0, 10.0), (20.1, 10.1)}
    # member embeddings are the projected originals
    proj = mbank.projection
    want = {
        tuple(np.round(np.full(D, s, np.float32) @ proj, 2))
        for s in (2.0, 4.0)
    }
    have = {
        tuple(np.round(mbank.embeddings[0, 0, m].astype(np.float32), 2))
        for m in range(2)
    }
    assert want == have
    # cell 1 cluster has one member; second slot masked
    np.testing.assert_allclose(mbank.mask[1, 0], [1, 0])
    # refiner integration: query near cluster-0 member 2.0 refines to its coords
    from geoguessr_ai_tpu.models.proto_refiner import ProtoRefiner

    r = ProtoRefiner(bank, topk=2, member_bank=mbank)
    q = np.full((1, D), 2.0, np.float32)
    ids = np.array([[0, 1]], np.int32)
    probs = np.array([[0.9, 0.1]], np.float32)
    init = np.array([[20.05, 10.05]], np.float32)
    coords, cells, changed = r(q, ids, probs, init)
    assert cells[0] == 0
    np.testing.assert_allclose(coords[0], [20.0, 10.0], atol=1e-2)
