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
