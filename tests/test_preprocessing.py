"""Preprocessing tests: cell/bbox labeling, heading encoding, aux labels."""

import numpy as np
import pandas as pd

from geoguessr_ai_tpu.data.preprocessing import (
    attach_aux_labels,
    attach_embeddings,
    encode_headings,
    label_points_by_bbox,
    label_points_by_cells,
)


def _square(x0, y0, s=10.0):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])


def test_label_points_by_cells_with_fallback():
    cells = [[_square(0, 0)], [_square(10, 0)]]
    pts = np.array([[5.0, 5.0], [15.0, 5.0], [100.0, 5.0]])
    labels = label_points_by_cells(pts, cells)
    np.testing.assert_array_equal(labels[:2], [0, 1])
    assert labels[2] == 1  # nearest-centroid fallback


def test_label_points_by_bbox():
    bboxes = np.array([[0, 0, 10, 10], [10, 0, 20, 10]], np.float64)
    pts = np.array([[5, 5], [15, 5], [50, 50]], np.float64)
    labels = label_points_by_bbox(pts, bboxes)
    np.testing.assert_array_equal(labels, [0, 1, -1])


def test_encode_headings():
    enc = encode_headings(np.array([[0.0, 90.0, 180.0, 270.0]]))
    assert enc.shape == (1, 4, 2)
    np.testing.assert_allclose(enc[0, 0], [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(enc[0, 1], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(enc[0, 2], [0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(enc[0, 3], [-1.0, 0.0], atol=1e-6)


def test_attach_aux_and_embeddings():
    df = pd.DataFrame(
        {
            "location_id": ["a", "b"],
            "lat": [1.0, 2.0],
            "lon": [3.0, 4.0],
        }
    )
    out = attach_aux_labels(
        df, {"elevation": lambda xy: xy[:, 0] * 100}
    )
    np.testing.assert_allclose(out["elevation"], [300.0, 400.0])
    out2 = attach_embeddings(out, {"a": np.ones(4)})
    assert out2["embedding"].iloc[0].shape == (4,)
    assert out2["embedding"].iloc[1] is None
