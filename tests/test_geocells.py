"""Tests for the geocell manager + centroid table contract."""

import os

import numpy as np
import pandas as pd
import pytest

from geoguessr_ai_tpu import config
from geoguessr_ai_tpu.geocells.manager import CentroidTable, GeocellManager

REFERENCE_PICKLES = "/root/reference/data/geocells/finished_geocells"


def test_centroid_table_artifact_exists_and_is_sane():
    tab = CentroidTable.load(config.CENTROID_TABLE_PATH)
    assert tab.num_cells > 12000
    lng, lat = tab.centroids[:, 0], tab.centroids[:, 1]
    assert (-180 <= lng).all() and (lng <= 180).all()
    assert (-90 <= lat).all() and (lat <= 90).all()
    assert tab.country.shape == (tab.num_cells,)
    assert tab.admin1.shape == (tab.num_cells,)
    assert tab.cell_id.shape == (tab.num_cells,)
    # The reference data shares centroids between a split cell and its
    # parent (both geom_centroid and point_centroid: 6823 unique of 12647),
    # so only require a majority of distinct rows — parity with the
    # reference's own proto_df, not a bug in the exporter.
    uniq = np.unique(tab.centroids, axis=0)
    assert len(uniq) > 0.5 * tab.num_cells


def test_from_proto_df_matches_npz():
    df = pd.read_csv(os.path.join(config.GEOCELL_DIR, "proto_df.csv"))
    tab_csv = CentroidTable.from_proto_df(df)
    tab_npz = CentroidTable.load(config.CENTROID_TABLE_PATH)
    assert tab_csv.num_cells == tab_npz.num_cells
    np.testing.assert_allclose(
        tab_csv.centroids, tab_npz.centroids, rtol=1e-6
    )


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PICKLES), reason="reference mount absent"
)
def test_manager_loads_reference_pickles_and_indexes_points():
    mgr = GeocellManager(REFERENCE_PICKLES)
    assert mgr.num_cells > 12000
    assert len(mgr.point_info) > 100_000
    # every indexed point resolves back to its own cell
    (lat, lng), rec = next(iter(mgr.point_info.items()))
    geocell, country, admin1 = mgr.get_geocell_id(
        {"latitude": lat, "longitude": lng}
    )
    assert geocell == rec.geocell
    assert country == rec.country
    # unknown point -> (None, None, None), reference behavior
    assert mgr.get_geocell_id({"latitude": 0.123, "longitude": 0.456}) == (
        None,
        None,
        None,
    )
    # proto_df indices are dense 0..num_cells-1
    df = mgr.generate_proto_df()
    assert df.geocell_index.max() == mgr.num_cells - 1
    assert df.geocell_index.min() == 0
    assert set(df.geocell_index.unique()) == set(range(mgr.num_cells))
