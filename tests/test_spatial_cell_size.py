"""r7: cell_size exposed on the spatial ops (r6 verdict ask #7).

For the radius ops the cell size is pure cost tuning — output must be
IDENTICAL at any cell size because the neighborhood reach widens to
ceil(radius/cell).  For kNN the cell size is semantic (candidate scope),
so only the default is oracle-pinned.
"""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r["a_id"], r["b_id"], r["cheb"]) for r in df.collect())


def test_spatial_grid_output_invariant_across_cell_sizes(spark):
    fn = registry()["join_spatial_grid"].fn
    base = _pairs(fn(spark, SF_DIR))  # default cell = radius = 8
    finer = _pairs(fn(spark, SF_DIR, cell_size=4))  # reach 2 → 5×5
    coarser = _pairs(fn(spark, SF_DIR, cell_size=16))  # reach 1 → 3×3
    assert base == finer == coarser
    assert len(base) > 0


def test_dbscan_labels_invariant_across_cell_sizes(spark):
    fn = registry()["spatial_dbscan_core"].fn
    lab = lambda df: sorted(
        (r["pid"], r["n_neighbors"], r["label"]) for r in df.collect()
    )
    assert lab(fn(spark, SF_DIR)) == lab(fn(spark, SF_DIR, cell_size=3))


def test_knn_default_cell_matches_contract_and_rejects_bad_size(spark):
    fn = registry()["spatial_knn_grid"].fn
    out = fn(spark, SF_DIR).collect()
    assert all(r["rn"] <= 3 for r in out)
    with pytest.raises(ValueError):
        fn(spark, SF_DIR, cell_size=0)
    with pytest.raises(ValueError):
        registry()["join_spatial_grid"].fn(spark, SF_DIR, cell_size=0)
