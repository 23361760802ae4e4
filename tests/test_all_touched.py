"""ALL_TOUCHED rasterization (alg/gdalrasterize.cpp -at parity)."""

import numpy as np

from gdal_ray.core import wkb as W
from gdal_ray.core.rastervec import rasterize

GT = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)   # 10×10, unit cells, y down


def _cells(arr):
    ys, xs = np.nonzero(arr)
    return set(zip(xs.tolist(), ys.tolist()))


def test_sliver_touches_without_centers():
    g = W.box(2.2, 3.2, 2.4, 6.8)
    assert rasterize([(g, 1)], (10, 10), GT).sum() == 0
    at = rasterize([(g, 1)], (10, 10), GT, all_touched=True)
    assert int(at.sum()) == 4          # one column, rows 3.2..6.8


def test_gridline_aligned_box_burns_both_neighbors():
    g = W.box(2.0, 2.0, 4.0, 4.0)
    at = rasterize([(g, 1)], (10, 10), GT, all_touched=True)
    ys, xs = np.nonzero(at)
    assert sorted(set(xs)) == [1, 2, 3, 4]
    assert sorted(set(ys)) == [5, 6, 7, 8]


def test_interior_still_filled():
    g = W.box(1.5, 1.5, 4.5, 4.5)
    ct = rasterize([(g, 1)], (10, 10), GT)
    at = rasterize([(g, 1)], (10, 10), GT, all_touched=True)
    assert _cells(ct) <= _cells(at)
    assert int(at.sum()) == 16


def test_diagonal_supercover():
    # triangle with a long diagonal edge from (0.5, 9.5) to (4.5, 5.5)
    ring = np.array([[0.5, 9.5], [4.5, 5.5], [0.5, 5.5], [0.5, 9.5]])
    g = W.Geometry(geom_type=W.POLYGON, rings=[ring])
    at = rasterize([(g, 1)], (10, 10), GT, all_touched=True)
    # the diagonal passes through cells (0,0),(1,1),(2,2),(3,3) in
    # (col,row-from-top) terms plus the corner-touch neighbors
    cells = _cells(at)
    for k in range(4):
        assert (k, k) in cells


def test_clamps_at_grid_edges():
    g = W.box(-5.0, -5.0, 0.5, 0.5)
    at = rasterize([(g, 1)], (10, 10), GT, all_touched=True)
    assert int(at.sum()) == 1          # only cell (0, 9) is in-grid
