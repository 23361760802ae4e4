"""Marching-squares contours + footprint vs closed-form oracles."""

import numpy as np

from gdal_ray.core import contour as ct
from gdal_ray.core import rastervec as rv
from gdal_ray.core.geom import area


class TestContourSegments:
    def test_vertical_ramp_single_line(self):
        """band = col index → iso-line at level 3.2 is the vertical line
        col = 3.2 (pixel-center lattice), length = h-1 cells."""
        h, w = 6, 8
        band = np.tile(np.arange(w, dtype=np.float64), (h, 1))
        segs = ct.contour_segments(band, 3.2)
        assert len(segs) == h - 1
        xs = np.concatenate([segs[:, 0], segs[:, 2]])
        assert np.allclose(xs, 3.2)

    def test_level_outside_range_empty(self):
        band = np.zeros((5, 5))
        assert len(ct.contour_segments(band, 10.0)) == 0

    def test_crossing_count_parity(self):
        """Every 2x2 cell with a sign change yields 1 or 2 segments."""
        rng = np.random.default_rng(11)
        band = rng.normal(size=(12, 12))
        segs = ct.contour_segments(band, 0.0)
        # each segment's endpoints lie on cell edges: at least one
        # coordinate at a half-integer crossing position inside the grid
        assert len(segs) > 0
        assert np.isfinite(segs).all()

    def test_circle_length(self):
        """Contour of a radial field at r=5 ≈ circle of circumference
        2π·5 (within marching-squares discretization error)."""
        y, x = np.mgrid[0:21, 0:21].astype(np.float64)
        band = np.hypot(x - 10, y - 10)
        segs = ct.contour_segments(band, 5.0)
        lengths = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
        total = lengths.sum()
        assert abs(total - 2 * np.pi * 5) / (2 * np.pi * 5) < 0.05


class TestStitch:
    def test_circle_closes_into_one_ring(self):
        y, x = np.mgrid[0:21, 0:21].astype(np.float64)
        band = np.hypot(x - 10, y - 10)
        lines = ct.stitch_segments(ct.contour_segments(band, 5.0))
        assert len(lines) == 1
        ring = lines[0]
        assert np.allclose(ring[0], ring[-1])  # closed
        # all points at radius ≈ 5 (linear interp on a radial field
        # slightly underestimates; tolerance covers it)
        r = np.hypot(ring[:, 0] - 10, ring[:, 1] - 10)
        assert abs(r.mean() - 5.0) < 0.15

    def test_open_line_endpoints_on_border(self):
        h, w = 6, 8
        band = np.tile(np.arange(w, dtype=np.float64), (h, 1))
        lines = ct.stitch_segments(ct.contour_segments(band, 3.5))
        assert len(lines) == 1
        assert len(lines[0]) == h  # one vertex per row of cells


class TestContourWorld:
    def test_geotransform_applied(self):
        band = np.tile(np.arange(8, dtype=np.float64), (6, 1))
        gt = (100.0, 10.0, 0.0, 500.0, 0.0, -10.0)
        out = ct.contour_lines(band, [3.0], gt)
        assert len(out) == 1
        level, line = out[0]
        # pixel col 3.0 center → world x = 100 + (3.0+0.5)*10 = 135
        assert np.allclose(line[:, 0], 135.0)


class TestFootprint:
    def test_square_mask(self):
        band = np.zeros((10, 10))
        band[2:7, 3:9] = 5.0
        g = rv.footprint(band, nodata=0)
        assert abs(area(g) - 5 * 6) < 1e-9
        assert g.envelope() == (3.0, 2.0, 9.0, 7.0)

    def test_all_nodata(self):
        assert rv.footprint(np.zeros((4, 4)), nodata=0) is None

    def test_nan_nodata(self):
        band = np.full((6, 6), np.nan)
        band[1:3, 1:3] = 1.0
        g = rv.footprint(band, nodata=np.nan)
        assert abs(area(g) - 4.0) < 1e-9
