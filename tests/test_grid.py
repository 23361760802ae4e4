"""Distributed gdal_grid (stages/grid.py) — parity between the
broadcast and halo-partitioned paths, and against the single-task
reference kernel (core/rastervec.grid_idw)."""

import numpy as np
import pytest

from gdal_ray.core import geotransform as gtr


def _pts(n=60, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    v = rng.uniform(-1, 1, n)
    return np.column_stack([x, y, v])


_GT = gtr.from_bounds(0, 0, 1000, 1000, 48, 48)


class TestGridBroadcast:
    def test_matches_single_task_idw(self, ray_session):
        from gdal_ray.core.rastervec import grid_idw
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        pts = _pts()
        ref = grid_idw(pts[:, :2], pts[:, 2], (48, 48), _GT)
        tiles = grid_broadcast(pts, _GT, (48, 48), method="invdist",
                               tile=16).to_pandas()
        got = assemble_grid(tiles, (48, 48))
        assert np.allclose(got, ref, equal_nan=True)

    def test_nearest(self, ray_session):
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        pts = _pts()
        tiles = grid_broadcast(pts, _GT, (48, 48), method="nearest",
                               tile=24).to_pandas()
        got = assemble_grid(tiles, (48, 48))
        # brute-force nearest
        cols = np.arange(48) + 0.5
        cc, rr = np.meshgrid(cols, cols)
        gx, gy = gtr.apply(_GT, cc, rr)
        d2 = ((gx[..., None] - pts[None, None, :, 0]) ** 2
              + (gy[..., None] - pts[None, None, :, 1]) ** 2)
        ref = pts[d2.argmin(axis=2), 2]
        assert np.allclose(got, ref)

    def test_average_and_count_radius(self, ray_session):
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        pts = _pts()
        R = 150.0
        avg = assemble_grid(grid_broadcast(pts, _GT, (48, 48),
                                           method="average", radius=R,
                                           tile=24).to_pandas(), (48, 48))
        cnt = assemble_grid(grid_broadcast(pts, _GT, (48, 48),
                                           method="count", radius=R,
                                           tile=24).to_pandas(), (48, 48))
        assert np.isnan(avg).sum() == (cnt == 0).sum()
        assert cnt.max() >= 1

    def test_bad_method(self, ray_session):
        from gdal_ray.stages.grid import grid_broadcast
        with pytest.raises(Exception):
            grid_broadcast(_pts(), _GT, (8, 8), method="bogus").to_pandas()


class TestGridPartitioned:
    def test_matches_broadcast_for_radius(self, ray_session):
        """Halo partitioning loses nothing: identical to broadcast for
        any method whose reach is ≤ the halo radius."""
        import ray.data as rd
        import pandas as pd
        from gdal_ray.stages.grid import (assemble_grid, grid_broadcast,
                                          grid_partitioned)
        pts = _pts(80, seed=11)
        R = 120.0
        pdf = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1],
                            "value": pts[:, 2]})
        for method in ("invdist", "nearest", "average"):
            bc = assemble_grid(grid_broadcast(
                pts, _GT, (48, 48), method=method, radius=R,
                tile=16).to_pandas(), (48, 48))
            pt = assemble_grid(grid_partitioned(
                rd.from_pandas(pdf), _GT, (48, 48), method=method,
                radius=R, tile=16).to_pandas(), (48, 48))
            assert np.allclose(bc, pt, equal_nan=True), method


class TestDataMetrics:
    def test_min_max_range(self, ray_session):
        import numpy as np
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        pts = _pts(50, seed=3)
        R = 200.0
        mn = assemble_grid(grid_broadcast(pts, _GT, (24, 24),
                                          method="minimum", radius=R,
                                          tile=12).to_pandas(), (24, 24))
        mx = assemble_grid(grid_broadcast(pts, _GT, (24, 24),
                                          method="maximum", radius=R,
                                          tile=12).to_pandas(), (24, 24))
        rg = assemble_grid(grid_broadcast(pts, _GT, (24, 24),
                                          method="range", radius=R,
                                          tile=12).to_pandas(), (24, 24))
        ok = ~np.isnan(mn)
        assert ok.any()
        assert np.allclose(rg[ok], (mx - mn)[ok])
        assert (mx[ok] >= mn[ok]).all()


class TestLinearDelaunay:
    def test_triangulation_properties(self):
        from gdal_ray.core.delaunay import delaunay
        pts = _pts(80)[:, :2]
        tris = delaunay(pts)
        # Euler: t = 2n - 2 - h for a triangulated convex hull
        from gdal_ray.stages.vector_ops import convex_hull
        hull = convex_hull(pts)
        h = len(hull) - 1 if np.allclose(hull[0], hull[-1]) else len(hull)
        assert len(tris) == 2 * len(pts) - 2 - h
        # empty-circumcircle spot check on a few triangles
        rng = np.random.default_rng(0)
        for ti in rng.choice(len(tris), 10, replace=False):
            a, b, c = pts[tris[ti]]
            ax, ay = a; bx, by = b; cx, cy = c
            d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
            ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
                  + (cx**2 + cy**2) * (ay - by)) / d
            uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
                  + (cx**2 + cy**2) * (bx - ax)) / d
            rr = (ax - ux) ** 2 + (ay - uy) ** 2
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            assert (d2 >= rr * (1 - 1e-9)).all()

    def test_plane_reproduction_exact(self, ray_session):
        # linear interpolation of samples from z = 2x + 3y + 1
        # reproduces the plane exactly inside the hull
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        pts = _pts(120)[:, :2]
        v = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] + 1.0
        xyv = np.column_stack([pts, v])
        got = assemble_grid(grid_broadcast(xyv, _GT, (48, 48),
                                           method="linear").to_pandas(),
                            (48, 48))
        cols = np.arange(48) + 0.5
        gx, gy = gtr.apply(_GT, *np.meshgrid(cols, cols))
        want = 2.0 * gx + 3.0 * gy + 1.0
        inside = ~np.isnan(got)
        assert inside.mean() > 0.6          # hull covers most of the grid
        assert np.allclose(got[inside], want[inside], atol=1e-6)

    def test_outside_hull_nearest_fallback(self, ray_session):
        from gdal_ray.stages.grid import assemble_grid, grid_broadcast
        # cluster in one corner: most of the grid is outside the hull
        rng = np.random.default_rng(3)
        pts = np.column_stack([rng.uniform(0, 200, 30),
                               rng.uniform(0, 200, 30),
                               rng.uniform(5, 6, 30)])
        bare = assemble_grid(grid_broadcast(pts, _GT, (48, 48),
                                            method="linear").to_pandas(),
                             (48, 48))
        assert np.isnan(bare).any()
        filled = assemble_grid(grid_broadcast(pts, _GT, (48, 48),
                                              method="linear",
                                              radius=2000.0).to_pandas(),
                               (48, 48))
        assert not np.isnan(filled).any()
        assert ((filled >= 5) & (filled <= 6)).all()

    def test_partitioned_rejects_linear(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from gdal_ray.stages.grid import grid_partitioned
        ds = rd.from_arrow(pa.table({"x": [1.0], "y": [1.0],
                                     "value": [1.0]}))
        with pytest.raises(ValueError):
            grid_partitioned(ds, _GT, (8, 8), method="linear", radius=10.0)
