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
