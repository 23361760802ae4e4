"""Viewshed golden parity — fixtures transcribed from the reference's
own unit tests (autotest/cpp/test_viewshed.cpp: min_max_mask:99,
all_visible:394, simple_height:420, dem_vs_ground:505, oor_right:555,
oor_left:616, oor_above:677, oor_below:739). The reference writes
visibleVal=255 into an Int8 band, so visible cells read back as 127 —
tests pass visible_val=127 to match the published arrays."""

import numpy as np
import pytest

from gdal_ray.core.viewshed import viewshed, viewshed_window

V = 127  # int8-saturated visible value used by the reference fixtures


def vs(dem, ox, oy, **kw):
    kw.setdefault("visible_val", V)
    out, _ = viewshed(np.asarray(dem, np.float64), ox, oy, **kw)
    return out


class TestGolden:
    def test_all_visible(self):
        dem = [[1, 2, 3], [4, 5, 6], [3, 2, 1]]
        assert np.array_equal(vs(dem, 1, 1), np.full((3, 3), V))

    IN5 = [[-1, 0, 1, 0, -1],
           [-1, 2, 0, 4, -1],
           [-1, 1, 0, -1, -1],
           [0, 3, 0, 2, 0],
           [-1, 0, 0, 3, -1]]
    OBSERVABLE = [[4, 2, 1, 4, 8],
                  [3, 2, 0, 4, 3],
                  [2, 1, 0, -1, -1],
                  [4, 3, 0, 2, 1],
                  [6, 3, 0, 3, 4]]

    def test_simple_height_normal(self):
        exp = np.where(np.asarray(self.IN5) >= np.asarray(self.OBSERVABLE),
                       V, 0)
        assert np.array_equal(vs(self.IN5, 2, 2), exp)

    def test_simple_height_dem(self):
        out = vs(self.IN5, 2, 2, mode="dem")
        assert np.array_equal(out, np.asarray(self.OBSERVABLE, np.float64))

    def test_simple_height_ground(self):
        out = vs(self.IN5, 2, 2, mode="ground")
        exp = np.maximum(
            np.asarray(self.OBSERVABLE, np.float64) - np.asarray(self.IN5), 0)
        assert np.array_equal(out, exp)

    @pytest.mark.parametrize("dem,obs,ground,dem_exp", [
        ([0, 0, 0, 1, 0, 0, 0, 0], (2, 0),
         [0, 0, 0, 0, 2, 3, 4, 5], [0, 0, 0, 1, 2, 3, 4, 5]),
        ([1, 1, 0, 1, 0, 1, 2, 2], (3, 0),
         [0, 0, 0, 0, 0, 0, 0, 1 / 3.0], [1, 1, 0, 1, 0, 1, 2, 7 / 3.0]),
        ([0, 0, 0, 1, 1, 0, 0, 0], (0, 0),
         [0, 0, 0, 0, 1 / 3.0, 5 / 3.0, 2.0, 7 / 3.0],
         [0, 0, 0, 1, 4 / 3.0, 5 / 3.0, 2.0, 7 / 3.0]),
        ([0, 0, 1, 2, 3, 4, 5, 6], (0, 0),
         [0, 0, 0, 0, 0, 0, 0, 0], [0, 0, 1, 2, 3, 4, 5, 6]),
        ([0, 0, 1, 1, 3, 4, 5, 4], (0, 0),
         [0, 0, 0, .5, 0, 0, 0, 11 / 6.0],
         [0, 0, 1, 1.5, 3, 4, 5, 35 / 6.0]),
    ])
    def test_dem_vs_ground(self, dem, obs, ground, dem_exp):
        row = [dem]
        g = vs(row, obs[0], obs[1], mode="ground")
        np.testing.assert_allclose(g[0], ground, rtol=0, atol=1e-12)
        d = vs(row, obs[0], obs[1], mode="dem")
        np.testing.assert_allclose(d[0], dem_exp, rtol=0, atol=1e-12)

    IN_OOR = [[1, 2, 0, 4, 1],
              [0, 0, 2, 1, 0],
              [1, 0, 0, 3, 3]]

    @pytest.mark.parametrize("obs,expected", [
        ((6, 1), [[16 / 3.0, 29 / 6.0, 13 / 3.0, 4, 1],
                  [3, 2.5, 2, 1, 0],
                  [13 / 3.0, 23 / 6.0, 10 / 3.0, 3, 3]]),
        ((6, 2), [[26 / 5.0, 17 / 4.0, 11 / 3.0, 4, 1],
                  [6, 4.5, 3, 1.5, 0],
                  [9, 7.5, 6, 4.5, 3]]),
        ((-2, 1), [[1, 2, 2, 4, 4.5],
                   [0, 0, 2, 2.5, 3],
                   [1, 1, 1, 3, 3.5]]),
        ((-2, 2), [[1, 2, 5 / 3.0, 4, 4.2],
                   [0, .5, 2, 2.5, 3.1],
                   [1, 1.5, 2, 3, 3.6]]),
        ((2, -2), [[1, 2, 0, 4, 1],
                   [2.5, 2, 2, 4, 4.5],
                   [3, 8 / 3.0, 8 / 3.0, 14 / 3.0, 17 / 3.0]]),
        ((-2, -2), [[1, 2, 0, 4, 1],
                    [0, 1.5, 2.5, 1.25, 3.15],
                    [1, 0.5, 2, 3, 3]]),
        ((2, 4), [[1, 2, 8 / 3.0, 4, 5],
                  [0.5, 0, 2, 3, 4.5],
                  [1, 0, 0, 3, 3]]),
        ((6, 4), [[4.2, 6, 6, 4, 1],
                  [1.35, 2.25, 4.5, 4.5, 0],
                  [1, 0, 0, 3, 3]]),
    ])
    def test_out_of_raster_observer_dem_mode(self, obs, expected):
        out = vs(self.IN_OOR, obs[0], obs[1], mode="dem")
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-12)

    def test_min_max_mask(self):
        dem = np.zeros((15, 15))
        out, (xs, ys) = viewshed(dem, 7, 7, min_distance=2, max_distance=6,
                                 visible_val=V)
        assert out.shape == (13, 13) and (xs, ys) == (1, 0)
        e = [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, V, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, V, V, V, V, V, V, V, 0, 0, 0],
            [0, 0, V, V, V, V, V, V, V, V, V, 0, 0],
            [0, V, V, V, V, V, V, V, V, V, V, V, 0],
            [0, V, V, V, V, V, V, V, V, V, V, V, 0],
            [0, V, V, V, V, 0, 0, 0, V, V, V, V, 0],
            [V, V, V, V, V, 0, 0, 0, V, V, V, V, V],
            [0, V, V, V, V, 0, 0, 0, V, V, V, V, 0],
            [0, V, V, V, V, V, V, V, V, V, V, V, 0],
            [0, V, V, V, V, V, V, V, V, V, V, V, 0],
            [0, 0, V, V, V, V, V, V, V, V, V, 0, 0],
            [0, 0, 0, V, V, V, V, V, V, V, 0, 0, 0],
        ]
        assert np.array_equal(out, np.asarray(e, np.float64))


class TestBehavior:
    def test_window_full_when_no_max(self):
        assert viewshed_window(10, 8, 3, 3, 0) == (0, 10, 0, 8)

    def test_wall_shadows(self):
        # A tall wall at x=4 hides everything behind it on the row.
        dem = np.zeros((5, 9))
        dem[2, 4] = 10.0
        out = vs(dem, 2, 0, observer_height=1.0)
        # straight down the column is unobstructed
        assert out[0, 2] == V
        # behind the wall along the observer's diagonal-ish ray: hidden
        assert out[4, 8] == 0 or out[3, 6] == 0

    def test_target_height_reveals(self):
        dem = np.zeros((1, 6))
        dem[0, 2] = 2.0
        hidden = vs(dem, 0, 0)
        seen = vs(dem, 0, 0, target_height=10.0)
        assert hidden[0, 4] == 0 and seen[0, 4] == V

    def test_curvature_hides_far_cells(self):
        dem = np.zeros((1, 200))
        flat = vs(dem, 0, 0, observer_height=1.0)
        curved = vs(dem, 0, 0, observer_height=1.0,
                    semi_major=2000.0, curve_coeff=1.0)
        assert flat.sum() == V * 200
        assert curved.sum() < flat.sum()

    def test_cell_modes_bracket_edge(self):
        rng = np.random.default_rng(3)
        dem = rng.random((21, 21)) * 5
        vis = {m: (vs(dem, 10, 10, cell_mode=m) == V).sum()
               for m in ("edge", "diagonal", "min", "max")}
        # min picks the lower LOS height -> at least as many visible
        assert vis["min"] >= max(vis["edge"], vis["diagonal"])
        assert vis["max"] <= min(vis["edge"], vis["diagonal"])

    def test_vector_wedge_matches_scalar_reference(self):
        # Independent all-scalar re-derivation of the edge-mode sweep,
        # compared against the production (vectorized-wedge) path.
        rng = np.random.default_rng(42)
        dem = rng.random((17, 19)) * 8
        ox, oy = 9, 8
        out = vs(dem, ox, oy)

        h, w = dem.shape
        zo = dem[oy, ox]
        cur0 = dem[oy].astype(float) - zo
        exp = np.zeros((h, w))

        def line_z(n, za):
            return za * n / (n - 1)

        def edge_z(i, j, za, zb):
            return (za * i + zb * (j - i)) / (j - 1)

        def setv(curr, row, i, z):
            exp[row, i] = 0 if curr[i] < z else V
            curr[i] = max(curr[i], z)

        exp[oy, ox] = V
        for step, rng_ in ((-1, range(ox - 1, -1, -1)),
                           (1, range(ox + 1, w))):
            first = True
            for i in rng_:
                z = cur0[i] if first else line_z(abs(i - ox), cur0[i - step])
                first = False
                setv(cur0, oy, i, z)
        for drow in (-1, 1):
            prev = cur0.copy()
            row = oy + drow
            while 0 <= row < h:
                ady = abs(row - oy)
                curr = dem[row].astype(float) - zo
                z = curr[ox] if ady == 1 else line_z(ady, prev[ox])
                setv(curr, row, ox, z)
                for step, rng_ in ((-1, range(ox - 1, -1, -1)),
                                   (1, range(ox + 1, w))):
                    for i in rng_:
                        dx = abs(i - ox)
                        if dx == ady:
                            z = curr[i] if ady == 1 else line_z(ady, prev[i - step])
                        elif dx > ady:
                            z = edge_z(ady, dx, prev[i - step], curr[i - step])
                        else:
                            z = edge_z(dx, ady, prev[i - step], prev[i])
                        setv(curr, row, i, z)
                prev = curr
                row += drow
        assert np.array_equal(out, exp)


class TestCumulative:
    def test_matches_serial_sum(self, ray_session):
        from gdal_ray.stages.viewshed import cumulative_viewshed, observer_grid
        rng = np.random.default_rng(5)
        dem = rng.random((33, 37)) * 10
        obs = observer_grid(37, 33, 3, 3)
        ids, vis, acc = cumulative_viewshed(dem, obs, observer_height=1.0,
                                            batch_size=2, fanin=2)
        exp_acc = np.zeros((33, 37))
        exp_vis = []
        for i in range(obs.num_rows):
            out, _ = viewshed(dem, obs["ox"][i].as_py(), obs["oy"][i].as_py(),
                              observer_height=1.0, visible_val=1.0)
            exp_acc += out
            exp_vis.append(int(out.sum()))
        assert list(ids) == list(range(9))
        assert list(vis) == exp_vis
        assert np.array_equal(acc, exp_acc)

    def test_battery_query_values_pinned(self, ray_session):
        # rows-only in the driver gate -> values pinned here instead
        from gdal_ray.pipelines.queries import q_viewshed
        row = q_viewshed("/root/testdata/sf0.001").iloc[0].to_dict()
        assert row == {"n_observers": 64, "sum_visible_px": 142232,
                       "min_visible_px": 879, "max_visible_px": 4262,
                       "px_seen_by_any": 16485, "max_observers_per_px": 21,
                       "cum_checksum": 60729}
