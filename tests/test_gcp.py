"""GCP transformer golden parity — expected values transcribed from the
reference's own tests (autotest/gcore/gcps2geotransform.py:40-227,
autotest/gcore/transformer.py:60-112 with data/gcps.vrt's 4 GCPs)."""

import numpy as np
import pytest

from gdal_ray.core.gcp import GCPPolynomial, GCPTps, gcps_to_geotransform

# (pixel, line, X, Y) rows — data/gcps.vrt
GCPS_VRT = [(0.0, 0.0, 440720.0, 3751320.0),
            (100.0, 0.0, 446720.0, 3751320.0),
            (0.0, 100.0, 440720.0, 3745320.0),
            (100.0, 100.0, 446720.0, 3745320.0)]


def check_gt(got, exp, tol=1e-6):
    assert got is not None
    for g, e in zip(got, exp):
        assert abs(g - e) <= tol * max(1.0, abs(e)), (got, exp)


class TestGcpsToGeoTransform:
    def test_exact_three_points(self):
        gt = gcps_to_geotransform([(0, 0, 400000, 370000),
                                   (100, 0, 410000, 370000),
                                   (100, 200, 410000, 368000)])
        check_gt(gt, (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0))

    def test_least_squares_non_exact(self):
        gt = gcps_to_geotransform([(0, 0, 400000, 370000),
                                   (100, 0, 410000, 370000),
                                   (100, 200, 410000, 368000),
                                   (0, 200, 400000, 368000.01)])
        check_gt(gt, (400000.0, 100.0, 0.0, 370000.0025, -5e-05, -9.999975))

    def test_approx_not_ok_poor_fit(self):
        assert gcps_to_geotransform([(0, 0, 400000, 370000),
                                     (100, 0, 410000, 370000),
                                     (100, 200, 410000, 368000),
                                     (0, 200, 400000, 360000)],
                                    approx_ok=False) is None

    def test_single_point_fails(self):
        assert gcps_to_geotransform([(0, 0, 400000, 370000)]) is None

    def test_two_points(self):
        gt = gcps_to_geotransform([(0, 0, 400000, 370000),
                                   (100, 200, 410000, 368000)])
        check_gt(gt, (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0))

    @pytest.mark.parametrize("order", [
        [(400000, 370000), (410000, 370000), (410000, 368000),
         (400000, 368000)],
        [(400000, 370000), (410000, 368000), (410000, 370000),
         (400000, 368000)],
    ])
    def test_identity_corners_any_order(self, order):
        gcps = [(x, y, x, y) for x, y in order]
        check_gt(gcps_to_geotransform(gcps),
                 (0.0, 1.0, 0.0, 0.0, 0.0, 1.0))

    def test_messy_real_world(self):
        gt = gcps_to_geotransform([
            (0.01, 0.04, -87.05528672907, 39.22759504228),
            (0.01, 2688.02, -86.97079900719, 39.27075713986),
            (4031.99, 2688.04, -87.05960736744, 39.37569137000),
            (1988.16, 1540.80, -87.055069186699924, 39.304963106777514),
            (1477.41, 2400.83, -87.013419295885001, 39.304705030894979),
            (1466.02, 2376.92, -87.013906298363295, 39.304056190007913)])
        check_gt(gt, (-87.056612873288, -2.232795668658e-05,
                      3.178617809303e-05, 39.227856615716,
                      2.6091510188921e-05, 1.596921026218e-05), 1e-5)

    def test_broken_hour_glass(self):
        assert gcps_to_geotransform([(0, 0, 0, 0), (0, 10, 0, 10),
                                     (10, 0, 10, 10),
                                     (10, 10, 10, 0)]) is None
        assert gcps_to_geotransform([(0, 0, 0, 0), (0, 10, 10, 0),
                                     (10, 0, 0, 10),
                                     (10, 10, 10, 10)]) is None


class TestPolynomial:
    def test_forward_inverse_golden(self):
        tr = GCPPolynomial(GCPS_VRT)
        x, y = tr.forward(20.0, 10.0)
        assert x == pytest.approx(441920, abs=0.001)
        assert y == pytest.approx(3750720, abs=0.001)
        px, ln = tr.inverse(x, y)
        assert px == pytest.approx(20, abs=0.001)
        assert ln == pytest.approx(10, abs=0.001)

    def test_auto_order_selection(self):
        assert GCPPolynomial(GCPS_VRT).order == 1
        six = GCPS_VRT + [(50.0, 50.0, 443720.0, 3748320.0),
                          (25.0, 75.0, 442220.0, 3746820.0)]
        assert GCPPolynomial(six).order == 2

    def test_two_gcp_rectangle_synthesis(self):
        tr = GCPPolynomial([(0, 0, 100, 200), (10, 20, 200, 100)], order=1)
        x, y = tr.forward(5.0, 10.0)
        assert x == pytest.approx(150.0) and y == pytest.approx(150.0)

    def test_order2_recovers_quadratic(self):
        rng = np.random.default_rng(1)
        px = rng.uniform(0, 100, 12)
        ln = rng.uniform(0, 100, 12)
        X = 5 + 2 * px - ln + 0.01 * px * px - 0.005 * px * ln
        Y = -3 + px + 4 * ln + 0.002 * ln * ln
        tr = GCPPolynomial(np.column_stack([px, ln, X, Y]), order=2)
        qx, qy = tr.forward(33.0, 44.0)
        assert qx == pytest.approx(5 + 66 - 44 + 0.01 * 33**2
                                   - 0.005 * 33 * 44, abs=1e-6)
        assert qy == pytest.approx(-3 + 33 + 176 + 0.002 * 44**2, abs=1e-6)

    def test_too_few_gcps_raises(self):
        with pytest.raises(ValueError):
            GCPPolynomial(GCPS_VRT, order=3)


class TestTps:
    def test_forward_inverse_golden(self):
        tr = GCPTps(GCPS_VRT)
        x, y = tr.forward(20.0, 10.0)
        assert x == pytest.approx(441920, abs=0.001)
        assert y == pytest.approx(3750720, abs=0.001)
        px, ln = tr.inverse(x, y)
        assert px == pytest.approx(20, abs=0.001)
        assert ln == pytest.approx(10, abs=0.001)

    def test_exact_at_gcps_nonlinear(self):
        rng = np.random.default_rng(7)
        g = np.column_stack([rng.uniform(0, 50, 9), rng.uniform(0, 50, 9),
                             rng.uniform(0, 1000, 9),
                             rng.uniform(0, 1000, 9)])
        tr = GCPTps(g)
        x, y = tr.forward(g[:, 0], g[:, 1])
        np.testing.assert_allclose(x, g[:, 2], atol=1e-6)
        np.testing.assert_allclose(y, g[:, 3], atol=1e-6)

    def test_vectorized_grid(self):
        tr = GCPTps(GCPS_VRT)
        cols, rows = np.meshgrid(np.arange(5.0), np.arange(4.0))
        x, y = tr.forward(cols, rows)
        assert x.shape == (4, 5)
        np.testing.assert_allclose(x[:, 1] - x[:, 0], 60.0, atol=1e-9)


class TestGcpWarp:
    def test_affine_gcps_reproduce_grid(self):
        from gdal_ray.stages.warp import gcp_warp
        rng = np.random.default_rng(2)
        src = rng.integers(0, 255, (40, 50)).astype(np.float64)
        out, valid, dst_gt = gcp_warp(src, GCPS_VRT[:3] + GCPS_VRT[3:],
                                      resampling="near")
        # affine GCPs with square pixels: output is the same image
        assert dst_gt[1] == pytest.approx(-dst_gt[5])
        assert valid.mean() > 0.9
        # pixel (20, 10) maps to geo 441920/3750720; find it in dst
        c = int((441920 + 60 * 0.5 - dst_gt[0]) / dst_gt[1])
        r = int((3750720 - 60 * 0.5 - dst_gt[3]) / dst_gt[5])
        src_px = src[int(10 + 0.1), int(20 + 0.1)]
        assert out[r, c] == pytest.approx(src_px)

    def test_tps_matches_polynomial_for_affine_gcps(self):
        from gdal_ray.stages.warp import gcp_warp
        rng = np.random.default_rng(3)
        src = rng.random((30, 30))
        a, _, gta = gcp_warp(src, GCPS_VRT, method="polynomial",
                             resampling="bilinear")
        b, _, gtb = gcp_warp(src, GCPS_VRT, method="tps",
                             resampling="bilinear")
        np.testing.assert_allclose(gta, gtb, rtol=1e-12)
        np.testing.assert_allclose(a, b, atol=1e-6)
