"""Geolocation-array transformer semantics (alg/gdalgeoloc.cpp parity)."""

import numpy as np
import pytest

from gdal_ray.core.geoloc import GeolocTransformer


def _affine_grid(w=17, h=17):
    gl, gp = np.meshgrid(np.arange(h, dtype=float),
                         np.arange(w, dtype=float), indexing="ij")
    return 10.0 + 3.0 * gp + 0.5 * gl, 50.0 - 0.25 * gp + 2.0 * gl


def test_forward_at_nodes_and_between():
    gx, gy = _affine_grid()
    tr = GeolocTransformer(gx, gy, pixel_step=4.0, line_step=4.0)
    # node: pixel 8 -> gp 2
    X, Y, ok = tr.pixel_to_geo(np.array([8.0]), np.array([12.0]))
    assert ok.all()
    assert X[0] == pytest.approx(10 + 3 * 2 + 0.5 * 3)
    assert Y[0] == pytest.approx(50 - 0.25 * 2 + 2 * 3)
    # between nodes: bilinear of an affine field is exact
    X, Y, ok = tr.pixel_to_geo(np.array([6.0]), np.array([10.0]))
    assert X[0] == pytest.approx(10 + 3 * 1.5 + 0.5 * 2.5)


def test_edge_clamp_extrapolates():
    # "infinite extension beyond borders" (PixelLineToXY clamping):
    # a point past the last node keeps the last cell's gradient.
    gx, gy = _affine_grid(5, 5)
    tr = GeolocTransformer(gx, gy, pixel_step=1.0, line_step=1.0)
    X, _, ok = tr.pixel_to_geo(np.array([6.0]), np.array([0.0]))
    assert ok.all()
    assert X[0] == pytest.approx(10.0 + 3.0 * 6.0)


def test_nodata_node_fails():
    gx, gy = _affine_grid(5, 5)
    gx[2, 2] = -999.0
    tr = GeolocTransformer(gx, gy, nodata=-999.0)
    _, _, ok = tr.pixel_to_geo(np.array([1.5, 3.5]), np.array([1.5, 3.5]))
    assert not ok[0] and ok[1]


def test_half_node_convention():
    # origin_top_left=False shifts grid coords by the half-node the
    # reference applies for center-georeferenced arrays.
    gx, gy = _affine_grid()
    a = GeolocTransformer(gx, gy, origin_top_left=True)
    b = GeolocTransformer(gx, gy, origin_top_left=False)
    Xa, _, _ = a.pixel_to_geo(np.array([3.0]), np.array([3.0]))
    Xb, _, _ = b.pixel_to_geo(np.array([3.5]), np.array([3.5]))
    assert Xa[0] == pytest.approx(Xb[0])


def test_inverse_roundtrip_nonlinear_grid():
    gl, gp = np.meshgrid(np.arange(25, dtype=float),
                         np.arange(25, dtype=float), indexing="ij")
    gx = 5.0 + 2.0 * gp + 0.01 * gp * gp + 0.2 * gl
    gy = -3.0 + 1.5 * gl + 0.005 * gl * gl - 0.1 * gp
    tr = GeolocTransformer(gx, gy, pixel_step=2.0, line_step=2.0)
    px = np.linspace(1.0, 47.0, 40)
    ln = np.linspace(1.0, 47.0, 40)
    X, Y, ok = tr.pixel_to_geo(px, ln)
    assert ok.all()
    rpx, rln, conv = tr.geo_to_pixel(X, Y)
    assert conv.all()
    assert np.abs(rpx - px).max() < 1e-6
    assert np.abs(rln - ln).max() < 1e-6


def test_offsets_and_steps():
    gx, gy = _affine_grid()
    tr = GeolocTransformer(gx, gy, pixel_offset=100.0, line_offset=200.0,
                           pixel_step=10.0, line_step=10.0)
    # pixel 120 -> gp = (120-100)/10 = 2
    X, _, _ = tr.pixel_to_geo(np.array([120.0]), np.array([230.0]))
    assert X[0] == pytest.approx(10 + 3 * 2 + 0.5 * 3)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        GeolocTransformer(np.zeros((3, 3)), np.zeros((3, 4)))


def test_geoloc_warp_constant_and_affine():
    """geoloc_warp on an affine geoloc grid: constant image warps to
    that constant; the dst grid covers the geoloc extent."""
    from gdal_ray.stages.warp import geoloc_warp

    gx, gy = _affine_grid(33, 33)
    tr = GeolocTransformer(gx, gy, pixel_step=8.0, line_step=8.0)
    src = np.full((256, 256), 42.0)
    out, valid, gt = geoloc_warp(src, tr, resampling="near")
    assert valid.any()
    assert (out[valid] == 42.0).all()
    # extent: geo_x spans [10, 10+3*32]; dst grid must cover it
    assert gt[0] <= 10.0 + 1e-9
    assert gt[0] + out.shape[1] * gt[1] >= 10.0 + 3 * 32 - 1e-9


def test_geoloc_warp_gradient_identityish():
    """A geoloc grid that IS an affine map warps a gradient image
    consistently with direct sampling at the center."""
    from gdal_ray.stages.warp import geoloc_warp

    gx, gy = _affine_grid(33, 33)
    tr = GeolocTransformer(gx, gy, pixel_step=8.0, line_step=8.0)
    gyy, gxx = np.mgrid[0:256, 0:256]
    src = gxx.astype(np.float64)
    out, valid, gt = geoloc_warp(src, tr, resampling="bilinear")
    ch, cw = out.shape[0] // 2, out.shape[1] // 2
    assert valid[ch, cw]
    X = gt[0] + (cw + 0.5) * gt[1]
    Y = gt[3] + (ch + 0.5) * gt[5]
    px, ln, ok = tr.geo_to_pixel(np.array([X]), np.array([Y]))
    assert ok.all()
    assert abs(out[ch, cw] - (float(px[0]) - 0.5)) < 0.6
