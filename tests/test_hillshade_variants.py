"""Hillshade variants: multidirectional / combined / Igor, ZT gradients
(apps/gdaldem_lib.cpp parity)."""

import numpy as np
import pytest

from gdal_ray.stages.raster_ops import (_zt_gradients, hillshade_combined,
                                        hillshade_igor,
                                        hillshade_multidirectional,
                                        hillshade_multidirectional_float)


def _plane(sx, sy, n=16):
    gy, gx = np.mgrid[0:n, 0:n]
    return sx * gx + sy * gy


def test_flat_is_sin_alt():
    ms = hillshade_multidirectional(np.zeros((8, 8)))
    assert (ms == int(1 + 254 * np.sin(np.pi / 4))).all()


def test_multidirectional_equals_single_az_mix_on_plane():
    # On a plane the weights are constant, so the multidirectional
    # value is the explicit weighted mean of the four azimuth shades.
    dem = _plane(0.3, -0.2)
    X, Y = 0.3, -0.2
    sa, ca, r = np.sin(np.pi / 4), np.cos(np.pi / 4), np.sqrt(0.5)
    s = X * X + Y * Y
    vals = [max(0.0, sa + ca * r * (X - Y)), max(0.0, sa + ca * X),
            max(0.0, sa + ca * r * (X + Y)), max(0.0, sa + ca * Y)]
    ws = [0.5 * s - X * Y, X * X, 0.5 * s + X * Y, Y * Y]
    exp = sum(w * v for w, v in zip(ws, vals)) / (2 * s) / np.sqrt(1 + s)
    got = hillshade_multidirectional_float(dem)[8, 8]
    assert got == pytest.approx(exp, abs=1e-12)


def test_negative_azimuth_shade_clamped_per_direction():
    # steep slope facing north-east: the 225° shade clamps to 0 but
    # the weighted result stays positive
    dem = _plane(-3.0, 3.0)
    v = hillshade_multidirectional_float(dem)[8, 8]
    assert 0.0 <= v < np.sin(np.pi / 4)


def test_combined_flat_and_mild():
    flat = hillshade_combined(np.zeros((8, 8)))
    # flat: shade = sin(alt), ang = acos(sin 45°) = 45°, slope term 0
    # -> cang = 1 -> byte 255
    assert (flat == 255).all()
    mild = hillshade_combined(_plane(0.05, 0.05))[8, 8]
    X = Y = 0.05
    sa, ca = np.sin(np.pi / 4), np.cos(np.pi / 4)
    az = np.radians(360 - 315 + 90)
    s = X * X + Y * Y
    raw = (sa + ca * (Y * np.cos(az) - X * np.sin(az))) / np.sqrt(1 + s)
    cang = 1 - np.arccos(raw) * np.arctan(np.sqrt(s)) * 4 / np.pi ** 2
    assert mild == int(np.clip(1 + 254 * cang, 1, 255))


def test_igor_flat_and_facing():
    assert (hillshade_igor(np.zeros((8, 8))) == 255).all()
    # slope facing the light (az 315 -> upslope to NW) is brighter
    # than the same slope facing away
    toward = hillshade_igor(_plane(1.0, 1.0))[8, 8]
    away = hillshade_igor(_plane(-1.0, -1.0))[8, 8]
    assert away < toward


def test_zt_gradients_central_difference():
    dem = _plane(3.0, 2.0)
    dx, dy = _zt_gradients(dem)
    assert dx[8, 8] == pytest.approx(3.0)
    assert dy[8, 8] == pytest.approx(2.0)
    # ZT variant flows through the alg switch
    a = hillshade_multidirectional_float(dem, alg="zt")[8, 8]
    b = hillshade_multidirectional_float(dem, alg="horn")[8, 8]
    assert a == pytest.approx(b)   # identical on a plane


def test_tri_riley_plane():
    import itertools
    gy, gx = np.mgrid[0:8, 0:8]
    dem = gx * 2.0 + gy
    from gdal_ray.stages.raster_ops import tri_riley
    exp = np.sqrt(sum((2 * dx + dy) ** 2
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)))
    assert tri_riley(dem)[4, 4] == pytest.approx(exp)


def test_aspect_trigonometric_conventions():
    from gdal_ray.stages.raster_ops import aspect, aspect_trigonometric
    gy, gx = np.mgrid[0:8, 0:8]
    dem = gx * 1.0                       # upslope due east
    trig = aspect_trigonometric(dem)[4, 4]
    azim = aspect(dem)[4, 4]
    # downslope west: trigonometric = 180 (CCW from east), azimuth = 270
    assert trig == pytest.approx(180.0)
    assert azim == pytest.approx(270.0)
    flat = np.zeros((4, 4))
    assert aspect_trigonometric(flat)[2, 2] == -9999.0
    assert aspect_trigonometric(flat, zero_for_flat=True)[2, 2] == 0.0


def test_translate_projwin():
    from gdal_ray.stages.raster_ops import translate
    px = np.arange(400, dtype=np.uint8).reshape(20, 20)[:, :, None]
    gt = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)
    out = translate(px, projwin=(1050.0, 1950.0, 1150.0, 1850.0),
                    geotransform=gt)
    assert out.shape == (10, 10, 1)
    assert out[0, 0, 0] == px[5, 5, 0]
    with pytest.raises(ValueError):
        translate(px, projwin=(0, 0, 1, 1))    # no geotransform


def test_slope_aspect_alg_switch():
    from gdal_ray.stages.raster_ops import aspect, slope
    gy, gx = np.mgrid[0:8, 0:8]
    dem = gx * 2.0
    assert slope(dem, alg="zt")[4, 4] == pytest.approx(slope(dem)[4, 4])
    assert aspect(dem, alg="zt")[4, 4] == pytest.approx(270.0)


def test_neighbors_methods():
    from gdal_ray.stages.raster_ops import neighbors
    b = np.array([[1, 2, 3], [4, 100, 6], [7, 8, 9]], float)
    assert neighbors(b, method="median")[1, 1] == 6.0
    assert neighbors(b, method="min")[1, 1] == 1.0
    assert neighbors(b, method="max")[1, 1] == 100.0
    assert neighbors(b, method="mean")[1, 1] == pytest.approx(b.mean())
    m = np.array([[1, 1, 2], [2, 2, 3], [3, 3, 3]], float)
    assert neighbors(m, method="mode")[1, 1] == 3.0
    # tie -> smallest value
    t = np.array([[1, 1, 1], [2, 2, 2], [5, 7, 9]], float)
    assert neighbors(t, method="mode")[1, 1] == 1.0
    # weighted mean with a kernel
    k = np.zeros((3, 3)); k[1, 1] = 1.0
    assert neighbors(b, method="mean", kernel=k)[1, 1] == 100.0
    with pytest.raises(ValueError):
        neighbors(b, method="nope")
    with pytest.raises(ValueError):
        neighbors(b, size=4)


def test_band_stack_resamples_to_first_grid():
    from gdal_ray.stages.raster_ops import band_stack
    a = np.full((8, 8), 3, np.uint8)
    b = np.full((16, 16, 3), 9, np.uint8)
    s = band_stack([a, b])
    assert s.shape == (8, 8, 4)
    assert s[0, 0].tolist() == [3, 9, 9, 9]
    with pytest.raises(ValueError):
        band_stack([])
