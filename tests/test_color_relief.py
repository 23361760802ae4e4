"""gdaldem color-relief (apps/gdaldem_lib.cpp parity)."""

import numpy as np

from gdal_ray.stages.raster_ops import color_relief

RAMP = [(0, 0, 0, 128), (64, 0, 128, 64), (128, 255, 255, 0),
        (192, 205, 92, 92), (255, 255, 255, 255)]


def test_exact_entries_and_ends():
    v = np.array([[0.0, 64.0, 255.0, -10.0, 400.0]])
    out = color_relief(v, RAMP)
    assert tuple(out[0, 0, :3]) == (0, 0, 128)
    assert tuple(out[0, 1, :3]) == (0, 128, 64)
    assert tuple(out[0, 2, :3]) == (255, 255, 255)
    # beyond the ends: end entry colors (GetColor i==0 / i==size cases)
    assert tuple(out[0, 3, :3]) == (0, 0, 128)
    assert tuple(out[0, 4, :3]) == (255, 255, 255)


def test_interpolation_rounding():
    # ratio 0.5 between (0,0,128) and (0,128,64):
    # g = int(0.5 + 0 + .5*128) = 64, b = int(0.5 + 128 + .5*(-64)) = 96
    out = color_relief(np.array([[32.0]]), RAMP)
    assert tuple(out[0, 0, :3]) == (0, 64, 96)
    # int(0.5 + x) is round-half-up: 31/64*128 = 62 exactly
    out = color_relief(np.array([[31.0]]), RAMP)
    assert out[0, 0, 1] == 62


def test_nearest_mode_ties_upper():
    out = color_relief(np.array([[30.0, 32.0, 34.0]]), RAMP, mode="nearest")
    assert tuple(out[0, 0, :3]) == (0, 0, 128)      # closer to 0
    assert tuple(out[0, 1, :3]) == (0, 128, 64)     # tie -> upper entry
    assert tuple(out[0, 2, :3]) == (0, 128, 64)


def test_exact_mode_transparent_miss():
    out = color_relief(np.array([[64.0, 65.0]]), RAMP, mode="exact")
    assert tuple(out[0, 0]) == (0, 128, 64, 255)
    assert tuple(out[0, 1]) == (0, 0, 0, 0)


def test_nan_handling():
    out = color_relief(np.array([[np.nan]]), RAMP)
    assert tuple(out[0, 0]) == (0, 0, 0, 0)
    out = color_relief(np.array([[np.nan]]), RAMP, nan_color=(1, 2, 3))
    assert tuple(out[0, 0]) == (1, 2, 3, 255)


def test_alpha_channel_interpolated():
    ramp = [(0, 0, 0, 0, 0), (100, 0, 0, 0, 200)]
    out = color_relief(np.array([[50.0]]), ramp)
    assert out[0, 0, 3] == 100
