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


def test_reclassify_text_grammar():
    """frmts/vrt/vrtreclassifier.h mapping grammar."""
    import numpy as np
    from gdal_ray.stages.raster_ops import reclassify_text

    v = np.array([[1.0, 3.0, 3.5, 4.0, 4.5, 7.0, 99.0]])
    out = reclassify_text(v, "1=10; (3,4]=20; [7,inf]=30; DEFAULT=0")
    assert out.tolist() == [[10.0, 0.0, 20.0, 20.0, 0.0, 30.0, 30.0]]
    # open vs closed bounds
    out = reclassify_text(v, "[3,4)=1; DEFAULT=0")
    assert out[0, 1] == 1 and out[0, 3] == 0
    # NO_DATA both sides + PASS_THROUGH default
    out = reclassify_text(v, "NO_DATA=0; DEFAULT=PASS_THROUGH", nodata=99)
    assert out[0, 6] == 0 and out[0, 2] == 3.5
    # first match wins
    out = reclassify_text(v, "[0,10]=1; [3,4]=2; DEFAULT=0")
    assert out[0, 1] == 1
    import pytest
    with pytest.raises(ValueError):
        reclassify_text(v, "NO_DATA=0; DEFAULT=0")  # nodata unset
    with pytest.raises(ValueError):
        reclassify_text(v, "1=10")                  # unmapped, no DEFAULT
