"""Global Geodetic tile profile (gdal2tiles.py GlobalGeodetic parity)."""

import numpy as np
import pytest

from gdal_ray.core import geodetic as gg


def test_resolution_and_base_layout():
    # tmscompatible: 2 tiles at z0 (res 0.703125), world = 512x256 px
    assert gg.resolution(0) == pytest.approx(0.703125)
    px, py = gg.lonlat_to_pixels(180.0, 90.0, 0)
    assert (px, py) == (512.0, 256.0)
    # WMTS variant: 1 tile at z0
    assert gg.resolution(0, tms_compatible=False) == pytest.approx(1.40625)


def test_ceil_minus_one_tile_rule():
    # a point exactly on a tile edge belongs to the lower tile —
    # PixelsToTile is ceil(p/size) - 1, unlike mercator's floor
    tx, ty = gg.pixels_to_tile(np.array([256.0, 256.5, 0.0]),
                               np.array([256.0, 255.9, 0.1]))
    assert tx.tolist() == [0, 1, -1]
    assert ty.tolist() == [0, 0, 0]


def test_lonlat_to_tile_corners():
    # z1: 4x2 tiles; lon -180..180, lat -90..90
    tx, ty = gg.lonlat_to_tile(np.array([-179.9, 179.9]),
                               np.array([-89.9, 89.9]), 1)
    assert tx.tolist() == [0, 3]
    assert ty.tolist() == [0, 1]


def test_tile_bounds_roundtrip():
    b = gg.tile_bounds(2, 1, 1)
    # z1 res = 0.3515625 deg/px; tile spans 90 deg
    assert b[0] == pytest.approx(0.0)
    assert b[1] == pytest.approx(0.0)
    assert b[2] == pytest.approx(90.0)
    assert b[3] == pytest.approx(90.0)
    # center of the tile maps back to it
    tx, ty = gg.lonlat_to_tile(45.0, 45.0, 1)
    assert (int(tx), int(ty)) == (2, 1)


def test_zoom_for_pixel_size():
    # never scales up: a pixel slightly coarser than z3 resolution
    # picks z2
    assert gg.zoom_for_pixel_size(gg.resolution(3) * 1.01) == 2
    assert gg.zoom_for_pixel_size(1000.0) == 0
