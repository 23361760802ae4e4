"""Raster tile profile (gdal2tiles -p raster parity)."""

import numpy as np
import pytest

from gdal_ray.core.rasterprofile import native_zoom, tile_ranges, tile_window


def test_native_zoom():
    assert native_zoom(256, 256) == 0
    assert native_zoom(257, 100) == 1
    assert native_zoom(512, 512) == 1
    assert native_zoom(768, 200) == 2     # ceil(log2(3)) = 2
    assert native_zoom(4096, 4096) == 4
    assert native_zoom(1, 1) == 0


def test_tile_ranges():
    rng = tile_ranges(768, 520)
    # nz = 2: zooms 0,1,2 with tsize 1024, 512, 256
    assert [r[0] for r in rng] == [1024, 512, 256]
    assert rng[2][3:] == (2, 2)           # 3x3 tiles at native zoom
    assert rng[0][3:] == (0, 0)           # whole raster in one tile


def test_tile_window_interior_and_edges():
    # 768x520 at native zoom (tsize 256): interior tile full size
    rx, ry, rxs, rys, wx, wy, wxs, wys = tile_window(0, 1, 2, 768, 520)
    assert (rxs, rys) == (256, 256)
    assert (wxs, wys) == (256, 256)
    # TMS: ty=1 of 3 rows (h=520 -> rows at y 264..520 / 8..264 / 0..8)
    assert ry == 520 - 1 * 256 - 256
    # top edge tile (ty = tmaxy = 2) carries the 8-px remainder
    rx, ry, rxs, rys, wx, wy, wxs, wys = tile_window(0, 2, 2, 768, 520)
    assert rys == 520 % 256 == 8
    assert ry == 0                         # TMS: highest ty = top rows
    assert wys == int(8 / 256 * 256) == 8
    assert wy == 256 - 8                   # write at the tile bottom


def test_tile_window_xyz_orientation():
    rx, ry, rxs, rys, wx, wy, wxs, wys = tile_window(0, 0, 2, 768, 520,
                                                     xyz=True)
    assert ry == 0 and wy == 0             # XYZ: ty 0 = top, no flip


def test_tile_window_errors():
    with pytest.raises(ValueError):
        tile_window(0, 0, 9, 768, 520)     # zoom beyond native
    with pytest.raises(ValueError):
        tile_window(5, 0, 2, 768, 520)     # x outside grid
