"""gdal2tiles "raster" profile — tiling a raster in its own pixel
space (no CRS), used for non-georeferenced imagery.

Reference: osgeo_utils/gdal2tiles.py —
  native zoom   :2526-2544  max(0, ceil(log2(w/ts)), ceil(log2(h/ts)))
  per-zoom grid :2586-2599  tsize(z) = 2^(nz−z)·ts source px per tile,
                 ranges (0,0)..(ceil(w/tsize)−1, ceil(h/tsize)−1)
  tile window   :2889-2921  edge tiles carry the remainder; TMS y
                 counts from the bottom (ry flipped) unless --xyz.

Pure integer math (the ceil-log2 is computed bit-wise, no floats).
"""

from __future__ import annotations

import math

__all__ = ["native_zoom", "tile_ranges", "tile_window"]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def native_zoom(w: int, h: int, tile_size: int = 256) -> int:
    """Smallest zoom whose tile grid holds the raster at native
    resolution: max over axes of ceil(log2(dim/tile_size))."""
    kx = (_ceil_div(w, tile_size) - 1).bit_length()
    ky = (_ceil_div(h, tile_size) - 1).bit_length()
    return max(0, kx, ky)


def tile_ranges(w: int, h: int, tile_size: int = 256):
    """Per zoom 0..nativezoom: (tsize_px, tminx, tminy, tmaxx, tmaxy)
    — tsize is the source-pixel span of one tile at that zoom."""
    nz = native_zoom(w, h, tile_size)
    out = []
    for tz in range(nz + 1):
        tsize = (1 << (nz - tz)) * tile_size
        out.append((tsize, 0, 0,
                    _ceil_div(w, tsize) - 1, _ceil_div(h, tsize) - 1))
    return out


def tile_window(tx: int, ty: int, tz: int, w: int, h: int,
                tile_size: int = 256, xyz: bool = False):
    """Source read window + in-tile write window for a raster-profile
    tile: (rx, ry, rxsize, rysize, wx, wy, wxsize, wysize), mirroring
    gdal2tiles:2889-2921 (remainder edge tiles, TMS bottom-origin y
    unless xyz)."""
    nz = native_zoom(w, h, tile_size)
    if not 0 <= tz <= nz:
        raise ValueError(f"zoom {tz} outside 0..{nz}")
    tsize = (1 << (nz - tz)) * tile_size
    tmaxx = _ceil_div(w, tsize) - 1
    tmaxy = _ceil_div(h, tsize) - 1
    if not (0 <= tx <= tmaxx and 0 <= ty <= tmaxy):
        raise ValueError("tile outside the grid")

    rx = tx * tsize
    rxsize = (w % tsize) if tx == tmaxx else 0
    if rxsize == 0:
        rxsize = tsize
    ry = ty * tsize
    rysize = (h % tsize) if ty == tmaxy else 0
    if rysize == 0:
        rysize = tsize
    wx, wy = 0, 0
    wxsize = int(rxsize / float(tsize) * tile_size)
    wysize = int(rysize / float(tsize) * tile_size)
    if not xyz:
        ry = h - (ty * tsize) - rysize
        if wysize != tile_size:
            wy = tile_size - wysize
    return rx, ry, rxsize, rysize, wx, wy, wxsize, wysize
