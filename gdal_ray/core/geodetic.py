"""TMS Global Geodetic profile — gdal2tiles' Plate Carrée pyramid
(EPSG:4326 "unprojected profile").

Reference: osgeo_utils/gdal2tiles.py class GlobalGeodetic — the
[-180,-90,180,90] area scales to 512×256 px at zoom 0 in the
tmscompatible variant (resFact 180/tile_size, two tiles at level 0,
per the OSGeo TMS spec) or 256×256 (resFact 360/tile_size, one tile,
OpenLayers/WMTS default). Tile coordinates are TMS (origin
bottom-left). All functions vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

TILE_SIZE = 256


def _res_fact(tms_compatible: bool, tile_size: int) -> float:
    return (180.0 if tms_compatible else 360.0) / tile_size


def resolution(zoom: int, *, tms_compatible: bool = True,
               tile_size: int = TILE_SIZE) -> float:
    """Arc-degrees per pixel at `zoom` (GlobalGeodetic.Resolution)."""
    return _res_fact(tms_compatible, tile_size) / 2 ** zoom


def lonlat_to_pixels(lon, lat, zoom: int, *, tms_compatible: bool = True,
                     tile_size: int = TILE_SIZE):
    """(lon, lat) → pyramid pixels (GlobalGeodetic.LonLatToPixels)."""
    res = resolution(zoom, tms_compatible=tms_compatible,
                     tile_size=tile_size)
    return ((180.0 + np.asarray(lon, np.float64)) / res,
            (90.0 + np.asarray(lat, np.float64)) / res)


def pixels_to_tile(px, py, *, tile_size: int = TILE_SIZE):
    """Pixels → covering TMS tile: ceil(p/size) − 1
    (GlobalGeodetic.PixelsToTile — note a point exactly on a tile's
    lower/left edge belongs to the tile BELOW it, unlike mercator's
    floor convention)."""
    tx = (np.ceil(np.asarray(px, np.float64) / float(tile_size))
          - 1).astype(np.int64)
    ty = (np.ceil(np.asarray(py, np.float64) / float(tile_size))
          - 1).astype(np.int64)
    return tx, ty


def lonlat_to_tile(lon, lat, zoom: int, *, tms_compatible: bool = True,
                   tile_size: int = TILE_SIZE):
    px, py = lonlat_to_pixels(lon, lat, zoom,
                              tms_compatible=tms_compatible,
                              tile_size=tile_size)
    return pixels_to_tile(px, py, tile_size=tile_size)


def tile_bounds(tx, ty, zoom: int, *, tms_compatible: bool = True,
                tile_size: int = TILE_SIZE):
    """(lon0, lat0, lon1, lat1) of a TMS tile
    (GlobalGeodetic.TileBounds)."""
    res = resolution(zoom, tms_compatible=tms_compatible,
                     tile_size=tile_size)
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty, np.float64)
    return (tx * tile_size * res - 180.0,
            ty * tile_size * res - 90.0,
            (tx + 1) * tile_size * res - 180.0,
            (ty + 1) * tile_size * res - 90.0)


def zoom_for_pixel_size(pixel_size: float, *, tms_compatible: bool = True,
                        tile_size: int = TILE_SIZE,
                        max_zoom: int = 32) -> int:
    """Maximal scaledown zoom closest to pixel_size
    (GlobalGeodetic.ZoomForPixelSize — never scales up)."""
    for i in range(max_zoom):
        if pixel_size > resolution(i, tms_compatible=tms_compatible,
                                   tile_size=tile_size):
            return max(0, i - 1)
    return max_zoom - 1
