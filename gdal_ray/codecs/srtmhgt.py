"""SRTM HGT raster driver — read + write.

Reference: frmts/srtmhgt/srtmhgtdataset.cpp — raw big-endian int16,
square grid whose size comes from the file size (3601/1801/1201/...,
any perfect square of 2-byte samples), rows north-first; the SW-corner
integer lat/lon comes from the canonical N43W080-style filename;
sample points sit ON grid intersections, so the geotransform is
offset by half a cell and the cell size is 1/(n-1) degrees. Nodata is
-32768 (SRTMHG_NODATA_VALUE).
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

__all__ = ["decode_hgt", "encode_hgt", "hgt_origin_from_name"]

NODATA = -32768.0


def hgt_origin_from_name(path: str) -> tuple[float, float]:
    """'N43W080.hgt' → (lon, lat) of the SW corner sample."""
    m = re.match(r"([NS])(\d{1,2})([EW])(\d{1,3})",
                 os.path.basename(path).upper())
    if not m:
        raise ValueError(f"not a SRTM HGT filename: {path!r}")
    lat = int(m.group(2)) * (1 if m.group(1) == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3) == "E" else -1)
    return float(lon), float(lat)


def decode_hgt(buf: bytes, name: str = "N00E000.hgt"):
    """HGT bytes (+ filename for the SW corner) → (elevations (n, n)
    int16 north-up, geotransform, nodata)."""
    n2 = len(buf) // 2
    n = int(math.isqrt(n2))
    if n * n != n2 or n < 2:
        raise ValueError(f"HGT size {len(buf)} is not a square int16 grid")
    lon, lat = hgt_origin_from_name(name)
    arr = np.frombuffer(buf, ">i2", n * n).reshape(n, n) \
        .astype(np.int16)                     # row 0 = north
    cell = 1.0 / (n - 1)
    gt = (lon - cell / 2, cell, 0.0, lat + 1 + cell / 2, 0.0, -cell)
    return arr, gt, NODATA


def encode_hgt(px: np.ndarray) -> bytes:
    """(n, n) int16 north-up → HGT bytes (the filename carries the
    georeferencing — compute it with the SW corner lat/lon)."""
    px = np.asarray(px)
    if px.ndim != 2 or px.shape[0] != px.shape[1]:
        raise ValueError("HGT stores a square single band")
    return np.ascontiguousarray(px, ">i2").tobytes()
