"""Racurs PHOTOMOD PRF / x-dem tiled-raster reader.

A ``.prf`` (megatiff) or ``.x-dem`` dataset is a small ``phini`` XML
file naming a sibling directory of TIFF tiles: each ``<x n="name_r_c">``
element carries Width/Height/DispX/DispY (and Scale for pyramid
levels).  Scale==0 tiles mosaic the base image; Scale>0 entries are
reduced-resolution overviews (one file per level under the same part
directory).  Semantics from the reference driver
frmts/prf/phprfdataset.cpp (ParseGeoref:229-264 — GeoRef A_0..B_2 with
the one-line Y shift ``yorig -= yrot + yscale``; x-dem extent
geotransform with half-pixel centering at :560-590; parts_ext
override, ChannelsInfo typing, BadZ nodata, DemShift offset).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["decode_prf"]


def _pairs(elt):
    """phini n/v attribute convention: <i n="Width" v="201"/>."""
    return elt.get("n"), elt.get("v")


def _dtype(channels_info) -> np.dtype:
    typ, size = "U", 1
    for item in channels_info:
        n, v = _pairs(item)
        if n == "type":
            typ = v
        elif n == "bytes_ps":
            size = int(v)
    if typ == "U":
        return {1: np.dtype(np.uint8), 2: np.dtype(np.uint16),
                4: np.dtype(np.uint32)}[size]
    if typ == "F":
        return {4: np.dtype(np.float32), 8: np.dtype(np.float64)}[size]
    raise ValueError(f"PRF channel type {typ!r} unsupported")


def _read_tile(path: str) -> np.ndarray:
    head = open(path, "rb").read(16)
    if head.lstrip().startswith(b"<VRT"):
        from ..sources.vrt import read_vrt
        return np.asarray(read_vrt(path).pixels)
    from .gtiff import decode_gtiff
    return np.asarray(decode_gtiff(open(path, "rb").read()).pixels)


def decode_prf(path: str, overview: int | None = None):
    """→ (pixels, geotransform | None, nodata | None, meta).

    meta carries ``overviews`` as a list of (width, height) per level;
    ``overview=k`` returns that level's pixels instead of the base."""
    ext = os.path.splitext(path)[1].lower()
    is_dem = ext == ".x-dem"
    root = ET.parse(path).getroot()
    if root.tag != "phini":
        raise ValueError("not a phini document")

    ints: dict[str, int] = {}
    floats: dict[str, float] = {}
    parts_ext = ".demtif" if is_dem else ".tif"
    georef = None
    dem_shift = None
    dtype = None
    tiles = []          # (name, w, h, dx, dy, scale)
    for elt in root:
        n, v = _pairs(elt)
        if elt.tag == "i" and n and v is not None:
            ints[n] = int(v)
        elif elt.tag == "d" and n and v is not None:
            floats[n] = float(v)
        elif elt.tag == "s" and n == "parts_ext":
            parts_ext = "." + v
        elif elt.tag == "x" and n == "ChannelsInfo":
            dtype = _dtype(elt)
        elif elt.tag == "x" and n == "GeoRef":
            georef = {_pairs(c)[0]: float(_pairs(c)[1]) for c in elt
                      if c.get("v") is not None}
        elif elt.tag == "x" and n == "DemShift":
            dem_shift = {_pairs(c)[0]: float(_pairs(c)[1]) for c in elt
                         if c.get("v") is not None}
        elif elt.tag == "x" and n:
            t = {"Width": 0, "Height": 0, "DispX": 0, "DispY": 0,
                 "Scale": 0}
            for item in elt:
                k, val = _pairs(item)
                if k in t and val is not None:
                    t[k] = int(val)
            if t["Width"] and t["Height"]:
                tiles.append((n, t["Width"], t["Height"],
                              t["DispX"], t["DispY"], t["Scale"]))

    w, h = ints.get("Width", 0), ints.get("Height", 0)
    nbands = ints.get("QChans", 1)
    if not (w > 0 and h > 0 and nbands > 0) or dtype is None:
        raise ValueError("PRF header incomplete")

    parts_dir = os.path.join(os.path.dirname(path),
                             os.path.splitext(os.path.basename(path))[0])

    base = [t for t in tiles if t[5] == 0]
    pyramids = [t for t in tiles if t[5] != 0]
    pyramids.sort(key=lambda t: t[5])

    def _mosaic(entries, ow, oh):
        px = np.zeros((oh, ow) if nbands == 1 else (oh, ow, nbands),
                      dtype=dtype)
        for name, tw, th, dx, dy, _ in entries:
            tp = os.path.join(parts_dir, name + parts_ext)
            if not os.path.exists(tp):
                continue
            tile = _read_tile(tp)
            tile = tile[:th, :tw]
            px[dy:dy + tile.shape[0], dx:dx + tile.shape[1]] = tile
        return px

    meta: dict = {"driver": "PRF",
                  "overviews": [(t[1], t[2]) for t in pyramids]}

    if overview is not None:
        name, ow, oh, dx, dy, _ = pyramids[overview]
        px = _mosaic([(name, ow, oh, 0, 0, 0)], ow, oh)
    else:
        px = _mosaic(base, w, h)

    gt = None
    nodata = None
    if not is_dem:
        if georef and all(k in georef for k in
                          ("A_0", "A_1", "A_2", "B_0", "B_1", "B_2")):
            # yorig -= 1 row of (yrot + yscale): phprfdataset.cpp:258
            gt = (georef["A_0"], georef["A_1"], georef["A_2"],
                  georef["B_0"] - georef["B_1"] - georef["B_2"],
                  georef["B_1"], georef["B_2"])
    else:
        meta["units"] = "m"
        if all(k in floats for k in ("XR_0", "XR_1", "YR_0", "YR_1")) \
                and w > 1 and h > 1:
            xscale = (floats["XR_1"] - floats["XR_0"]) / (w - 1)
            yscale = (floats["YR_0"] - floats["YR_1"]) / (h - 1)
            x0 = floats["XR_0"] - 0.5 * xscale
            y0 = floats["YR_1"] - 0.5 * yscale
            if dem_shift:
                x0 += dem_shift.get("x", 0.0)
                y0 += dem_shift.get("y", 0.0)
            gt = (x0, xscale, 0.0, y0, 0.0, yscale)
        if "ZR_0" in floats and "ZR_1" in floats:
            meta["STATISTICS_MINIMUM"] = floats["ZR_0"]
            meta["STATISTICS_MAXIMUM"] = floats["ZR_1"]
        if "BadZ" in floats:
            nodata = floats["BadZ"]
        if dem_shift and dem_shift.get("z"):
            meta["offset"] = dem_shift["z"]

    prj = os.path.splitext(path)[0] + ".prj"
    if os.path.exists(prj):
        meta["crs"] = open(prj).read().strip()
    return px, gt, nodata, meta
