"""USGS ISIS3 cube (.cub / detached .lbl) reader.

Reference semantics: frmts/pds/isis3dataset.cpp — PVL label with
``IsisCube.Core``: StartByte (1-based), optional detached ``^Core``
payload, Format = Tile (TileSamples×TileLines, full tiles stored
band-major then tile-row-major), BandSequential, or GeoTIFF
(delegated open), Pixels.Type (UnsignedByte/UnsignedWord/SignedWord/
Real) with Lsb/Msb ByteOrder and Base/Multiplier exposed as
offset/scale, special-pixel NULL constants per type, and Mapping →
geotransform (UpperLeftCornerX/Y + PixelResolution, no half-pixel
shift) plus the projection-name → proj-string mapping with ISIS's
sphere rules (Equirectangular uses the a·b/meanRadius local radius;
PointPerspective maps to nsper with h = Distance·1000 − a;
ObliqueCylindrical flips the ISIS pole convention into PROJ ob_tran).

Golden parity (tests/test_isis3.py): the reference's own
autotest/gdrivers/isis.py — detached lbl checksum 9978 + its gt and
local-radius SRS, isis3_unit_test.cub 42403 (128×128 tiles,
SignedWord, Base/Multiplier), GeoTIFF-payload lbl 9978, the
point-perspective and oblique-cylindrical proj strings.
"""

from __future__ import annotations

import math
import os

import numpy as np

from .pvl import clean, parse_pvl

__all__ = ["decode_isis3"]

NULL1 = 0.0
NULLU2 = 0.0
NULL2 = -32768.0
NULL4 = float(np.float32(-3.4028226550889045e+38))

_TYPES = {
    "UNSIGNEDBYTE": ("u1", NULL1),
    "UNSIGNEDWORD": ("u2", NULLU2),
    "SIGNEDWORD": ("i2", NULL2),
    "REAL": ("f4", NULL4),
    "": ("f4", NULL4),
}


def _get(kw: dict, key: str, default: str = "") -> str:
    v = kw.get(key, default)
    return clean(v).split("<")[0].strip() if v else default


def _num(kw: dict, key: str, default: float = 0.0) -> float:
    v = _get(kw, key)
    try:
        return float(v)
    except ValueError:
        return default


def decode_isis3(path: str):
    """ISIS3 cube → (pixels (h, w[, bands]), geotransform | None,
    nodata, meta)."""
    raw_head = open(path, "rb").read(1 << 20)
    if not raw_head.lstrip()[:6] in (b"Object",):
        raise ValueError("not an ISIS3 label (no leading Object)")
    kw = parse_pvl(raw_head.decode("latin-1", "replace"))
    if "IsisCube.Core.Dimensions.Samples" not in kw:
        raise ValueError("not an ISIS3 cube (no IsisCube.Core)")

    core_ref = _get(kw, "IsisCube.Core.^Core")
    directory = os.path.dirname(path)
    qube = os.path.join(directory, core_ref) if core_ref else path

    start = int(_num(kw, "IsisCube.Core.StartByte", 1.0))
    skip = start - 1 if start > 1 else 0

    fmt = _get(kw, "IsisCube.Core.Format")
    cols = int(_num(kw, "IsisCube.Core.Dimensions.Samples"))
    rows = int(_num(kw, "IsisCube.Core.Dimensions.Lines"))
    bands = int(_num(kw, "IsisCube.Core.Dimensions.Bands", 1.0))
    if rows <= 0 or cols <= 0:
        raise ValueError("ISIS3 label missing dimensions")

    ptype = _get(kw, "IsisCube.Core.Pixels.Type").upper()
    if ptype not in _TYPES:
        raise ValueError(f"ISIS3 pixel type {ptype} not supported")
    base_dt, nodata = _TYPES[ptype]
    order = "<" if _get(kw, "IsisCube.Core.Pixels.ByteOrder") \
        .upper() == "LSB" else ">"
    dt = np.dtype(order + base_dt)

    meta: dict = {"driver": "ISIS3",
                  "offset": _num(kw, "IsisCube.Core.Pixels.Base", 0.0),
                  "scale": _num(kw, "IsisCube.Core.Pixels.Multiplier", 1.0)}
    target = _get(kw, "IsisCube.Mapping.TargetName")
    if target:
        meta["TARGET_NAME"] = target

    if fmt.upper() == "GEOTIFF":
        from ..sources.raster import read_raster
        px, _, _, _ = read_raster(qube)
        px = np.asarray(px)
        if px.shape[:2] != (rows, cols):
            raise ValueError(f"{qube} does not match the label dimensions")
    else:
        buf = open(qube, "rb").read()
        if fmt.upper() == "TILE":
            ts = int(_num(kw, "IsisCube.Core.TileSamples"))
            tl = int(_num(kw, "IsisCube.Core.TileLines"))
            if ts <= 0 or tl <= 0:
                raise ValueError("ISIS3 tile dimensions missing")
            tpr = -(-cols // ts)             # tiles per row
            tpc = -(-rows // tl)             # tiles per column
            per_band = tpr * tpc * ts * tl * dt.itemsize
            need = skip + per_band * bands
            if need > len(buf):
                buf = buf + b"\x00" * (need - len(buf))
            grid = np.frombuffer(buf, dt, tpr * tpc * ts * tl * bands,
                                 skip)
            grid = grid.reshape(bands, tpc, tpr, tl, ts)
            # (band, tile-row, tile-col, y, x) → (band, y-full, x-full)
            full = grid.transpose(0, 1, 3, 2, 4).reshape(
                bands, tpc * tl, tpr * ts)
            planes = full[:, :rows, :cols]
        else:                                # BandSequential
            need = skip + rows * cols * bands * dt.itemsize
            if need > len(buf):
                buf = buf + b"\x00" * (need - len(buf))
            planes = np.frombuffer(buf, dt, rows * cols * bands,
                                   skip).reshape(bands, rows, cols)
        px = planes[0] if bands == 1 else np.moveaxis(planes, 0, -1)
        if dt.byteorder == ">":
            px = px.astype(dt.newbyteorder("="))
        px = np.array(px)

    gt = None
    res = _num(kw, "IsisCube.Mapping.PixelResolution")
    ulx = kw.get("IsisCube.Mapping.UpperLeftCornerX")
    uly = kw.get("IsisCube.Mapping.UpperLeftCornerY")
    if res and ulx is not None and uly is not None:
        gt = (_num(kw, "IsisCube.Mapping.UpperLeftCornerX"), res, 0.0,
              _num(kw, "IsisCube.Mapping.UpperLeftCornerY"), 0.0, -res)

    crs = _srs(kw)
    if crs:
        meta["crs"] = crs
    return px, gt, nodata, meta


def _srs(kw: dict) -> str | None:
    name = _get(kw, "IsisCube.Mapping.ProjectionName").upper()
    if not name:
        return None
    a = _num(kw, "IsisCube.Mapping.EquatorialRadius")
    b = _num(kw, "IsisCube.Mapping.PolarRadius")
    lat0 = _num(kw, "IsisCube.Mapping.CenterLatitude")
    lon0 = _num(kw, "IsisCube.Mapping.CenterLongitude")
    sp1 = _num(kw, "IsisCube.Mapping.FirstStandardParallel")
    sp2 = _num(kw, "IsisCube.Mapping.SecondStandardParallel")
    k = _num(kw, "IsisCube.Mapping.scaleFactor", 1.0) or \
        _num(kw, "IsisCube.Mapping.ScaleFactor", 1.0)
    geographic = _get(kw, "IsisCube.Mapping.LatitudeType").upper() != \
        "PLANETOCENTRIC"

    if name in ("EQUIRECTANGULAR", "SIMPLECYLINDRICAL"):
        base = f"+proj=eqc +lat_ts={lat0:.10g} +lat_0=0 +lon_0={lon0:.10g}"
    elif name == "ORTHOGRAPHIC":
        base = f"+proj=ortho +lat_0={lat0:.10g} +lon_0={lon0:.10g}"
    elif name == "SINUSOIDAL":
        base = f"+proj=sinu +lon_0={lon0:.10g}"
    elif name == "MERCATOR":
        base = (f"+proj=merc +lat_ts={lat0:.10g} +lon_0={lon0:.10g} "
                f"+k={k:.10g}")
    elif name == "POLARSTEREOGRAPHIC":
        base = (f"+proj=stere +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+k={k:.10g}")
    elif name == "TRANSVERSEMERCATOR":
        base = (f"+proj=tmerc +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+k={k:.10g}")
    elif name == "LAMBERTCONFORMAL":
        base = (f"+proj=lcc +lat_1={sp1:.10g} +lat_2={sp2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g}")
    elif name == "POINTPERSPECTIVE":
        h = _num(kw, "IsisCube.Mapping.Distance") * 1000.0 - a
        base = (f"+proj=nsper +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+h={h:.10g} +x_0=0 +y_0=0")
    elif name == "OBLIQUECYLINDRICAL":
        pole_lat = _num(kw, "IsisCube.Mapping.PoleLatitude")
        pole_lon = _num(kw, "IsisCube.Mapping.PoleLongitude")
        pole_rot = _num(kw, "IsisCube.Mapping.PoleRotation")
        base = (f"+proj=ob_tran +o_proj=eqc +o_lon_p={-pole_rot:.10g} "
                f"+o_lat_p={180 - pole_lat:.10g} +lon_0={pole_lon:.10g}")
    else:
        return None

    # sphere-vs-ellipsoid per the reference's ISIS-compatible rules
    if name == "POLARSTEREOGRAPHIC":
        ell = _ellipse(a, b) if geographic else f"+R={b:.10g}"
    elif name in ("SIMPLECYLINDRICAL", "ORTHOGRAPHIC", "SINUSOIDAL",
                  "POINTPERSPECTIVE", "OBLIQUECYLINDRICAL"):
        ell = f"+R={a:.10g}"
    elif name == "EQUIRECTANGULAR":
        rad_lat = math.radians(lat0)
        mean = math.hypot(b * math.cos(rad_lat), a * math.sin(rad_lat))
        local = 0.0 if mean == 0.0 else a * b / mean
        ell = f"+R={local:.15g}"
    else:
        ell = _ellipse(a, b) if geographic else f"+R={a:.10g}"
    return f"{base} {ell} +units=m +no_defs"


def _ellipse(a: float, b: float) -> str:
    if abs(a - b) < 1e-7:
        return f"+R={a:.10g}"
    return f"+a={a:.10g} +b={b:.10g}"
