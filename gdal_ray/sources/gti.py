"""GDAL Raster Tile Index (GTI) reader.

A ``.gti.gpkg`` dataset is a GeoPackage VECTOR layer whose features
carry a ``location`` path to a tile raster plus the tile's extent
polygon; layer-level metadata items (stored as a
GDALMultiDomainMetadata XML blob in ``gpkg_metadata``) override the
mosaic grid (RESX/RESY, XSIZE/YSIZE/GEOTRANSFORM), the location field
name (LOCATION_FIELD), band layout (BAND_COUNT/DATA_TYPE/NODATA) and
compositing order (SORT_FIELD / SORT_FIELD_ASC).  Semantics from the
reference driver frmts/gti/gdaltileindexdataset.cpp: grid origin =
(layer MinX, layer MaxY), size = ceil(extent/res) with res defaulting
to the first tile's (:1858-1915); sources sorted ascending by
SORT_FIELD with the LAST source the most-priority one (:4630-4808) —
i.e. paint in sorted order, later tiles overwrite.

Tiles whose grids are not aligned with the mosaic grid are placed by
nearest-neighbour index arithmetic (the reference warps through VRT
sources; for the identity-CRS case nearest placement is exact on
aligned grids and the documented approximation otherwise).
"""

from __future__ import annotations

import math
import os
import re
import sqlite3

import numpy as np

__all__ = ["decode_gti"]


def _layer_metadata(path: str) -> dict[str, str]:
    """MDI key/value items from gpkg_metadata's
    GDALMultiDomainMetadata payload (default domain only)."""
    md: dict[str, str] = {}
    try:
        db = sqlite3.connect(path)
        rows = db.execute("SELECT metadata FROM gpkg_metadata").fetchall()
        db.close()
    except sqlite3.Error:
        return md
    for (blob,) in rows:
        if not isinstance(blob, str) or "<MDI" not in blob:
            continue
        for m in re.finditer(r'<MDI key="([^"]+)">([^<]*)</MDI>', blob):
            md[m.group(1)] = m.group(2)
    return md


def decode_gti(path: str):
    """→ (pixels (h, w[, b]), geotransform, nodata, meta)."""
    from ..sources.gpkg import read_gpkg
    from .raster import read_raster

    t = read_gpkg(path)
    md = _layer_metadata(path)
    loc_field = md.get("LOCATION_FIELD", "location")
    if loc_field not in t.column_names:
        raise ValueError(f"GTI index has no {loc_field!r} field")

    cols = t.to_pydict()
    n = t.num_rows
    if n == 0:
        raise ValueError("empty GTI index")

    order = list(range(n))
    sort_field = md.get("SORT_FIELD")
    if sort_field and sort_field in cols:
        asc = md.get("SORT_FIELD_ASC", "YES").upper() not in ("NO", "FALSE",
                                                              "0")
        keyvals = cols[sort_field]
        order.sort(key=lambda i: (keyvals[i] is None, keyvals[i]),
                   reverse=not asc)

    base = os.path.dirname(os.path.abspath(path))

    def _resolve(loc: str) -> str:
        return loc if os.path.isabs(loc) else os.path.join(base, loc)

    # first openable tile fixes resolution / dtype / band count
    first = None
    for i in order:
        p = _resolve(cols[loc_field][i])
        if os.path.exists(p):
            first = read_raster(p)
            break
    if first is None:
        raise ValueError("no GTI tile could be opened")
    fpx, fgt, fnodata, fmeta = first
    if fgt is None:
        raise ValueError("GTI tiles must be georeferenced")

    resx = float(md["RESX"]) if "RESX" in md else fgt[1]
    resy = abs(float(md["RESY"])) if "RESY" in md else abs(fgt[5])
    if resx <= 0 or resy <= 0:
        raise ValueError("RESX metadata item must be > 0")

    minx = min(cols["minx"])
    miny = min(cols["miny"])
    maxx = max(cols["maxx"])
    maxy = max(cols["maxy"])
    if "MINX" in md:
        minx = float(md["MINX"])
    if "MINY" in md:
        miny = float(md["MINY"])
    if "MAXX" in md:
        maxx = float(md["MAXX"])
    if "MAXY" in md:
        maxy = float(md["MAXY"])

    w = math.ceil((maxx - minx) / resx - 1e-9)
    h = math.ceil((maxy - miny) / resy - 1e-9)
    if not (0 < w < 2**31 and 0 < h < 2**31):
        raise ValueError("Too small RESX, or wrong layer extent")
    gt = (minx, resx, 0.0, maxy, 0.0, -resy)

    nbands = int(md.get("BAND_COUNT",
                        fpx.shape[2] if fpx.ndim == 3 else 1))
    nodata = float(md["NODATA"]) if "NODATA" in md else fnodata
    dtype = np.dtype(md["DATA_TYPE"].lower()) if "DATA_TYPE" in md \
        else fpx.dtype

    shape = (h, w) if nbands == 1 else (h, w, nbands)
    out = np.full(shape, nodata if nodata is not None else 0, dtype=dtype)

    for i in order:
        p = _resolve(cols[loc_field][i])
        if not os.path.exists(p):
            continue
        tpx, tgt, tnd, _ = read_raster(p)
        if tgt is None:
            continue
        th, tw = tpx.shape[:2]
        # dst pixel range covered by this tile
        x0 = int(round((tgt[0] - minx) / resx))
        y0 = int(round((maxy - tgt[3]) / resy))
        x1 = int(round((tgt[0] + tw * tgt[1] - minx) / resx))
        y1 = int(round((maxy - (tgt[3] + th * tgt[5])) / resy))
        cx0, cy0 = max(x0, 0), max(y0, 0)
        cx1, cy1 = min(x1, w), min(y1, h)
        if cx1 <= cx0 or cy1 <= cy0:
            continue
        # nearest src index per dst pixel (exact when grids align)
        dxc = minx + (np.arange(cx0, cx1) + 0.5) * resx
        dyc = maxy - (np.arange(cy0, cy1) + 0.5) * resy
        sx = np.clip(((dxc - tgt[0]) / tgt[1]).astype(np.int64), 0, tw - 1)
        sy = np.clip(((dyc - tgt[3]) / tgt[5]).astype(np.int64), 0, th - 1)
        block = tpx[np.ix_(sy, sx)]
        if nbands == 1 and block.ndim == 3:
            block = block[:, :, 0]
        elif nbands > 1 and block.ndim == 2:
            block = np.repeat(block[:, :, None], nbands, axis=2)
        elif nbands > 1 and block.shape[2] != nbands:
            block = block[:, :, :nbands]
        if tnd is not None:
            mask = np.all(block == tnd, axis=2) if block.ndim == 3 \
                else block == tnd
            dst = out[cy0:cy1, cx0:cx1]
            dst[~mask] = block[~mask]
            out[cy0:cy1, cx0:cx1] = dst
        else:
            out[cy0:cy1, cx0:cx1] = block

    meta = {"driver": "GTI", "n_tiles": n}
    if "crs" in fmeta:
        meta["crs"] = fmeta["crs"]
    if "SRS" in md:
        meta["crs"] = md["SRS"]
    return out, gt, nodata, meta
