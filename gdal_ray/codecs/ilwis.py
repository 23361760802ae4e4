"""ILWIS raster maps (.mpr INI header + .mp# raw data), read and
write — frmts/ilwis/ilwisdataset.cpp.

Store types (ILWIS2GDALType): byte->uint8, int->int16, long->int32,
float->float32, real->float64. Georeference from the .grf
GeoRefCorners block (CornersOfCorners: gt spans MinX..MaxX exactly).
Golden in tests/test_rawexotic.py from autotest/gdrivers/ilwis.py
(LanduseSmall.mpr cs 2351, gt (795480, 20, 0, 8090520, 0, -20));
write path round-trips through our own reader like the reference's
testCreateCopy does."""

from __future__ import annotations

import os

import numpy as np

_STORE2DT = {"byte": "u1", "int": "<i2", "long": "<i4",
             "float": "<f4", "real": "<f8"}
_DT2STORE = {"uint8": "Byte", "int16": "Int", "int32": "Long",
             "float32": "Float", "float64": "Real"}


def _read_ini(path: str) -> dict[str, dict[str, str]]:
    sections: dict[str, dict[str, str]] = {}
    cur = None
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            cur = line[1:-1]
            sections[cur] = {}
        elif "=" in line and cur is not None:
            k, v = line.split("=", 1)
            sections[cur][k.strip()] = v.strip()
    return sections


def decode_ilwis(path: str):
    ini = _read_ini(path)
    if "MapStore" not in ini:
        raise ValueError("not an ILWIS raster map (.mpr)")
    store = ini["MapStore"]
    size = ini.get("Map", {}).get("Size", "")
    rows, cols = [int(t) for t in size.split()[:2]]
    dt = _STORE2DT.get(store.get("Type", "Byte").lower())
    if dt is None:
        raise ValueError(f"ILWIS store type {store.get('Type')}")
    dtype = np.dtype(dt)
    if store.get("SwapBytes", "No").lower().startswith("y"):
        dtype = dtype.newbyteorder()
    data_file = store.get("Data", os.path.splitext(
        os.path.basename(path))[0] + ".mp#")
    dpath = os.path.join(os.path.dirname(path) or ".", data_file)
    off = int(store.get("StartOffset", "0"))
    buf = open(dpath, "rb").read()
    need = off + rows * cols * dtype.itemsize
    buf = buf + b"\x00" * max(0, need - len(buf))
    px = np.frombuffer(buf, dtype, rows * cols, off).reshape(rows, cols)

    gt = None
    meta: dict = {"driver": "ILWIS"}
    grf_name = ini.get("Map", {}).get("GeoRef", "")
    if grf_name and grf_name.lower() != "none.grf":
        gpath = os.path.join(os.path.dirname(path) or ".", grf_name)
        if os.path.exists(gpath):
            g = _read_ini(gpath)
            c = g.get("GeoRefCorners", {})
            if c:
                minx = float(c["MinX"])
                miny = float(c["MinY"])
                maxx = float(c["MaxX"])
                maxy = float(c["MaxY"])
                gcols = int(g.get("GeoRef", {}).get("Columns", cols))
                glines = int(g.get("GeoRef", {}).get("Lines", rows))
                # CornersOfCorners=Yes: bounds are outer pixel corners
                gt = (minx, (maxx - minx) / gcols, 0.0,
                      maxy, 0.0, -(maxy - miny) / glines)
            csy_name = g.get("GeoRef", {}).get("CoordSystem", "")
            cpath = os.path.join(os.path.dirname(path) or ".", csy_name)
            if csy_name and os.path.exists(cpath):
                csy = _read_ini(cpath)
                proj = csy.get("CoordSystem", {}).get("Projection", "")
                if proj.lower() == "utm":
                    zone = int(csy.get("Projection", {}).get("Zone", "0"))
                    north = csy.get("Projection", {}).get(
                        "Northern Hemisphere", "Yes").lower().startswith("y")
                    meta["crs"] = f"+proj=utm +zone={zone}" + \
                        ("" if north else " +south") + " +ellps=intl"
    return np.ascontiguousarray(px), gt, None, meta


def encode_ilwis(path: str, px: np.ndarray, gt=None, crs: str = "") -> None:
    """Write <stem>.mpr + <stem>.mp# (+ <stem>.grf when georeferenced)
    in the reference driver's single-band layout."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise ValueError("ILWIS writer handles single-band rasters")
    store = _DT2STORE.get(px.dtype.name)
    if store is None:
        px = px.astype(np.float64)
        store = "Real"
    rows, cols = px.shape
    stem = os.path.splitext(path)[0]
    base = os.path.basename(stem)
    open(stem + ".mp#", "wb").write(
        np.ascontiguousarray(px.astype(px.dtype.newbyteorder("<")))
        .tobytes())
    grf = "none.grf"
    if gt is not None:
        grf = base + ".grf"
        minx = gt[0]
        maxy = gt[3]
        maxx = gt[0] + cols * gt[1]
        miny = gt[3] + rows * gt[5]
        with open(stem + ".grf", "w") as fh:
            fh.write("[Ilwis]\nType=GeoRef\nClass=GeoReference Corners\n"
                     "Version=3.1\n\n[GeoRef]\n"
                     f"Columns={cols}\nLines={rows}\n"
                     "Type=GeoRefCorners\n\n[GeoRefCorners]\n"
                     "CornersOfCorners=Yes\n"
                     f"MinX={minx:.6f}\nMinY={miny:.6f}\n"
                     f"MaxX={maxx:.6f}\nMaxY={maxy:.6f}\n")
    with open(stem + ".mpr", "w") as fh:
        fh.write("[Ilwis]\nType=BaseMap\nClass=Raster Map\nVersion=3.1\n\n"
                 "[BaseMap]\nType=Map\n\n[Map]\n"
                 f"GeoRef={grf}\nSize={rows} {cols}\nType=MapStore\n\n"
                 "[MapStore]\n"
                 f"Data={base}.mp#\nStartOffset=0\n"
                 f"RowLength={cols}\nPixelInterLeaved=No\n"
                 "SwapBytes=No\nStructure=Line\n"
                 f"Type={store}\n")
