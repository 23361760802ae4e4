"""EHdr (ESRI BIL) + ENVI raw raster drivers — flat binary rasters
described by a sidecar text header.

Reference: frmts/ehdr/ehdrdataset.cpp (key/value .hdr: NROWS/NCOLS/
NBANDS/NBITS/PIXELTYPE/BYTEORDER/LAYOUT/ULXMAP/ULYMAP/XDIM/YDIM or the
ArcInfo cellsize/xllcorner variant) and frmts/raw/envidataset.cpp
(ENVI .hdr: samples/lines/bands/data type/interleave/byte order/
header offset/map info).

Golden parity (tests/test_ehdr.py): the reference's own fixtures
ehdr10.bil → checksum 8202 (autotest/gdrivers/ehdr.py:186),
float32.bil → 27 (:54), ENVI aea.dat → 14823 (envi.py:34).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_ehdr", "encode_ehdr", "decode_envi"]

_ENVI_DTYPES = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
                5: np.float64, 12: np.uint16, 13: np.uint32,
                14: np.int64, 15: np.uint64}


def _deinterleave(raw: np.ndarray, rows: int, cols: int, bands: int,
                  layout: str) -> np.ndarray:
    """raw flat array → (rows, cols, bands)."""
    layout = layout.lower()
    if layout == "bip":
        return raw.reshape(rows, cols, bands)
    if layout == "bil":
        return raw.reshape(rows, bands, cols).transpose(0, 2, 1)
    if layout == "bsq":
        return raw.reshape(bands, rows, cols).transpose(1, 2, 0)
    raise ValueError(f"unknown interleave {layout!r}")


def decode_ehdr(hdr_text: str, data: bytes):
    """ESRI .hdr + flat binary → (pixels (h, w[, b]), geotransform,
    nodata). Handles both the NBITS/PIXELTYPE form and the ArcInfo
    cellsize/xllcorner form (ehdrdataset.cpp accepts both)."""
    kv = {}
    for line in hdr_text.splitlines():
        parts = line.split()
        if len(parts) >= 2:
            kv[parts[0].lower()] = " ".join(parts[1:])
    rows = int(kv["nrows"])
    cols = int(kv["ncols"])
    bands = int(kv.get("nbands", 1))
    ptype = kv.get("pixeltype", "").upper()
    nbits = int(kv["nbits"]) if "nbits" in kv else -1
    if nbits == -1 and not ptype:
        # NBITS absent: infer the item size from the file size, and a
        # 4-byte item implies FLOAT (ehdrdataset.cpp:1145-1165)
        nbytes = len(data) // (rows * cols * bands)
        if 0 < nbytes <= 8 and nbytes != 3:
            nbits = nbytes * 8
        if nbytes == 4:
            ptype = "FLOAT"
    if nbits == -1:
        nbits = 32 if ptype == "FLOAT" else 8
    if ptype == "FLOAT":
        dt = np.float32 if nbits == 32 else np.float64
    elif ptype == "SIGNEDINT":
        dt = {8: np.int8, 16: np.int16, 32: np.int32}[nbits]
    else:
        dt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[nbits]
    bo = kv.get("byteorder", "I").lower()
    big = bo.startswith("m")          # M / msbfirst; I / lsbfirst = LE
    dtype = np.dtype(dt).newbyteorder(">" if big else "<")
    raw = np.frombuffer(data, dtype, rows * cols * bands)
    px = _deinterleave(raw.astype(dt), rows, cols, bands,
                       kv.get("layout", "bil"))
    # georeferencing: ULXMAP/ULYMAP are CENTER of the UL pixel
    # (ehdrdataset.cpp); xllcorner is the CORNER of the LL pixel
    if "ulxmap" in kv:
        xd = float(kv.get("xdim", 1.0))
        yd = float(kv.get("ydim", 1.0))
        gt = (float(kv["ulxmap"]) - xd / 2, xd, 0.0,
              float(kv["ulymap"]) + yd / 2, 0.0, -yd)
    elif "xllcorner" in kv:
        cs = float(kv.get("cellsize", 1.0))
        gt = (float(kv["xllcorner"]), cs, 0.0,
              float(kv["yllcorner"]) + rows * cs, 0.0, -cs)
    else:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    nodata = float(kv["nodata"]) if "nodata" in kv else None
    return (px[:, :, 0] if bands == 1 else px), gt, nodata


def encode_ehdr(px: np.ndarray, geotransform=None, *,
                nodata=None, layout: str = "bil"):
    """→ (hdr_text, data_bytes): little-endian flat binary + .hdr."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    rows, cols, bands = px.shape
    dt = px.dtype
    if np.issubdtype(dt, np.floating):
        ptype, nbits = "FLOAT", dt.itemsize * 8
    elif np.issubdtype(dt, np.signedinteger):
        ptype, nbits = "SIGNEDINT", dt.itemsize * 8
    else:
        ptype, nbits = "UNSIGNEDINT", dt.itemsize * 8
    lay = layout.lower()
    if lay == "bil":
        flat = px.transpose(0, 2, 1)
    elif lay == "bsq":
        flat = px.transpose(2, 0, 1)
    else:
        flat = px
    data = np.ascontiguousarray(flat).astype(
        np.dtype(dt).newbyteorder("<")).tobytes()
    hdr = [f"NROWS {rows}", f"NCOLS {cols}", f"NBANDS {bands}",
           f"NBITS {nbits}", f"PIXELTYPE {ptype}", "BYTEORDER I",
           f"LAYOUT {lay.upper()}"]
    if geotransform is not None:
        gt = geotransform
        hdr += [f"ULXMAP {gt[0] + gt[1] / 2!r}",
                f"ULYMAP {gt[3] + gt[5] / 2!r}",
                f"XDIM {gt[1]!r}", f"YDIM {-gt[5]!r}"]
    if nodata is not None:
        hdr.append(f"NODATA {nodata!r}")
    return "\n".join(hdr) + "\n", data


def decode_envi(hdr_text: str, data: bytes):
    """ENVI .hdr + flat binary → (pixels, geotransform). Header fields
    per envidataset.cpp; map info gives the UL corner + pixel size."""
    if not hdr_text.lstrip().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    # fold continued { ... } blocks onto one line
    text = hdr_text.replace("\r", "")
    merged, buf = [], ""
    for line in text.splitlines():
        buf = (buf + " " + line.strip()).strip() if buf else line.strip()
        if buf.count("{") > buf.count("}"):
            continue
        merged.append(buf)
        buf = ""
    kv = {}
    for line in merged:
        if "=" in line:
            k, _, v = line.partition("=")
            kv[k.strip().lower()] = v.strip()
    cols = int(kv["samples"])
    rows = int(kv["lines"])
    bands = int(kv.get("bands", 1))
    dt = _ENVI_DTYPES[int(kv["data type"])]
    off = int(kv.get("header offset", 0))
    big = kv.get("byte order", "0").strip() == "1"
    dtype = np.dtype(dt).newbyteorder(">" if big else "<")
    raw = np.frombuffer(data, dtype, rows * cols * bands, off)
    px = _deinterleave(raw.astype(dt), rows, cols, bands,
                       kv.get("interleave", "bsq"))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    mi = kv.get("map info")
    if mi:
        parts = [p.strip() for p in mi.strip("{}").split(",")]
        # name, ref_px, ref_ln (1-based), ulx, uly, xres, yres, ...
        refx, refy = float(parts[1]), float(parts[2])
        ulx, uly = float(parts[3]), float(parts[4])
        xres, yres = float(parts[5]), float(parts[6])
        gt = (ulx - (refx - 1) * xres, xres, 0.0,
              uly + (refy - 1) * yres, 0.0, -yres)
    return (px[:, :, 0] if bands == 1 else px), gt
