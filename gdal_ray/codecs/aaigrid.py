"""Arc/Info ASCII Grid (AAIGrid) raster driver — read + write.

Reference: frmts/aaigrid/aaigriddataset.cpp — header keys ncols/nrows,
xllcorner|xllcenter + yllcorner|yllcenter (corner vs CELL CENTER
anchoring), cellsize or dx+dy, optional NODATA_value; whitespace-
separated row-major values, north row first. Integer-looking payloads
read as int32, otherwise float64 (the reference sniffs decimals the
same way).

Golden parity (tests/test_aaigrid_dted.py): byte.tif.grd → checksum
4672, pixel_per_line.asc → 1123 (autotest/gdrivers/aaigrid.py:44,136).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_aaigrid", "encode_aaigrid"]


def decode_aaigrid(text: str):
    """AAIGrid text → (pixels (h, w), geotransform, nodata)."""
    toks = text.split()
    kv = {}
    i = 0
    while i + 1 < len(toks):
        key = toks[i].lower()
        if key in ("ncols", "nrows", "xllcorner", "yllcorner",
                   "xllcenter", "yllcenter", "cellsize", "dx", "dy",
                   "nodata_value", "null"):
            kv[key] = toks[i + 1]
            i += 2
        else:
            break
    ncols, nrows = int(kv["ncols"]), int(kv["nrows"])
    data = toks[i:i + ncols * nrows]
    if len(data) < ncols * nrows:
        raise ValueError("AAIGrid data shorter than ncols*nrows")
    is_float = any(("." in d or "e" in d or "E" in d
                    or d.lower() in ("nan", "-nan", "inf", "-inf"))
                   for d in data) or \
        "." in kv.get("nodata_value", "") or \
        kv.get("nodata_value", "").lower() in ("nan", "-nan")
    try:
        arr = np.array(data, np.float64 if is_float else np.int32) \
            .reshape(nrows, ncols)
    except ValueError:
        # locale files with ',' decimal separators (the reference
        # tolerates them: aaigriddataset.cpp CPLAtofM)
        data = [d.replace(",", ".") for d in data]
        arr = np.array(data, np.float64).reshape(nrows, ncols)
    def _num(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return float(str(v).replace(",", "."))

    dx = _num(kv.get("dx", kv.get("cellsize", 1.0)))
    dy = _num(kv.get("dy", kv.get("cellsize", 1.0)))
    if "xllcorner" in kv:
        x0 = _num(kv["xllcorner"])
    elif "xllcenter" in kv:
        x0 = _num(kv["xllcenter"]) - dx / 2
    else:
        x0 = 0.0
    if "yllcorner" in kv:
        yll = _num(kv["yllcorner"])
    elif "yllcenter" in kv:
        yll = _num(kv["yllcenter"]) - dy / 2
    else:
        yll = 0.0
    gt = (x0, dx, 0.0, yll + nrows * dy, 0.0, -dy)
    nodata = None
    if "nodata_value" in kv or "null" in kv:
        nodata = float(kv.get("nodata_value", kv.get("null")))
    return arr, gt, nodata


def encode_aaigrid(px: np.ndarray, geotransform=None,
                   nodata: float | None = None) -> str:
    """(h, w) array → AAIGrid text (xllcorner anchoring; requires a
    north-up square-pixel geotransform unless dx == dy is violated, in
    which case dx/dy keys are written like the reference)."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise ValueError("AAIGrid stores a single band")
    h, w = px.shape
    gt = tuple(float(g) for g in (geotransform or (0, 1, 0, h, 0, -1)))
    if gt[2] or gt[4] or gt[5] >= 0:
        raise ValueError("AAIGrid requires a north-up grid")
    dx, dy = gt[1], -gt[5]
    out = [f"ncols        {w}", f"nrows        {h}",
           f"xllcorner    {gt[0]!r}", f"yllcorner    {gt[3] - h * dy!r}"]
    if dx == dy:
        out.append(f"cellsize     {dx!r}")
    else:
        out.append(f"dx           {dx!r}")
        out.append(f"dy           {dy!r}")
    if nodata is not None:
        out.append(f"NODATA_value {nodata!r}")
    fmt = (lambda v: str(int(v))) if px.dtype.kind in "iu" \
        else (lambda v: repr(float(v)))
    for r in range(h):
        out.append(" ".join(fmt(v) for v in px[r]))
    return "\n".join(out) + "\n"
