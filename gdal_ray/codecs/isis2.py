"""USGS ISIS2 cube reader (PDS-style PVL label + QUBE object).

Reference semantics: frmts/pds/isis2dataset.cpp — SFDU/PDS PVL label
with ``^QUBE`` record pointer (RECORD_BYTES-sized records, 1-based),
AXIS_NAME order → BSQ/BIL/BIP, CORE_ITEMS/CORE_ITEM_BYTES/
CORE_ITEM_TYPE (SUN/MSB vs PC/LSB/VAX byte order, UNSIGNED vs signed),
side/bottom SUFFIX_ITEMS padding, CORE_BASE/CORE_MULTIPLIER as
offset/scale, CORE_NULL (16#…# big-endian hex floats) as nodata, and
QUBE.IMAGE_MAP_PROJECTION georeferencing with the driver's
float32-truncated offsets (isis2dataset.cpp:355-385: ul = float(off)
* dim - dim/2) and the PDS projection catalog.

Golden parity (tests/test_isis2.py): the reference's own
autotest/gdrivers/isis2.py — arvidson_original_truncated.cub
checksum 382, its geotransform to 1e-8, and the simple-cylindrical
Venus sphere SRS.
"""

from __future__ import annotations

import numpy as np

from .pds import _hex_float, _proj_string
from .pvl import clean, parse_pvl

__all__ = ["decode_isis2"]


def _get(kw: dict, key: str, default: str = "") -> str:
    v = kw.get(key, default)
    return clean(v).split("<")[0].strip() if v else default


def _num(kw: dict, key: str, default: float = 0.0) -> float:
    v = _get(kw, key)
    try:
        return float(v)
    except ValueError:
        return default


def _items(kw: dict, key: str) -> list[int]:
    v = kw.get(key, "")
    return [int(float(x)) for x in
            v.strip().lstrip("(").rstrip(")").split(",") if x.strip()]


def decode_isis2(path: str):
    """ISIS2 cube → (pixels (h, w[, bands]), geotransform | None,
    nodata, meta)."""
    buf = open(path, "rb").read()
    head = buf[:32768].decode("latin-1", "replace")
    if "QUBE" not in head:
        raise ValueError("not an ISIS2 cube (no QUBE object)")
    kw = parse_pvl(buf[: _label_end(buf)].decode("latin-1", "replace"))
    if "^QUBE" not in kw:
        raise ValueError("not an ISIS2 cube (no ^QUBE pointer)")

    record_bytes = int(_num(kw, "RECORD_BYTES", 512.0))
    qube_rec = int(_num(kw, "^QUBE", 1.0))
    off = (qube_rec - 1) * record_bytes

    axes = _get(kw, "QUBE.AXIS_NAME").upper().replace(" ", "")
    org = {"(SAMPLE,LINE,BAND)": "BSQ", "(SAMPLE,BAND,LINE)": "BIL",
           "(BAND,SAMPLE,LINE)": "BIP"}.get(
        kw.get("QUBE.AXIS_NAME", "(SAMPLE,LINE,BAND)")
        .replace(" ", "") or "(SAMPLE,LINE,BAND)", None)
    if org is None and axes:
        raise ValueError(f"ISIS2 axis order {axes} not supported")
    org = org or "BSQ"

    items = _items(kw, "QUBE.CORE_ITEMS")
    if len(items) != 3:
        raise ValueError("ISIS2 QUBE.CORE_ITEMS missing")
    if org == "BSQ":
        ns, nl, nb = items
    elif org == "BIL":
        ns, nb, nl = items
    else:
        nb, ns, nl = items

    ib = int(_num(kw, "QUBE.CORE_ITEM_BYTES", 1.0))
    itype = _get(kw, "QUBE.CORE_ITEM_TYPE").upper()
    msb = any(t in itype for t in ("SUN", "MSB", "IEEE"))
    if "REAL" in itype:
        code = {4: "f4", 8: "f8"}[ib]
    elif "UNSIGNED" in itype:
        code = {1: "u1", 2: "u2", 4: "u4"}[ib]
    else:
        code = {1: "u1", 2: "i2", 4: "i4"}[ib]
    dt = np.dtype((">" if msb else "<") + code)

    sfx = _items(kw, "QUBE.SUFFIX_ITEMS") or [0, 0, 0]
    sfx_bytes = int(_num(kw, "QUBE.SUFFIX_BYTES", 4.0))
    # rows are stored along axis-1 of the storage order; side suffix
    # pads each row, plane suffix pads each axis-2 block
    n1 = {"BSQ": ns, "BIL": ns, "BIP": nb}[org]
    n2 = {"BSQ": nl, "BIL": nb, "BIP": ns}[org]
    n3 = {"BSQ": nb, "BIL": nl, "BIP": nl}[org]
    row_stride = n1 * ib + sfx[0] * sfx_bytes
    block_rows = n2 + sfx[1]
    need = off + row_stride * block_rows * n3
    if need > len(buf):                       # truncated: zero-pad
        buf = buf + b"\x00" * (need - len(buf))
    grid = np.frombuffer(buf, "u1", row_stride * block_rows * n3, off) \
        .reshape(n3, block_rows, row_stride)
    flat = np.ascontiguousarray(grid[:, :n2, :n1 * ib]) \
        .reshape(-1).view(dt)
    if org == "BSQ":
        core = flat.reshape(nb, nl, ns)
    elif org == "BIL":
        core = flat.reshape(nl, nb, ns).transpose(1, 0, 2)
    else:                                     # BIP
        core = flat.reshape(nl, ns, nb).transpose(2, 0, 1)
    px = core[0] if nb == 1 else np.moveaxis(core, 0, -1)
    px = np.ascontiguousarray(px.astype(dt.newbyteorder("="),
                                        copy=False))

    meta: dict = {"driver": "ISIS2",
                  "offset": _num(kw, "QUBE.CORE_BASE", 0.0),
                  "scale": _num(kw, "QUBE.CORE_MULTIPLIER", 1.0)}
    target = _get(kw, "QUBE.TARGET_NAME") or \
        _get(kw, "QUBE.IMAGE_MAP_PROJECTION.TARGET_NAME")
    if target:
        meta["TARGET_NAME"] = target

    nodata = None
    nv = _get(kw, "QUBE.CORE_NULL")
    if nv:
        nodata = _hex_float(nv) if nv.startswith("16#") else \
            float(nv)
        if code in ("u1", "u2", "i2", "i4", "u4") and \
                nodata is not None:
            nodata = float(int(nodata))

    gt, crs = _georef(kw, ns, nl)
    if crs:
        meta["crs"] = crs
    return px, gt, nodata, meta


def _label_end(buf: bytes) -> int:
    """Label text ends at the first END line (before binary data)."""
    n = min(len(buf), 1 << 20)
    import re
    m = re.search(rb"(?m)^\s*END\s*$", buf[:n])
    return m.end() if m else n


def _georef(kw: dict, ns: int, nl: int):
    P = "QUBE.IMAGE_MAP_PROJECTION."
    xdim = ydim = 1.0
    if kw.get(P + "MAP_SCALE"):
        xdim = float(np.float32(_num(kw, P + "MAP_SCALE") * 1000.0))
        ydim = float(np.float32(_num(kw, P + "MAP_SCALE") * -1000.0))
    ulx = uly = 0.5
    if kw.get(P + "SAMPLE_PROJECTION_OFFSET"):
        x = float(np.float32(_num(kw, P + "SAMPLE_PROJECTION_OFFSET")))
        ulx = x * xdim - xdim / 2.0
    if kw.get(P + "LINE_PROJECTION_OFFSET"):
        y = float(np.float32(_num(kw, P + "LINE_PROJECTION_OFFSET")))
        uly = y * ydim - ydim / 2.0
    gt = None
    if (ulx, uly, xdim, ydim) != (0.5, 0.5, 1.0, 1.0):
        gt = (ulx, xdim, 0.0, uly, 0.0, ydim)

    name = _get(kw, P + "MAP_PROJECTION_TYPE").replace(" ", "_") \
        .upper()
    crs = None
    if name:
        lat0 = _num(kw, P + "CENTER_LATITUDE")
        lon0 = _num(kw, P + "CENTER_LONGITUDE")
        sp1 = _num(kw, P + "FIRST_STANDARD_PARALLEL")
        sp2 = _num(kw, P + "SECOND_STANDARD_PARALLEL")
        base = _proj_string(name, lat0, lon0, sp1, sp2, kw, "", 1.0)
        if base is not None:
            a = _num(kw, P + "A_AXIS_RADIUS") * 1000.0
            c = _num(kw, P + "C_AXIS_RADIUS", a / 1000.0) * 1000.0
            spherical = name in (
                "SIMPLE_CYLINDRICAL", "EQUIDISTANT", "ORTHOGRAPHIC",
                "STEREOGRAPHIC", "SINUSOIDAL", "EQUIRECTANGULAR")
            if spherical or abs(a - c) < 1e-7:
                ell = f"+R={a:.10g}"
            else:
                ell = f"+a={a:.10g} +b={c:.10g}"
            crs = f"{base} {ell} +units=m +no_defs"
    return gt, crs
