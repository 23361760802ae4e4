"""Simple grid formats parsed from their public layouts: GTX, Erdas
LAN/GIS, ERMapper ERS, SAGA, Idrisi RST, Geosoft GXF and FITS.

Each decoder returns ``(pixels, geotransform, nodata, meta)`` like the
other codecs; ``sources/raster.py`` routes by extension. Reference
drivers: frmts/raw/gtxdataset.cpp, frmts/raw/landataset.cpp,
frmts/ers/, frmts/saga/, frmts/idrisi/, frmts/gxf/ (gxfopen.c base-90
decode), frmts/fits/fitsdataset.cpp. Goldens in tests/test_rawgrids.py
come from the reference's own autotest expectations (hydroc1.gtx
64183, fakelan 10, srtm.ers 64074, ers_dem 56588, 4byteFloat 108,
byte.rst 5044, real.rst 5275, small.gxf 90, small2.gxf 65042,
byte_merc.fits 4672).
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np


# --------------------------------------------------------------- GTX
def decode_gtx(buf: bytes):
    """NOAA vertical-datum grid (.gtx): 40-byte big-endian header
    (lat0, lon0, dlat, dlon float64; nrows, ncols int32), float32 rows
    south→north. gtxdataset.cpp; nodata -88.8888."""
    if len(buf) < 40:
        raise ValueError("GTX file too short")
    lat0, lon0, dlat, dlon = struct.unpack_from(">4d", buf, 0)
    nrows, ncols = struct.unpack_from(">2i", buf, 32)
    if not (0 < nrows < 1 << 20 and 0 < ncols < 1 << 20):
        raise ValueError("GTX implausible dimensions")
    px = np.frombuffer(buf, ">f4", count=nrows * ncols,
                       offset=40).reshape(nrows, ncols)
    px = np.ascontiguousarray(px[::-1]).astype(np.float32)  # north-up
    gt = (lon0 - dlon / 2.0, dlon, 0.0,
          lat0 + (nrows - 1) * dlat + dlat / 2.0, 0.0, -dlat)
    return px, gt, -88.8888, {"driver": "GTX", "crs": "EPSG:4326"}


# --------------------------------------------------------- Erdas LAN
def decode_lan(buf: bytes):
    """Erdas 7.x .lan/.gis: 128-byte header ("HEADER" float dims /
    "HEAD74" int dims), pixel type 0=8bit 1=4bit 2=16bit, BIL
    interleave, georef floats at 112-124 (cell centres).
    landataset.cpp; byte order probed via the band-count word."""
    magic = buf[:6]
    if magic not in (b"HEADER", b"HEAD74"):
        raise ValueError("not an Erdas LAN/GIS file")
    (nb_le,) = struct.unpack_from("<h", buf, 8)
    bo = "<" if 0 < nb_le < 256 else ">"
    (ptype,) = struct.unpack_from(bo + "h", buf, 6)
    (nbands,) = struct.unpack_from(bo + "h", buf, 8)
    if magic == b"HEAD74":
        w, h = struct.unpack_from(bo + "2i", buf, 16)
    else:
        fw, fh = struct.unpack_from(bo + "2f", buf, 16)
        w, h = int(fw), int(fh)
    if not (0 < w < 1 << 20 and 0 < h < 1 << 20 and 0 < nbands < 256):
        raise ValueError("LAN implausible dimensions")
    if ptype == 0:
        dt, psz = np.uint8, 1
    elif ptype == 2:
        dt, psz = np.dtype(bo + "i2"), 2
    elif ptype == 1:
        dt, psz = np.uint8, 0                   # 4-bit packed
    else:
        raise ValueError(f"LAN pixel type {ptype} unsupported")
    bands = []
    for b in range(nbands):
        rows = []
        for y in range(h):
            if ptype == 1:
                off = 128 + (y * w * nbands) // 2 + (b * w) // 2
                packed = np.frombuffer(buf, np.uint8,
                                       count=(w + 1) // 2, offset=off)
                line = np.empty(w, np.uint8)
                line[0::2] = packed[:(w + 1) // 2] >> 4
                line[1::2] = packed[:w // 2] & 0x0F
            else:
                off = 128 + y * w * psz * nbands + b * w * psz
                line = np.frombuffer(buf, dt, count=w, offset=off)
            rows.append(line)
        bands.append(np.vstack(rows))
    px = bands[0] if nbands == 1 else np.stack(bands)
    ulx, uly, dx, dy = struct.unpack_from(bo + "4f", buf, 112)
    if dx != 0 and dy != 0:
        gt = (ulx - dx / 2.0, float(dx), 0.0,
              uly + dy / 2.0, 0.0, float(-dy))
    else:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    return px, gt, None, {"driver": "LAN", "pixel_type": int(ptype)}


# ----------------------------------------------------------- ERS
def _ers_tokens(text: str):
    """ERS header items: strip #-comments (outside quotes), return
    {dotted.path: value} plus the raw nested structure."""
    out = {}
    path: list[str] = []
    for rawline in text.splitlines():
        # strip comments respecting quotes
        q = False
        line = ""
        for ch in rawline:
            if ch == '"':
                q = not q
            if ch == "#" and not q:
                break
            line += ch
        line = line.strip()
        if not line:
            continue
        m = re.match(r"(\w+)\s+Begin$", line, re.IGNORECASE)
        if m:
            path.append(m.group(1))
            continue
        m = re.match(r"(\w+)\s+End$", line, re.IGNORECASE)
        if m and path:
            path.pop()
            continue
        if "=" in line:
            k, _, v = line.partition("=")
            key = ".".join(path[1:] + [k.strip()]) if len(path) > 1 \
                else k.strip()
            out.setdefault(key, v.strip().strip('"'))
            # the format is case-insensitive (reference ershdrnode.cpp
            # FindNode); store a lowercase alias for lookups
            out.setdefault(key.lower(), v.strip().strip('"'))
    return out


_ERS_TYPES = {
    "unsigned8bitinteger": np.uint8, "signed8bitinteger": np.int8,
    "unsigned16bitinteger": np.uint16, "signed16bitinteger": np.int16,
    "unsigned32bitinteger": np.uint32, "signed32bitinteger": np.int32,
    "ieee4bytereal": np.float32, "ieee8bytereal": np.float64,
}


def _dms(v: str) -> float:
    parts = v.split(":")
    if len(parts) == 1:
        return float(v)
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    d = abs(float(parts[0]))
    m = float(parts[1]) if len(parts) > 1 else 0.0
    s = float(parts[2]) if len(parts) > 2 else 0.0
    return sign * (d + m / 60.0 + s / 3600.0)


def decode_ers(path: str):
    """ERMapper .ers: ASCII header + companion raw BIL file (same
    name, extension stripped; HeaderOffset skips leading bytes).
    frmts/ers/; registration cell/coord → node-registered origin."""
    hdr = _ers_tokens(open(path, "r", errors="replace").read())

    def _get(key, default=None):
        return hdr.get(key, hdr.get(key.lower(), default))

    w = int(_get("RasterInfo.NrOfCellsPerLine"))
    h = int(_get("RasterInfo.NrOfLines"))
    nbands = int(_get("RasterInfo.NrOfBands", "1"))
    ct = _get("RasterInfo.CellType", "Unsigned8BitInteger")
    dt = _ERS_TYPES.get(ct.lower())
    if dt is None:
        raise ValueError(f"ERS CellType {ct} unsupported")
    dt = np.dtype(dt)
    if hdr.get("ByteOrder", "LSBFirst").lower() == "msbfirst":
        dt = dt.newbyteorder(">")
    off = int(hdr.get("HeaderOffset", "0"))
    datafile = hdr.get("DataFile")
    if datafile:
        dpath = os.path.join(os.path.dirname(path), datafile)
    else:
        dpath = path[:-4] if path.lower().endswith(".ers") else path
    buf = open(dpath, "rb").read()
    n = w * h * nbands
    need = off + n * np.dtype(dt).itemsize
    if len(buf) < need:                        # truncated/empty data
        buf = buf + b"\x00" * (need - len(buf))  # → zero fill
    arr = np.frombuffer(buf, dt, count=n, offset=off) \
        .reshape(h, nbands, w)                 # BIL
    px = np.ascontiguousarray(arr.transpose(1, 0, 2))
    if nbands == 1:
        px = px[0]
    xd = float(_get("RasterInfo.CellInfo.Xdimension", "1"))
    yd = float(_get("RasterInfo.CellInfo.Ydimension", "1"))
    rx = float(_get("RasterInfo.RegistrationCellX", "0"))
    ry = float(_get("RasterInfo.RegistrationCellY", "0"))
    rc = "RasterInfo.RegistrationCoord."
    if rc + "Longitude" in hdr:
        x0 = _dms(hdr[rc + "Longitude"]) - rx * xd
        y0 = _dms(hdr[rc + "Latitude"]) + ry * yd
    elif rc + "Eastings" in hdr:
        x0 = float(hdr[rc + "Eastings"]) - rx * xd
        y0 = float(hdr[rc + "Northings"]) + ry * yd
    else:
        x0, y0 = 0.0, 0.0
    gt = (x0, xd, 0.0, y0, 0.0, -yd)
    nodata = _get("RasterInfo.NullCellValue")
    meta = {"driver": "ERS",
            "datum": hdr.get("CoordinateSpace.Datum"),
            "projection": hdr.get("CoordinateSpace.Projection"),
            "stats": {k.rsplit(".", 1)[-1]: v for k, v in hdr.items()
                      if ".Stats." in k}}
    return px, gt, float(nodata) if nodata else None, meta


# ----------------------------------------------------------- SAGA
def decode_saga(path: str):
    """SAGA .sgrd/.sdat pair: tab-separated ASCII header, raw data,
    TOPTOBOTTOM=FALSE means bottom-up (frmts/saga/)."""
    base = os.path.splitext(path)[0]
    hdr_path = base + (".sgrd" if os.path.exists(base + ".sgrd")
                       else ".SGRD")
    hdr = {}
    for line in open(hdr_path, "r", errors="replace"):
        if "=" in line:
            k, _, v = line.partition("=")
            hdr[k.strip().upper()] = v.strip()
    fmt = hdr.get("DATAFORMAT", "FLOAT").upper()
    dmap = {"BIT": np.uint8, "BYTE_UNSIGNED": np.uint8,
            "BYTE": np.int8, "SHORTINT_UNSIGNED": np.uint16,
            "SHORTINT": np.int16, "INTEGER_UNSIGNED": np.uint32,
            "INTEGER": np.int32, "FLOAT": np.float32,
            "DOUBLE": np.float64}
    if fmt not in dmap:
        raise ValueError(f"SAGA DATAFORMAT {fmt} unsupported")
    dt = np.dtype(dmap[fmt])
    if hdr.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE":
        dt = dt.newbyteorder(">")
    w = int(hdr["CELLCOUNT_X"])
    h = int(hdr["CELLCOUNT_Y"])
    cell = float(hdr["CELLSIZE"])
    off = int(hdr.get("DATAFILE_OFFSET", "0"))
    buf = open(base + ".sdat", "rb").read()
    px = np.frombuffer(buf, dt, count=w * h, offset=off).reshape(h, w)
    if hdr.get("TOPTOBOTTOM", "FALSE").upper() == "FALSE":
        px = np.ascontiguousarray(px[::-1])
    xmin = float(hdr["POSITION_XMIN"])
    ymin = float(hdr["POSITION_YMIN"])
    gt = (xmin - cell / 2.0, cell, 0.0,
          ymin + (h - 1) * cell + cell / 2.0, 0.0, -cell)
    nd = hdr.get("NODATA_VALUE")
    return px, gt, float(nd) if nd else None, \
        {"driver": "SAGA", "z_factor": float(hdr.get("Z_FACTOR", "1"))}


# ----------------------------------------------------------- Idrisi
def decode_rst(path: str):
    """Idrisi .rst + .rdc documentation file (frmts/idrisi/): data
    types byte / integer (int16) / real (float32) / rgb24, stored
    top-down, min/max X/Y edges → geotransform."""
    base = os.path.splitext(path)[0]
    rdc = base + (".rdc" if os.path.exists(base + ".rdc") else ".RDC")
    hdr = {}
    for line in open(rdc, "r", errors="replace"):
        if ":" in line:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
    if hdr.get("file type", "binary").lower() != "binary":
        raise ValueError("Idrisi ASCII/packed files unsupported")
    w = int(hdr["columns"])
    h = int(hdr["rows"])
    dtype_name = hdr.get("data type", "byte").lower()
    buf = open(base + (".rst" if os.path.exists(base + ".rst")
                       else ".RST"), "rb").read()
    if dtype_name == "byte":
        px = np.frombuffer(buf, np.uint8, count=w * h).reshape(h, w)
    elif dtype_name == "integer":
        px = np.frombuffer(buf, "<i2", count=w * h).reshape(h, w)
    elif dtype_name == "real":
        px = np.frombuffer(buf, "<f4", count=w * h).reshape(h, w)
    elif dtype_name == "rgb24":
        raw = np.frombuffer(buf, np.uint8,
                            count=w * h * 3).reshape(h, w, 3)
        px = np.ascontiguousarray(raw[:, :, ::-1].transpose(2, 0, 1))
    else:
        raise ValueError(f"Idrisi data type {dtype_name} unsupported")
    xmin = float(hdr.get("min. x", "0"))
    xmax = float(hdr.get("max. x", str(w)))
    ymin = float(hdr.get("min. y", "0"))
    ymax = float(hdr.get("max. y", str(h)))
    gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, -(ymax - ymin) / h)
    nd = None
    if hdr.get("flag value", "none").lower() not in ("none", ""):
        try:
            nd = float(hdr["flag value"])
        except ValueError:
            nd = None
    return px, gt, nd, {"driver": "RST",
                        "title": hdr.get("file title", "")}


# ------------------------------------------------------------- GXF
def decode_gxf(buf: bytes):
    """Geosoft Grid eXchange File (ASCII #keyword records): GTYPE 0
    free-form numbers or GTYPE n base-90 compression with '!'-dummy
    and '"'-repeat escapes (gxfopen.c GXFParseBase90 /
    GXFReadRawScanlineFrom). Default sense LL-right → flip to
    north-up."""
    text = buf.decode("ascii", "replace")
    lines = text.splitlines()
    sections: dict[str, list[str]] = {}
    cur = None
    for ln in lines:
        if ln.startswith("#"):
            cur = ln.strip().upper()
            sections.setdefault(cur, [])
        elif cur is not None:
            sections[cur].append(ln)

    def first(name, default=None):
        for k, v in sections.items():
            if k.startswith(name):
                for ln in v:
                    if ln.strip():
                        return ln.strip()
        return default

    ncols = int(float(first("#POIN")))
    nrows = int(float(first("#ROWS")))
    gtype = int(float(first("#GTYPE", "0") or "0"))
    sense = int(float(first("#SENS", "1") or "1"))
    dummy_s = first("#DUMMY")
    dummy = float(dummy_s) if dummy_s else -1e12
    scale, offset = 1.0, 0.0
    tr = first("#TRANSFORM")
    if tr:
        f = tr.split()
        scale, offset = float(f[0]), float(f[1])
    grid_lines = None
    for k, v in sections.items():
        if k.startswith("#GRID"):
            grid_lines = v
            break
    if grid_lines is None:
        raise ValueError("GXF #GRID section missing")

    vals = np.empty(nrows * ncols, np.float64)
    nread = 0
    if gtype == 0:
        for ln in grid_lines:
            for tok in ln.split():
                if nread >= len(vals):
                    break
                if dummy_s is not None and tok == dummy_s:
                    vals[nread] = dummy
                else:
                    vals[nread] = float(tok)
                nread += 1
    else:
        # base-90 stream: rows may wrap lines but groups never split
        def b90(s):
            n = 0
            for ch in s:
                n = n * 90 + (ord(ch) - 37)
            return n

        li = 0
        pos = 0

        def group():
            nonlocal li, pos
            while li < len(grid_lines) and \
                    pos + gtype > len(grid_lines[li].rstrip("\r\n")):
                li += 1
                pos = 0
            if li >= len(grid_lines):
                raise ValueError("GXF compressed grid truncated")
            g = grid_lines[li][pos:pos + gtype]
            pos += gtype
            return g

        while nread < len(vals):
            g = group()
            if g[0] == "!":
                vals[nread] = dummy
                nread += 1
            elif g[0] == '"':
                cnt = b90(group())
                vg = group()
                v = dummy if vg[0] == "!" else b90(vg) * scale + offset
                cnt = min(cnt, len(vals) - nread)
                vals[nread:nread + cnt] = v
                nread += cnt
            else:
                vals[nread] = b90(g) * scale + offset
                nread += 1
    if nread < len(vals):
        raise ValueError("GXF grid short of values")
    px = vals.reshape(nrows, ncols)
    if sense in (1, -1):                      # LL/LR origin: flip rows
        px = px[::-1]
    if sense in (-1, -2):                     # right-to-left
        px = px[:, ::-1]
    px = np.ascontiguousarray(px)
    xsep = float(first("#PTSE", "1") or "1")
    ysep = float(first("#RWSE", "1") or "1")
    xo = float(first("#XORI", "0") or "0")
    yo = float(first("#YORI", "0") or "0")
    ytop = yo + (nrows - 1) * ysep
    gt = (xo - xsep / 2.0, xsep, 0.0, ytop + ysep / 2.0, 0.0, -ysep)
    return px, gt, dummy, {"driver": "GXF",
                           "projection": first("#MAP_PROJECTION")}


# ------------------------------------------------------------- FITS
_FITS_DT = {8: np.uint8, 16: ">i2", 32: ">i4", 64: ">i8",
            -32: ">f4", -64: ">f8"}


def decode_fits(buf: bytes):
    """FITS primary-HDU image: 80-char header cards in 2880-byte
    records, big-endian data stored bottom-up
    (fitsdataset.cpp IReadBlock flips); BZERO/BSCALE exposed as
    offset/scale metadata, BLANK as nodata, CRPIX/CRVAL/CDELT as the
    geotransform."""
    if buf[:6] != b"SIMPLE":
        raise ValueError("not a FITS file")
    cards = {}
    pos = 0
    while pos + 80 <= len(buf):
        card = buf[pos:pos + 80].decode("ascii", "replace")
        pos += 80
        key = card[:8].strip()
        if key == "END":
            pos = (pos + 2879) // 2880 * 2880
            break
        if "=" in card[8:10]:
            v = card[10:].split("/")[0].strip()
            cards[key] = v.strip("'").strip()
    bitpix = int(cards["BITPIX"])
    naxis = int(cards.get("NAXIS", "0"))
    if naxis < 2:
        raise ValueError("FITS primary HDU has no 2D image")
    w = int(cards["NAXIS1"])
    h = int(cards["NAXIS2"])
    nb = int(cards.get("NAXIS3", "1")) if naxis >= 3 else 1
    dt = np.dtype(_FITS_DT.get(bitpix))
    if dt is None:
        raise ValueError(f"FITS BITPIX {bitpix} unsupported")
    px = np.frombuffer(buf, dt, count=w * h * nb, offset=pos)
    px = px.reshape(nb, h, w) if nb > 1 else px.reshape(h, w)
    px = np.ascontiguousarray(px[..., ::-1, :])        # bottom-up
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    # angular WCS → projected geotransform exactly as
    # fitsdataset.cpp LoadGeoreferencing: CD matrix (or CDELT·PC),
    # scaled by deg2rad·A_RADIUS; CRVAL2 intentionally unused there
    if ("LN" in cards.get("CTYPE1", "") and "A_RADIUS" in cards
            and "CRPIX1" in cards):
        pc = [float(cards.get(f"PC{i}_{j}", "1" if i == j else "0"))
              for i in (1, 2) for j in (1, 2)]
        if "CDELT1" in cards:
            d1 = float(cards["CDELT1"])
            d2 = float(cards.get("CDELT2", cards["CDELT1"]))
            cd = [d1 * pc[0], d1 * pc[1], d2 * pc[2], d2 * pc[3]]
        else:
            cd = [float(cards.get(f"CD{i}_{j}", "0"))
                  for i in (1, 2) for j in (1, 2)]
        radfac = np.pi / 180.0 * float(cards["A_RADIUS"])
        crval1 = float(cards["CRVAL1"])
        if crval1 > 180.0:
            crval1 -= 180.0
        g1 = cd[0] * radfac
        g5 = -cd[3] * radfac
        gt = (crval1 * radfac - g1 * (float(cards["CRPIX1"]) - 0.5),
              g1, cd[1] * radfac,
              -g5 * (float(cards["CRPIX2"]) - 0.5),
              cd[2] * radfac, g5)
    nd = float(cards["BLANK"]) if "BLANK" in cards else None
    meta = {"driver": "FITS", "object": cards.get("OBJECT"),
            "offset": float(cards.get("BZERO", "0")),
            "scale": float(cards.get("BSCALE", "1"))}
    return px, gt, nd, meta


# ------------------------------------------------- NADCON LOS/LAS
def decode_loslas(buf: bytes, ext: str = "los"):
    """NOAA NADCON .los/.las datum-shift grid (also GEOID .geo):
    56-byte ident + 8-byte kind, width/height/zcount int32 at 64,
    origin/cell floats at 76, float32 records of (w*4+4) bytes stored
    south-first (loslasdataset.cpp reads them bottom-up)."""
    if len(buf) < 92 or buf[56:62] not in (b"NADGRD", b"GEOGRD"):
        raise ValueError("not a NADCON los/las or geo grid")
    w, h = struct.unpack_from("<2i", buf, 64)
    if not (0 < w < 1 << 20 and 0 < h < 1 << 20):
        raise ValueError("LOS/LAS implausible dimensions")
    min_lon, dlon, min_lat, dlat = struct.unpack_from("<4f", buf, 76)
    rec = w * 4 + 4
    rows = []
    for y in range(h):                       # south-first in file
        off = (y + 1) * rec + 4
        rows.append(np.frombuffer(buf, "<f4", count=w, offset=off))
    px = np.ascontiguousarray(np.vstack(rows)[::-1])
    gt = (min_lon - dlon * 0.5, float(dlon), 0.0,
          min_lat + (h - 0.5) * dlat, 0.0, float(-dlat))
    desc = {"las": "Latitude Offset (arc seconds)",
            "los": "Longitude Offset (arc seconds)",
            "geo": "Geoid undulation (meters)"}.get(ext.lower())
    return px, gt, None, {"driver": "LOSLAS", "crs": "EPSG:4326",
                          "band_description": desc}


# ------------------------------------------------------------ BYN
def decode_byn(buf: bytes):
    """Natural Resources Canada .byn vertical-datum grid: 80-byte
    little-endian header (byndataset.cpp buffer2header), int16/int32
    data top-down, bounds in arc-seconds (x1000 when nScale=1);
    nodata 32767 (int16) / 9999*factor (int32)."""
    if len(buf) < 80:
        raise ValueError("BYN file too short")
    south, north, west, east = struct.unpack_from("<4i", buf, 0)
    dlat, dlon, nglobal, ntype = struct.unpack_from("<4h", buf, 16)
    (factor,) = struct.unpack_from("<d", buf, 24)
    sizeof, vdatum = struct.unpack_from("<2h", buf, 32)
    descrip, subtype, datum, ellipsoid, byteorder, scale = \
        struct.unpack_from("<6h", buf, 40)
    if sizeof not in (2, 4) or scale not in (0, 1) \
            or byteorder not in (0, 1):
        raise ValueError("not a BYN grid (implausible header)")
    s, n, w_, e, dla, dlo = (float(v) for v in
                             (south, north, west, east, dlat, dlon))
    if scale == 1:
        s, n, w_, e, dla, dlo = (v * 1000.0
                                 for v in (s, n, w_, e, dla, dlo))
    ncols = int((e - w_ + 1.0) / dlo + 1.0)
    nrows = int((n - s + 1.0) / dla + 1.0)
    if not (0 < ncols < 1 << 20 and 0 < nrows < 1 << 20):
        raise ValueError("BYN implausible dimensions")
    bo = "<" if byteorder == 1 else ">"
    dt = np.dtype(bo + ("i2" if sizeof == 2 else "i4"))
    px = np.frombuffer(buf, dt, count=nrows * ncols,
                       offset=80).reshape(nrows, ncols)
    gt = ((w_ - dlo / 2.0) / 3600.0, dlo / 3600.0, 0.0,
          (n + dla / 2.0) / 3600.0, 0.0, -dla / 3600.0)
    nd = 32767.0 if sizeof == 2 else 9999.0 * factor
    return px, gt, nd, {"driver": "BYN", "crs": "EPSG:4326",
                        "scale": (1.0 / factor) if factor else 0.0}


# ------------------------------------------------------ NGSGEOID
def decode_ngsgeoid(buf: bytes):
    """NOAA NGS binary geoid (.bin): SLAT WLON DLAT DLON float64 +
    NLAT NLON IKIND int32 (endianness probed via IKIND==1), float32
    rows stored south-first (ngsgeoiddataset.cpp)."""
    if len(buf) < 44:
        raise ValueError("NGSGEOID file too short")
    for bo in ("<", ">"):
        (ikind,) = struct.unpack_from(bo + "i", buf, 40)
        if ikind == 1:
            break
    else:
        raise ValueError("not an NGS geoid .bin (IKIND != 1)")
    slat, wlon, dlat, dlon = struct.unpack_from(bo + "4d", buf, 0)
    nlat, nlon = struct.unpack_from(bo + "2i", buf, 32)
    if not (0 < nlat < 1 << 20 and 0 < nlon < 1 << 20):
        raise ValueError("NGSGEOID implausible dimensions")
    n = nlat * nlon
    avail = (len(buf) - 44) // (nlon * 4)    # tolerate truncated files
    rows = min(nlat, avail)
    px = np.zeros((nlat, nlon), np.float32)
    if rows:
        data = np.frombuffer(buf, bo + "f4", count=rows * nlon,
                             offset=44).reshape(rows, nlon)
        px[nlat - rows:] = data[::-1]        # south-first → north-up
    gt = (wlon - dlon / 2.0, dlon, 0.0,
          slat + nlat * dlat - dlat / 2.0, 0.0, -dlat)
    return px, gt, None, {"driver": "NGSGEOID", "crs": "EPSG:4326"}


# ----------------------------------------------------------- ISG
def decode_isg(buf: bytes):
    """International Service for the Geoid ASCII grid: free header up
    to begin_of_head, `key = value` block to end_of_head, then
    whitespace rows north-first. Bounds are cell edges when
    (max-min)/delta == n, node centres when == n-1
    (aaigriddataset.cpp ISGDataset::ParseHeader)."""
    text = buf.decode("utf-8", "replace")
    m = re.search(r"begin_of_head.*?\n(.*?)end_of_head[^\n]*\n",
                  text, re.S)
    if not m:
        raise ValueError("not an ISG file (no begin_of_head)")
    hdr = {}
    for line in m.group(1).splitlines():
        if "=" in line:
            k, _, v = line.partition("=")
            hdr[k.strip().lower()] = v.strip()
        elif ":" in line:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()

    def ang(v):
        if "°" in v or ":" in v:
            return _dms(v.replace("°", ":").replace("'", ":")
                        .replace('"', ""))
        return float(v)

    lat0, lat1 = ang(hdr["lat min"]), ang(hdr["lat max"])
    lon0, lon1 = ang(hdr["lon min"]), ang(hdr["lon max"])
    dla, dlo = ang(hdr["delta lat"]), ang(hdr["delta lon"])
    nrows, ncols = int(hdr["nrows"]), int(hdr["ncols"])
    nd = float(hdr.get("nodata", "-9999"))
    vals = np.fromstring(text[m.end():], sep=" ") \
        if False else np.array(text[m.end():].split(), np.float64)
    if len(vals) < nrows * ncols:
        raise ValueError("ISG grid short of values")
    px = vals[:nrows * ncols].reshape(nrows, ncols)  # north-first
    if abs((lat1 - lat0) / dla - nrows) < 0.01:      # edge bounds
        gt = (lon0, dlo, 0.0, lat1, 0.0, -dla)
    elif abs((lat1 - lat0) / dla - (nrows - 1)) < 0.01:  # centres
        gt = (lon0 - dlo / 2.0, dlo, 0.0, lat1 + dla / 2.0, 0.0, -dla)
    else:
        raise ValueError("ISG bounds inconsistent with grid size")
    return px, gt, nd, {"driver": "ISG", "crs": "EPSG:4326",
                        "model": hdr.get("model name")}


# ---------------------------------------------------- GRASS ASCII
def decode_grassascii(buf: bytes):
    """GRASS ASCII grid: north/south/east/west/rows/cols header then
    whitespace values north-first; '*' marks null."""
    text = buf.decode("utf-8", "replace")
    hdr = {}
    pos = 0
    for line in text.splitlines(keepends=True):
        m = re.match(r"\s*(north|south|east|west|rows|cols|null|type)"
                     r"\s*:\s*(\S+)", line, re.I)
        if not m:
            break
        hdr[m.group(1).lower()] = m.group(2)
        pos += len(line)
    if "north" not in hdr or "rows" not in hdr:
        raise ValueError("not a GRASS ASCII grid")
    nrows, ncols = int(hdr["rows"]), int(hdr["cols"])
    toks = text[pos:].split()
    nd = None
    if any(t == "*" for t in toks[:nrows * ncols]):
        nd = float(hdr.get("null", "-9999"))
        toks = [hdr.get("null", "-9999") if t == "*" else t
                for t in toks]
    vals = np.array(toks[:nrows * ncols], np.float64)
    if len(vals) < nrows * ncols:
        raise ValueError("GRASS grid short of values")
    px = vals.reshape(nrows, ncols)
    north, south = float(hdr["north"]), float(hdr["south"])
    east, west = float(hdr["east"]), float(hdr["west"])
    gt = (west, (east - west) / ncols, 0.0,
          north, 0.0, -(north - south) / nrows)
    return px, gt, nd, {"driver": "GRASSASCIIGrid"}


# ----------------------------------------------------------- JDEM
def decode_jdem(buf: bytes):
    """Japanese DEM .mem: 1011-byte ASCII header (dims at 23/26,
    corner angles as packed DDDMMSS at 29..56), rows of 5-digit
    decimetre heights ×0.1 (jdemdataset.cpp)."""
    hdr = buf[:1011].decode("ascii", "replace")

    def field(off, width):
        s = hdr[off:off + width].strip() or "0"
        return int(s)

    def angle(off):
        a = field(off, 7)
        return a // 10000 + (a // 100) % 100 / 60.0 + a % 100 / 3600.0

    w = field(23, 3)
    h = field(26, 3)
    if not (0 < w < 1000 and 0 < h < 1000):
        raise ValueError("not a JDEM file (implausible dims)")
    ll_lat, ll_lon = angle(29), angle(36)
    ur_lat, ur_lon = angle(43), angle(50)
    rec = w * 5 + 9 + 2
    px = np.zeros((h, w), np.float32)
    for y in range(h):
        off = 1011 + rec * y
        row = buf[off:off + rec].decode("ascii", "replace")
        if len(row) < 9 + 5 * w:
            break                            # tolerate truncation
        for x in range(w):
            s = row[9 + 5 * x:14 + 5 * x].strip() or "0"
            px[y, x] = int(s) * 0.1
    gt = (ll_lon, (ur_lon - ll_lon) / w, 0.0,
          ur_lat, 0.0, -(ur_lat - ll_lat) / h)
    return px, gt, None, {"driver": "JDEM", "crs": "EPSG:4301"}


# ------------------------------------------------------------ GSC
def decode_gsc(buf: bytes):
    """GSC Geogrid: Fortran-style records with 4-byte length markers;
    record 0 = [reclen, pixels, lines, 2], record 1 = 8 floats of
    georeferencing, then float32 LE data records (gscdataset.cpp)."""
    if len(buf) < 20 or buf[12:16] != b"\x02\x00\x00\x00":
        raise ValueError("not a GSC geogrid")
    reclen, npix, nlines = struct.unpack_from("<3i", buf, 0)
    if reclen != npix * 4 or not (0 < npix <= 100000
                                  and 0 < nlines <= 100000):
        raise ValueError("GSC implausible dimensions")
    reclen += 8                              # record length markers
    hdrf = struct.unpack_from("<8f", buf, reclen + 12)
    rows = []
    for y in range(nlines):
        off = reclen * (2 + y) + 4
        rows.append(np.frombuffer(buf, "<f4", count=npix, offset=off))
    px = np.vstack(rows)
    gt = (float(hdrf[2]), float(hdrf[0]), 0.0,
          float(hdrf[5]), 0.0, float(-hdrf[1]))
    return px, gt, -1.0000000150474662199e+30, {"driver": "GSC"}


# -------------------------------------------------------- RRASTER
_RR_TYPES = {"LOG1S": "i1", "INT1S": "i1", "INT2S": "i2",
             "INT4S": "i4", "INT8S": "i8", "INT1U": "u1",
             "INT2U": "u2", "INT4U": "u4", "FLT4S": "f4",
             "FLT8S": "f8"}


def decode_rraster(path: str):
    """R raster package native grid: .grd INI header + .gri raw file,
    BIL/BIP/BSQ band order, top-down rows (frmts/rraster/)."""
    base = os.path.splitext(path)[0]
    hdr = {}
    for line in open(base + ".grd", "r", errors="replace"):
        if "=" in line:
            k, _, v = line.partition("=")
            hdr[k.strip().lower()] = v.strip()
    if "nrows" not in hdr or "datatype" not in hdr:
        raise ValueError("not an RRASTER .grd header")
    h, w = int(hdr["nrows"]), int(hdr["ncols"])
    nb = int(hdr.get("nbands", "1"))
    code = _RR_TYPES.get(hdr["datatype"].upper())
    if code is None:
        raise ValueError(f"RRASTER datatype {hdr['datatype']} "
                         "unsupported")
    bo = ">" if hdr.get("byteorder", "little").lower() == "big" else "<"
    dt = np.dtype(bo + code)
    buf = open(base + ".gri", "rb").read()
    order = hdr.get("bandorder", "BIL").upper()
    n = w * h * nb
    arr = np.frombuffer(buf, dt, count=n)
    if nb == 1:
        px = arr.reshape(h, w)
    elif order == "BIL":
        px = np.ascontiguousarray(
            arr.reshape(h, nb, w).transpose(1, 0, 2))
    elif order == "BIP":
        px = np.ascontiguousarray(
            arr.reshape(h, w, nb).transpose(2, 0, 1))
    else:                                    # BSQ
        px = arr.reshape(nb, h, w)
    xmin, xmax = float(hdr["xmin"]), float(hdr["xmax"])
    ymin, ymax = float(hdr["ymin"]), float(hdr["ymax"])
    gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, -(ymax - ymin) / h)
    ndv = hdr.get("nodatavalue", "NA")
    nd = None if ndv.upper() in ("NA", "NAN") else float(ndv)
    return px, gt, nd, {"driver": "RRASTER",
                        "crs": hdr.get("projection", ""),
                        "layername": hdr.get("layername", "")}


# ------------------------------------------------ Golden Software grids
SURFER_NODATA = 1.701410009187828e+38


def decode_gsbg(buf: bytes):
    """Surfer 6 binary grid (.grd, magic DSBB): int16 nx/ny, double
    xmin/xmax/ymin/ymax/zmin/zmax over node centres, float32 rows
    south→north. gsbgdataset.cpp; blank value 1.70141e38f."""
    if buf[:4] != b"DSBB":
        raise ValueError("not a Surfer 6 binary grid")
    nx, ny = struct.unpack_from("<2h", buf, 4)
    xmin, xmax, ymin, ymax = struct.unpack_from("<4d", buf, 8)
    if nx < 2 or ny < 2:
        raise ValueError("Surfer grid needs nx, ny >= 2")
    px = np.frombuffer(buf, "<f4", nx * ny, 56).reshape(ny, nx)
    px = np.ascontiguousarray(px[::-1])                # north-up
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    gt = (xmin - dx / 2.0, dx, 0.0, ymax + dy / 2.0, 0.0, -dy)
    return px, gt, float(np.float32(SURFER_NODATA)), {"driver": "GSBG"}


def decode_gsag(text: str):
    """Surfer ASCII grid (.grd, magic DSAA): nx ny, xmin xmax,
    ymin ymax, zmin zmax, node values south→north.
    gsagdataset.cpp; blank value 1.70141e38."""
    toks = text.split()
    if not toks or toks[0] != "DSAA":
        raise ValueError("not a Surfer ASCII grid")
    nx, ny = int(toks[1]), int(toks[2])
    xmin, xmax, ymin, ymax = map(float, toks[3:7])
    vals = np.array(toks[9:9 + nx * ny], dtype=np.float64) \
        .reshape(ny, nx)
    px = np.ascontiguousarray(vals[::-1]).astype(np.float64)
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    gt = (xmin - dx / 2.0, dx, 0.0, ymax + dy / 2.0, 0.0, -dy)
    return px, gt, 1.70141e+38, {"driver": "GSAG"}


def decode_gs7bg(buf: bytes):
    """Surfer 7 binary grid (.grd, magic DSRB): tagged sections —
    GRID header (ny, nx, xLL, yLL, xSize, ySize, zmin, zmax,
    rotation, blankValue) then DATA of float64 rows south→north.
    gs7bgdataset.cpp."""
    if buf[:4] != b"DSRB":
        raise ValueError("not a Surfer 7 grid")
    pos = 0
    hdr = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if tag == b"GRID":
            ny, nx = struct.unpack_from("<2i", buf, body)
            (xll, yll, dx, dy, zmin, zmax, rot, blank) = \
                struct.unpack_from("<8d", buf, body + 8)
            hdr = (ny, nx, xll, yll, dx, dy, blank)
        elif tag == b"DATA" and hdr is not None:
            ny, nx, xll, yll, dx, dy, blank = hdr
            px = np.frombuffer(buf, "<f8", nx * ny, body) \
                .reshape(ny, nx)
            px = np.ascontiguousarray(px[::-1])        # north-up
            gt = (xll - dx / 2.0, dx, 0.0,
                  yll + (ny - 1) * dy + dy / 2.0, 0.0, -dy)
            return px, gt, blank, {"driver": "GS7BG"}
        pos = body + size
    raise ValueError("Surfer 7 grid has no GRID/DATA sections")


def decode_surfer(buf: bytes):
    """Dispatch the three Golden Software .grd layouts by magic."""
    if buf[:4] == b"DSBB":
        return decode_gsbg(buf)
    if buf[:4] == b"DSRB":
        return decode_gs7bg(buf)
    if buf[:4] == b"DSAA":
        return decode_gsag(buf.decode("ascii", "replace"))
    raise ValueError("not a Golden Software grid")


# ---------------------------------------------------------------- BT
def decode_bt(buf: bytes):
    """VTP binary terrain (.bt 1.1-1.3): 256-byte header (magic
    binterr1.x, int32 cols/rows, int16 datasize+float flag, horiz
    units / UTM zone / datum, double extents, external-prj flag),
    column-major data bottom-to-top within each column.
    frmts/raw/btdataset.cpp."""
    if buf[:7] != b"binterr":
        raise ValueError("not a BT terrain file")
    ncols, nrows = struct.unpack_from("<2i", buf, 10)
    dsize, ffloat = struct.unpack_from("<2h", buf, 18)
    left, right, bottom, top = struct.unpack_from("<4d", buf, 28)
    code = "f4" if ffloat else {2: "i2", 4: "i4"}[dsize]
    arr = np.frombuffer(buf, "<" + code, ncols * nrows, 256) \
        .reshape(ncols, nrows)
    px = np.ascontiguousarray(arr.T[::-1])       # columns → north-up
    gt = (left, (right - left) / ncols, 0.0,
          top, 0.0, -(top - bottom) / nrows)
    return px, gt, None, {"driver": "BT"}


def encode_bt(px: np.ndarray, gt) -> bytes:
    """Write a BT 1.3 file (column-major, bottom-up)."""
    h, w = px.shape
    if px.dtype.kind == "f":
        data = px.astype("<f4")
        dsize, ffloat = 4, 1
    elif px.dtype.itemsize <= 2:
        data = px.astype("<i2")
        dsize, ffloat = 2, 0
    else:
        data = px.astype("<i4")
        dsize, ffloat = 4, 0
    left = gt[0]
    right = gt[0] + gt[1] * w
    top = gt[3]
    bottom = gt[3] + gt[5] * h
    hdr = bytearray(256)
    hdr[:10] = b"binterr1.3"
    struct.pack_into("<2i", hdr, 10, w, h)
    struct.pack_into("<2h", hdr, 18, dsize, ffloat)
    struct.pack_into("<3h", hdr, 22, 1, 0, 6326)   # meters, no zone
    struct.pack_into("<4d", hdr, 28, left, right, bottom, top)
    return bytes(hdr) + np.ascontiguousarray(data[::-1].T).tobytes()


# ---------------------------------------------------------- Terragen
def decode_terragen(buf: bytes):
    """Terragen terrain (.ter): TERRAGENTERRAIN chunk stream — SIZE/
    XPTS/YPTS int16 dims, SCAL float32 gridpost spacing, ALTW int16
    heightScale/baseHeight + raw int16 elevations (hv' = hv·hs/65536
    + base, exposed as Int16 + scale/offset like the reference).
    frmts/terragen/terragendataset.cpp."""
    if buf[:16] != b"TERRAGENTERRAIN ":
        raise ValueError("not a Terragen terrain file")
    pos = 16
    npx = npy = None
    scal = 30.0
    while pos + 4 <= len(buf):
        tag = buf[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            (n,) = struct.unpack_from("<h", buf, pos)
            npx = npy = n + 1
            pos += 4
        elif tag == b"XPTS":
            (npx,) = struct.unpack_from("<h", buf, pos)
            pos += 4
        elif tag == b"YPTS":
            (npy,) = struct.unpack_from("<h", buf, pos)
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", buf, pos)[0]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hs, base = struct.unpack_from("<2h", buf, pos)
            pos += 4
            if npx is None or npy is None:
                raise ValueError("Terragen ALTW before SIZE")
            px = np.frombuffer(buf, "<i2", npx * npy, pos) \
                .reshape(npy, npx)
            px = np.ascontiguousarray(px[::-1])      # south-up → north
            meta = {"driver": "TERRAGEN",
                    "scale": scal * hs / 65536.0,
                    "offset": base * scal}
            gt = (0.0, scal, 0.0, npy * scal, 0.0, -scal)
            return px, gt, None, meta
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"Terragen chunk {tag!r} not supported")
    raise ValueError("Terragen file has no ALTW chunk")


# ---------------------------------------------------------- Leveller
def decode_leveller(buf: bytes):
    """Daylon Leveller heightfield (.ter): 'trrn' + version byte +
    tag stream (len-byte name, uint32 size, payload); hf_w/hf_b dims,
    hf_data float32 rows (v<6: int32/65536 fixed point).
    frmts/leveller/levellerdataset.cpp."""
    if buf[:4] != b"trrn":
        raise ValueError("not a Leveller heightfield")
    version = buf[4]
    tags = {}
    pos = 5
    while pos + 1 <= len(buf):
        dlen = buf[pos]
        if dlen == 0 or pos + 1 + dlen + 4 > len(buf):
            break
        name = buf[pos + 1:pos + 1 + dlen].decode("ascii", "replace")
        (size,) = struct.unpack_from("<I", buf, pos + 1 + dlen)
        body = pos + 1 + dlen + 4
        tags[name] = (body, size)
        pos = body + size
    try:
        w = struct.unpack_from("<i", buf, tags["hf_w"][0])[0]
        h = struct.unpack_from("<i", buf, tags["hf_b"][0])[0]
        off, size = tags["hf_data"]
    except KeyError as exc:
        raise ValueError(f"Leveller tag missing: {exc}") from exc
    if version < 6:
        px = (np.frombuffer(buf, "<i4", w * h, off)
              .astype(np.float32) / 65536.0).reshape(h, w)
    else:
        px = np.frombuffer(buf, "<f4", w * h, off).reshape(h, w)
        px = np.ascontiguousarray(px).astype(np.float32)
    meta = {"driver": "LEVELLER"}
    if "hf_worldspacing" in tags:
        ws = struct.unpack_from("<f", buf,
                                tags["hf_worldspacing"][0])[0]
        meta["worldspacing"] = float(ws)
    return px, None, None, meta


# ---------------------------------------------------------- PCRaster
_CSF_REPR = {0x00: ("u1", 255.0), 0x11: ("u2", 65535.0),
             0x22: ("u4", 4294967295.0), 0x04: ("i1", -128.0),
             0x15: ("i2", -32768.0), 0x26: ("i4", -2147483648.0),
             0x5A: ("f4", None), 0x6B: ("f8", None)}


def decode_pcraster(buf: bytes):
    """PCRaster CSF 2.0 map (.map): 64-byte main header (signature,
    version, projection, byte order) + raster header (valueScale,
    cellRepr, min/max, xUL/yUL, rows/cols, cell size); data at 256.
    frmts/pcraster (libcsf layout); MV per cell representation
    (UINT1→255, INT4→INT_MIN, REAL4→NaN)."""
    if buf[:27] != b"RUU CROSS SYSTEM MAP FORMAT":
        raise ValueError("not a PCRaster CSF map")
    (repr_,) = struct.unpack_from("<H", buf, 66)
    if repr_ not in _CSF_REPR:
        raise ValueError(f"CSF cell representation {repr_:#x} "
                         "not supported")
    code, mv = _CSF_REPR[repr_]
    xul, yul = struct.unpack_from("<2d", buf, 84)
    rows, cols = struct.unpack_from("<2I", buf, 100)
    (cell,) = struct.unpack_from("<d", buf, 108)
    px = np.frombuffer(buf, "<" + code, rows * cols, 256) \
        .reshape(rows, cols)
    px = np.ascontiguousarray(px)
    gt = (xul, cell, 0.0, yul, 0.0, -cell)
    (vs,) = struct.unpack_from("<H", buf, 64)
    return px, gt, mv, {"driver": "PCRaster", "valuescale": vs}


# ----------------------------------------------------------- ROI_PAC
_ROIPAC_TYPES = {"dem": ("<i2", 1), "flg": ("u1", 1),
                 "raw": ("u1", 1), "slc": ("<c8", 1),
                 "int": ("<c8", 1), "amp": ("<f4", 2),
                 "cor": ("<f4", 2), "hgt": ("<f4", 2),
                 "unw": ("<f4", 2), "msk": ("<f4", 2)}


def decode_roipac(path: str):
    """JPL ROI_PAC interferometry raster: <file>.rsc keyword sidecar
    (WIDTH/FILE_LENGTH/X_FIRST/X_STEP…), pixel type by extension
    (dem=int16, slc/int=cfloat32, unw/cor/hgt/msk = 2-band RMG line
    interleave). frmts/raw/roipacdataset.cpp."""
    rsc_path = path + ".rsc"
    if not os.path.exists(rsc_path):
        raise ValueError(f"no .rsc sidecar for {path}")
    kw = {}
    for line in open(rsc_path):
        parts = line.split(None, 1)
        if len(parts) == 2:
            kw[parts[0]] = parts[1].strip()
    w = int(kw["WIDTH"])
    h = int(kw["FILE_LENGTH"])
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    if ext not in _ROIPAC_TYPES:
        raise ValueError(f"ROI_PAC extension .{ext} not supported")
    code, nbands = _ROIPAC_TYPES[ext]
    buf = open(path, "rb").read()
    arr = np.frombuffer(buf, code, w * h * nbands)
    if nbands == 1:
        px = np.ascontiguousarray(arr.reshape(h, w))
    else:                       # RMG: per line, band1 row then band2
        px = np.ascontiguousarray(
            arr.reshape(h, nbands, w).transpose(1, 0, 2))
        px = np.moveaxis(px, 0, -1)
    gt = None
    if "X_FIRST" in kw:
        gt = (float(kw["X_FIRST"]), float(kw["X_STEP"]), 0.0,
              float(kw["Y_FIRST"]), 0.0, float(kw["Y_STEP"]))
    meta = {"driver": "ROI_PAC", "rsc": kw}
    if kw.get("PROJECTION", "").upper() == "LL" and \
            kw.get("DATUM", "WGS84").upper() == "WGS84":
        meta["crs"] = "EPSG:4326"
    if "Z_SCALE" in kw:
        meta["scale"] = float(kw["Z_SCALE"])
    if "Z_OFFSET" in kw:
        meta["offset"] = float(kw["Z_OFFSET"])
    return px, gt, None, meta


# ------------------------------------------------------------ SNODAS
def decode_snodas(path: str):
    """NOHRSC SNODAS (.hdr 'key: value' text + big-endian int16 raw
    payload named by 'Data file pathname'). frmts/raw/snodasdataset
    .cpp; nodata from 'No data value', slope/intercept as scale/
    offset, lat/lon extents over cell edges."""
    hdr = {}
    for line in open(path, errors="replace"):
        if ":" in line:
            k, v = line.split(":", 1)
            hdr[k.strip()] = v.strip()
    if not hdr.get("Format version", "").startswith("NOHRSC"):
        raise ValueError("not a SNODAS header")
    cols = int(hdr["Number of columns"])
    rows = int(hdr["Number of rows"])
    nbytes = int(hdr.get("Data bytes per pixel", "2"))
    code = {1: "u1", 2: ">i2", 4: ">i4"}[nbytes]
    datafile = os.path.join(os.path.dirname(path),
                            os.path.basename(
                                hdr["Data file pathname"]))
    buf = open(datafile, "rb").read()
    need = rows * cols * nbytes
    if len(buf) < need:
        buf = buf + b"\x00" * (need - len(buf))
    px = np.ascontiguousarray(
        np.frombuffer(buf, code, rows * cols).reshape(rows, cols))
    minx = float(hdr["Minimum x-axis coordinate"])
    maxx = float(hdr["Maximum x-axis coordinate"])
    miny = float(hdr["Minimum y-axis coordinate"])
    maxy = float(hdr["Maximum y-axis coordinate"])
    gt = (minx, (maxx - minx) / cols, 0.0,
          maxy, 0.0, -(maxy - miny) / rows)
    nd = float(hdr.get("No data value", "-9999"))
    meta = {"driver": "SNODAS", "crs": "EPSG:4326",
            "scale": float(hdr.get("Data slope", "1")),
            "offset": float(hdr.get("Data intercept", "0")),
            "units": hdr.get("Data units", "")}
    return px, gt, nd, meta
