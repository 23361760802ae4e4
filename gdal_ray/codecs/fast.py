"""EOSAT FAST Format (L7A / IRS Euromap) reader.

Reference driver: frmts/raw/fastdataset.cpp. Header is fixed-width
``KEY =value`` text (admin + radiometric + geometric records); band
data lives in separate raw files located by FILENAME entries, the
``<stem>.b0N`` Landsat fallback, BANDN.DAT, or the Euromap IRS-1C/1D
last-character conventions (PAN: header letter a-j -> digit; LISS3:
4 bands from the letter-group table; WIFS: '0' -> '1','2' —
fastdataset.cpp TryEuromap_IRS_1C_1D_ChannelNameConvention).

Georeferencing: the four corner easting/northings (13-char fields 28
bytes past the "UL "/"UR "/"LL "/"LR " markers) fitted as GCPs at
pixel centers — the exact GDALGCPsToGeoTransform least-squares — with
the zone*1e6 old-FAST easting bias removed. Goldens in
tests/test_fast.py from autotest/gdrivers/fast.py (HPN cs 60323 over
5000x1, gt 280342.5/15/3621457.5, HTM band2 19110 + gt, Euromap
PAN/LISS3/WIFS gts incl. the rotated SOM and LCC cases).
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = ["decode_fast"]


def _get_value(header: str, key: str, size: int) -> str | None:
    i = header.find(key)
    while i >= 0:
        j = i + len(key)
        while j < len(header) and header[j] == " ":
            j += 1
        if j < len(header) and header[j] == "=":
            return header[j + 1:j + 1 + size].strip()
        i = header.find(key, i + 1)
    return None


def _corner(header: str, marker: str) -> tuple[float, float] | None:
    """First occurrence of the marker whose +28 easting/northing
    fields parse (the reference scans the geometric record only; a
    bare "LL " can appear in earlier prose)."""
    i = header.find(marker)
    while i >= 0:
        p = i + len(marker) + 28
        try:
            x = float(header[p:p + 13])
            y = float(header[p + 14:p + 27])
            return x, y
        except ValueError:
            i = header.find(marker, i + 1)
    return None


def _gcps_to_gt(gcps):
    """Least-squares affine fit (GDALGCPsToGeoTransform semantics):
    X = gt0 + px*gt1 + ln*gt2 ; Y = gt3 + px*gt4 + ln*gt5."""
    A = np.array([[1.0, px, ln] for px, ln, _x, _y in gcps])
    bx = np.array([x for _px, _ln, x, _y in gcps])
    by = np.array([y for _px, _ln, _x, y in gcps])
    cx, *_ = np.linalg.lstsq(A, bx, rcond=None)
    cy, *_ = np.linalg.lstsq(A, by, rcond=None)
    return (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])


_LISS_GROUPS = ["02345", "6789a", "bcdef", "ghijk", "lmnop", "qrstu",
                "vwxyz"]


def _euromap_band_files(path: str, sensor: str) -> list[str]:
    d = os.path.dirname(path) or "."
    base = os.path.basename(path)
    last = base[-1]

    def variant(ch):
        for c in (ch, ch.upper()):
            cand = os.path.join(d, base[:-1] + c)
            if os.path.exists(cand):
                return cand
        return None
    out = []
    if sensor == "PAN":
        c = last.lower()
        if "a" <= c <= "j":
            f = variant(chr(ord(c) - ord("a") + ord("0")))
        elif "k" <= c <= "m":
            f = variant(chr(ord(c) - ord("k") + ord("n")))
        else:
            f = None
        if f:
            out.append(f)
    elif sensor == "LISS3":
        for grp in _LISS_GROUPS:
            if last.lower() == grp[0] or last == grp[0]:
                for ch in grp[1:]:
                    f = variant(ch)
                    if f:
                        out.append(f)
                break
    elif sensor == "WIFS" and last == "0":
        for ch in "12":
            f = variant(ch)
            if f:
                out.append(f)
    return out


def decode_fast(path: str):
    raw = open(path, "rb").read(5000)
    header = raw.decode("latin-1", "replace")
    if "ACQUISITION DATE" not in header:
        raise ValueError("not a FAST header")
    d = os.path.dirname(path) or "."
    stem, suffix = os.path.splitext(os.path.basename(path))
    suffix = suffix.lstrip(".")

    meta: dict = {"driver": "FAST"}
    for key, size in (("ACQUISITION DATE", 8), ("SATELLITE", 10),
                      ("SENSOR", 10)):
        v = _get_value(header, key, size)
        meta[key.replace(" ", "_")] = v if v is not None else ""
    sat = meta["SATELLITE"] or ""

    w = int(_get_value(header, "PIXELS PER LINE", 5) or 0)
    lines = _get_value(header, "LINES PER BAND", 5) or \
        _get_value(header, "LINES PER IMAGE", 5)
    h = int(lines or 0)
    if not (w > 0 and h > 0):
        raise ValueError("FAST header missing raster size")
    bits = int(_get_value(header, "OUTPUT BITS PER PIXEL", 2) or 8)
    dtype = np.dtype("u1") if bits <= 8 else np.dtype(">u2")

    # gains/biases: "GAINS AND BIASES" names the pair order GAIN,BIAS;
    # "BIASES AND GAINS" the reverse (fastdataset.cpp:805-860)
    ib = header.find("BIASES")
    ig = header.find("GAINS")
    gb_nums: list[str] = []
    gb_names = ("GAIN", "BIAS")
    if ib >= 0 and ig >= 0:
        gb_names = ("GAIN", "BIAS") if ib > ig else ("BIAS", "GAIN")
        gb_nums = re.findall(r"[-+]?[\d.]+(?:[Ee][-+]?\d+)?",
                             header[max(ib, ig) + 6:])

    # --- band files
    band_files: list[str] = []
    fn_positions = [m.start() for m in re.finditer("FILENAME", header)]
    for i in fn_positions:
        j = i + len("FILENAME")
        while j < len(header) and header[j] in " =":
            j += 1
        name = header[i + len("FILENAME"):][:40]
        eq = name.find("=")
        if eq < 0:
            continue
        name = name[eq + 1:eq + 1 + 29].strip()
        if not name:
            continue
        cand = os.path.join(d, name)
        if not os.path.exists(cand):
            # case-insensitive lookup
            low = name.lower()
            for f in os.listdir(d):
                if f.lower() == low:
                    cand = os.path.join(d, f)
                    break
        if os.path.exists(cand) and cand not in band_files:
            band_files.append(cand)
    if not band_files and "EUROMAP" in header:
        band_files = _euromap_band_files(path, meta["SENSOR"] or "")
    if not band_files:
        # BANDn.DAT / <stem>.b0N fallbacks
        for n in range(1, 8):
            for cand in (os.path.join(d, f"BAND{n}.DAT"),
                         os.path.join(d, f"band{n}.dat"),
                         os.path.join(d, f"{stem}.b{n:02d}")):
                if os.path.exists(cand):
                    band_files.append(cand)
                    break
    if not band_files:
        raise ValueError("FAST: no band data files found")

    for bi in range(min(len(band_files), len(gb_nums) // 2)):
        meta[f"{gb_names[0]}{bi + 1}"] = gb_nums[2 * bi]
        meta[f"{gb_names[1]}{bi + 1}"] = gb_nums[2 * bi + 1]

    bands = []
    for f in band_files:
        buf = open(f, "rb").read()
        need = w * h * dtype.itemsize
        buf = buf + b"\x00" * max(0, need - len(buf))
        bands.append(np.frombuffer(buf, dtype, w * h).reshape(h, w))
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)

    # --- georeferencing from the four corners
    gt = None
    zone = int(_get_value(header, "USGS MAP ZONE", 6) or 0)
    params: list[float] = []
    ip = header.find("PROJECTION PARAMETERS")
    if ip >= 0:
        params = [float(v) for v in re.findall(
            r"[-+]?[\d.]+(?:[Ee][-+]?\d+)?",
            header[ip + len("PROJECTION PARAMETERS"):])[:15]]
    if zone == 0 and len(params) > 2 and params[2] != 0.0:
        # importFromUSGS UTM fallback: zone in USGS parameter 3
        zone = int(params[2])
    corners = {m2: _corner(header, m2) for m2 in ("UL ", "UR ", "LL ",
                                                  "LR ")}
    if all(c is not None and c[0] != 0.0 and c[1] != 0.0
           for c in corners.values()):
        cs = {}
        for k, (x, y) in corners.items():
            if x >= 1000000.0 and zone:
                x -= zone * 1000000.0
            cs[k.strip()] = (x, y)
        gcps = [(0.5, 0.5, *cs["UL"]),
                (w - 0.5, 0.5, *cs["UR"]),
                (w - 0.5, h - 0.5, *cs["LR"]),
                (0.5, h - 0.5, *cs["LL"])]
        gt = _gcps_to_gt(gcps)

    proj = (_get_value(header, "MAP PROJECTION", 4) or "").strip()
    ellips = (_get_value(header, "ELLIPSOID", 18) or "").strip()
    meta["projection"] = proj
    if proj.startswith("UTM") and zone:
        south = all(c[1] > 0 for c in corners.values() if c) and \
            "S" in (header[header.find("UL "):header.find("UL ") + 31]
                    if "UL " in header else "")
        # hemisphere from the corner latitude letter in the geographic
        # fields ("...N"/"...S" 14 chars after the marker)
        i = header.find("UL ")
        hem_south = False
        if i >= 0:
            geo = header[i:i + 31]
            hem_south = geo.count("S") > 0 and "N" not in geo
        meta["crs"] = f"EPSG:{32700 + zone if hem_south else 32600 + zone}"
        del south
    return np.ascontiguousarray(px), gt, None, meta
