"""USGS Optional ASCII DEM (and CDED) reader.

Reference semantics: frmts/usgsdem/usgsdemdataset.cpp — A record
header at fixed byte offsets (coord system/zone at 156, units at 528,
corners at 546, resolutions at 816, profile count at 858, datum at
890), then one B record per profile (column): whitespace-tokenized
ints for row/col ids and point counts, FIXED-WIDTH 24-char Fortran
D-exponent doubles for the profile origin/offset/min/max, then the
elevations as tokenized ints.  Four A-record layout generations are
sniffed by probing for the first profile's "1 1" ids at offsets 1024
(new), 893 (undocumented, 39109h1.dem), 918 (FEMA lidar-era) and 864
(old); 1025-byte newline-terminated records are detected by the '\\n'
at bytes 1024 and 2049.  In the 1024-record layout each profile is
padded to the next 1024-byte boundary.  Elevations are
``v * z_res + profile_offset``; nodata -32767; int16 output unless
the vertical unit is feet or z_res < 1 (then float32).  UTM quads
place each profile by its own y-origin (lygap logic).

Golden parity (tests/test_usgsdem.py): the reference's own
autotest/gdrivers/usgsdem.py checksums — 022gdeme 1583, 114p01 53864,
39079G6 61424 (WGS72 UTM 17), 39109h1 39443 (NAD27 UTM 12), 4619old
10659, extra-values 56679, spaces-after-864 61078, 1025-records 14172
— plus the published geotransforms.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["decode_usgsdem"]

NODATA = -32767

_INT = re.compile(rb"[ \t\r\n\f\v]*([+-]?[0-9]+)")


class _Cur:
    """Tokenizing cursor mirroring the reference's buffered reader."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_int(self) -> int | None:
        m = _INT.match(self.buf, self.pos)
        if not m:
            return None
        self.pos = m.end()
        return int(m.group(1))

    def read_fixed_double(self, n: int) -> float:
        raw = self.buf[self.pos:self.pos + n]
        self.pos += n
        s = raw.replace(b"D", b"E").replace(b"d", b"E").strip()
        return float(s) if s else 0.0


def _read_int_at(buf: bytes, off: int):
    """(value, end-position) of the first int token at/after off."""
    m = _INT.match(buf, off)
    if not m:
        return 0, off
    return int(m.group(1)), m.end()


def _dconv(buf: bytes, off: int, n: int) -> float:
    s = buf[off:off + n].replace(b"D", b"E").replace(b"d", b"E").strip()
    try:
        return float(s)
    except ValueError:
        return 0.0


# horizontal datum code (byte 890) → geographic / UTM EPSG base
_GEOG = {1: "EPSG:4267", 2: "EPSG:4322", 3: "EPSG:4326", 4: "EPSG:4269"}
_UTM_BASE = {1: 26700, 2: 32200, 3: 32600, 4: 26900}


def decode_usgsdem(buf: bytes):
    """USGS DEM bytes → (pixels (h, w) int16|float32 north-up,
    geotransform, nodata, meta)."""
    # --- layout generation sniff (usgsdemdataset.cpp LoadFromFile) ---
    v1, end = _read_int_at(buf, 864)
    v2, end = _read_int_at(buf, end)
    new_format = end >= 1024 or v1 != 1 or v2 != 1
    if new_format:
        data_start = None
        for probe in (1024, 893, 918):
            i, e = _read_int_at(buf, probe)
            j, _ = _read_int_at(buf, e)
            ok = (i == 1 and j in (0, 1)) if probe == 1024 else \
                 (i == 1 and j == 1)
            if ok:
                data_start = probe
                break
        if data_start is None:
            raise ValueError("not a USGS DEM file")
        if data_start == 1024 and len(buf) > 2049 and \
                buf[1024:1025] == b"\n" and buf[2049:2050] == b"\n":
            data_start = 1025
    else:
        data_start = 864

    coordsys, e = _read_int_at(buf, 156)
    zone, _ = _read_int_at(buf, e)
    gunit, e = _read_int_at(buf, 528)
    vunit, _ = _read_int_at(buf, e)

    dx = _dconv(buf, 816, 12)
    dy = _dconv(buf, 828, 12)
    zres = _dconv(buf, 840, 12)
    if dy == 0:
        raise ValueError("USGS DEM y resolution is 0")

    float_out = vunit == 1 or zres < 1.0

    # four corners SW NW NE SE, each x,y as D24.15
    corners = [(_dconv(buf, 546 + 48 * i, 24),
                _dconv(buf, 546 + 48 * i + 24, 24)) for i in range(4)]
    min_x = min(corners[0][0], corners[1][0])
    max_x = max(corners[2][0], corners[3][0])
    min_y = min(corners[0][1], corners[3][1])
    max_y = max(corners[1][1], corners[2][1])

    n_profiles, _ = _read_int_at(buf, 858)
    if n_profiles <= 0:
        raise ValueError("USGS DEM reports no profiles")

    datum = 0
    if new_format:
        try:
            datum = int(buf[890:892].strip() or 0)
        except ValueError:
            datum = 0

    crs = None
    geographic = coordsys not in (1, 2, -9999)
    geog = _GEOG.get(datum, "EPSG:4267" if (not new_format or
                                            datum != -9) else None)
    if coordsys == 1 and -60 <= zone <= 60 and zone != 0:
        base = _UTM_BASE.get(datum, 26700)
        crs = f"EPSG:{base + abs(zone)}"
    elif geographic:
        crs = geog

    # --- grid shape + geotransform ---
    if not geographic:
        lo_y = np.floor(min_y / dy) * dy
        hi_y = np.ceil(max_y / dy) * dy
        ysize = int((hi_y - lo_y) / dy + 1.5)
        # x origin from the first profile's own x-start
        c = _Cur(buf, data_start)
        for _ in range(4):
            c.read_int()
        dx_start = c.read_fixed_double(24)
        gt = (dx_start - dx / 2.0, dx, 0.0,
              hi_y + dy / 2.0, 0.0, -dy)
    else:
        ysize = int((max_y - min_y) / dy + 1.5)
        gt = ((min_x - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (max_y + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)
    xsize = n_profiles

    out = np.full((ysize, xsize), NODATA,
                  np.float32 if float_out else np.int16)
    y_min_center = gt[3] + (ysize - 0.5) * gt[5]

    cur = _Cur(buf, data_start)
    for i in range(xsize):
        if cur.read_int() is None:          # row id (1)
            break
        cur.read_int()                       # column id (i+1)
        n_pts = cur.read_int() or 0
        cur.read_int()                       # n cols in profile (1)
        cur.read_fixed_double(24)            # x start
        dy_start = cur.read_fixed_double(24)
        elev_off = cur.read_fixed_double(24)
        cur.read_fixed_double(24)            # profile min z
        cur.read_fixed_double(24)            # profile max z
        if geographic:
            dy_start /= 3600.0
        lygap = int((y_min_center - dy_start) / gt[5] + 0.5)

        if n_pts > 0:
            vals = np.empty(n_pts, np.int32)
            got = 0
            for m in _INT.finditer(buf, cur.pos):
                vals[got] = int(m.group(1))
                got += 1
                if got == n_pts:
                    cur.pos = m.end()
                    break
            if got < n_pts:
                vals = vals[:got]
            iy = ysize - np.arange(lygap, lygap + len(vals)) - 1
            keep = (iy >= 0) & (iy < ysize) & (vals != NODATA)
            # float32 math + C truncation-toward-zero, as the
            # reference casts float→GInt16
            elev = (vals[keep].astype(np.float32) * np.float32(zres)
                    + np.float32(elev_off))
            if not float_out:
                elev = np.clip(np.trunc(elev), -32768, 32767)
            out[iy[keep], i] = elev

        if data_start == 1024:
            cur.pos = (cur.pos + 1023) // 1024 * 1024

    meta = {"driver": "USGSDEM",
            "units": "ft" if vunit == 1 else "m",
            "area_or_point": "Point"}
    if crs:
        meta["crs"] = crs
    return out, gt, float(NODATA), meta
