"""DTED (MIL-PRF-89020 Digital Terrain Elevation Data) reader.

Reference: frmts/dted/dted_api.c — UHL (80 bytes: DDDMMSSH origin,
intervals in tenths of arc-seconds, line/point counts), DSI (648) and
ACC (2700) headers skipped, then one record per LONGITUDE column:
0xAA sentinel + block/lon/lat counts, big-endian MAGNITUDE-SIGN
int16 samples south→north, 4-byte checksum. Sign is a flag bit
(0x8000), NOT two's complement (dted_api.c DTEDReadProfileEx); nodata
is -32767 and the CRS is WGS 84 geographic.

Golden parity (tests/test_aaigrid_dted.py): n43.dt0 → checksum 49187
+ the 1/120° geotransform (autotest/gdrivers/dted.py:31,39-55).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_dted"]

_UHL, _DSI, _ACC = 80, 648, 2700
NODATA = -32767.0


def _angle(field: bytes) -> float:
    """DDDMMSS.S?H or DDDMMSSH → signed degrees."""
    s = field.decode("ascii").strip()
    hemi = s[-1].upper()
    body = s[:-1]
    sec_len = len(body) - 5                  # DDD MM SS[.S]
    deg = int(body[:3])
    mins = int(body[3:5])
    sec = float(body[5:5 + sec_len]) if sec_len > 0 else 0.0
    val = deg + mins / 60.0 + sec / 3600.0
    return -val if hemi in ("S", "W") else val


def decode_dted(buf: bytes):
    """DTED bytes → (elevations (h, w) int16 north-up, geotransform,
    nodata)."""
    if buf[:3] != b"UHL":
        # some products begin with a HDR (or other) record before the
        # UHL (reference #2951, w118n033_trunc.dt1): scan ahead
        idx = buf.find(b"UHL1", 0, 1 << 16)
        if idx < 0:
            raise ValueError("not a DTED file (no UHL)")
        buf = buf[idx:]
    lon0 = _angle(buf[4:12])
    lat0 = _angle(buf[12:20])
    # MIL-D-89020 pre-Amendment-1 bug: some products invert the UHL
    # lon/lat fields; detect by the hemisphere letters (lon must end
    # E/W) and swap like the reference (dted_api.c)
    lon_h = chr(buf[11]).upper()
    lat_h = chr(buf[19]).upper()
    if lon_h in ("N", "S") and lat_h in ("E", "W"):
        lon0, lat0 = lat0, lon0
    lon_int = int(buf[20:24]) / 36000.0      # tenths of arc-sec → deg
    lat_int = int(buf[24:28]) / 36000.0
    n_lon = int(buf[47:51])
    n_lat = int(buf[51:55])

    out = np.full((n_lat, n_lon), NODATA, np.float64)
    pos = _UHL + _DSI + _ACC
    rec = 8 + 2 * n_lat + 4
    for c in range(n_lon):
        o = pos + c * rec
        if o + rec > len(buf):
            break                            # truncated: rest nodata
        if buf[o] != 0xAA:
            raise ValueError(f"bad DTED record sentinel at column {c}")
        raw = np.frombuffer(buf, ">u2", n_lat, o + 8).astype(np.int64)
        vals = np.where(raw & 0x8000, -(raw & 0x7FFF), raw)
        out[::-1, c] = vals                  # south→north → north-up
    gt = (lon0 - lon_int / 2, lon_int, 0.0,
          lat0 + (n_lat - 1) * lat_int + lat_int / 2, 0.0, -lat_int)
    return out.astype(np.int16), gt, NODATA
