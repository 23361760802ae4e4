"""JAXA PALSAR (ALOS) Level 1.1 / 1.5 product reader.

Layout (frmts/jaxapalsar/jaxapalsardataset.cpp): a CEOS-style volume
directory file (``VOL-ALPSR…``, record seq 1, subtype/type bytes
192/192/18/18, record length 360) next to per-polarization image
files ``IMG-{HH,HV,VH,VV}<suffix>`` and a leader ``LED<suffix>``.

Image files: 720-byte image-option descriptor with ASCII fields —
bits per sample at 216 (len 4), samples per group at 220 (len 4),
SAR data record length at 186 (len 6), number of lines at 236
(len 8); 32-bit × 2 samples = level 1.1 complex float32 (data at
offset 412 within each record), 8-bit × 2 = level 1.0 (unsupported,
like the reference), anything else = level 1.5 uint16 (data at
offset 192).  Sample words are big-endian; width = (record length −
data offset) / bytes-per-group (:239-270).  The reference's
IReadBlock seeks with ``(nBlockYOff − 1) * nRecordSize`` — an
off-by-one kept since 2007 that makes line 0 read descriptor bytes;
we read the records where they actually are (record y at
720 + y·recordLength).

Leader: 720-byte descriptor + 4096-byte dataset summary; level-1.5
metadata (looks, pixel spacing, projection name) and the four
corner lat/lon GCPs as 16-char ASCII floats at the documented
offsets (:430-490)."""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_palsar", "identify_palsar"]


def identify_palsar(path: str) -> bool:
    base = os.path.basename(path)
    if len(base) < 9 or base[4:9].upper() != "ALPSR":
        return False
    try:
        with open(path, "rb") as fh:
            head = fh.read(360)
    except OSError:
        return False
    if len(head) < 360 or head[60:62] != b"AL":
        return False
    seq = struct.unpack_from(">I", head, 0)[0]
    length = struct.unpack_from(">I", head, 8)[0]
    return (seq == 1 and head[4] == 192 and head[5] == 192
            and head[6] == 18 and head[7] == 18 and length == 360)


def _ascii_int(buf: bytes, off: int, n: int) -> int:
    try:
        return int(buf[off:off + n].decode("ascii", "replace").strip()
                   or 0)
    except ValueError:
        return 0


def _ascii_float(buf: bytes, off: int, n: int = 16) -> float:
    try:
        return float(buf[off:off + n].decode("ascii", "replace").strip()
                     or 0)
    except ValueError:
        return 0.0


def _read_img(path: str):
    with open(path, "rb") as fh:
        buf = fh.read()
    bits = _ascii_int(buf, 216, 4)
    group = _ascii_int(buf, 220, 4)
    rec_len = _ascii_int(buf, 186, 6)
    n_lines = _ascii_int(buf, 236, 8)
    if bits == 32 and group == 2:
        level, data_off = "1.1", 412
    elif bits == 8 and group == 2:
        raise ValueError("PALSAR: level 1.0 products not supported "
                         "(matches the reference driver)")
    else:
        level, data_off = "1.5", 192
    denom = (bits // 8) * group if bits else 2
    width = (rec_len - data_off) // max(denom, 1)
    if width <= 0 or n_lines <= 0:
        raise ValueError("PALSAR: invalid image dimensions")
    lines = np.frombuffer(buf, dtype=np.uint8, count=rec_len * n_lines,
                          offset=720).reshape(n_lines, rec_len)
    payload = lines[:, data_off:data_off + width * denom]
    if level == "1.1":
        f = np.ascontiguousarray(payload).view(">f4").astype(
            np.float32).reshape(n_lines, width, 2)
        px = (f[:, :, 0] + 1j * f[:, :, 1]).astype(np.complex64)
    else:
        px = np.ascontiguousarray(payload).view(">u2").astype(
            np.uint16).reshape(n_lines, width)
    return px, level


def read_palsar(path: str):
    """Open via the VOL- volume directory file → ``(pixels, None,
    None, meta)``; multiple polarizations stack as the last axis in
    HH, HV, VH, VV order with ``meta['polarizations']``."""
    if not identify_palsar(path):
        raise ValueError("not a JAXA PALSAR volume directory file")
    d = os.path.dirname(path) or "."
    suffix = os.path.basename(path)[3:]
    bands = []
    pols = []
    level = None
    for pol in ("HH", "HV", "VH", "VV"):
        img = os.path.join(d, f"IMG-{pol}{suffix}")
        if os.path.exists(img):
            px, level = _read_img(img)
            bands.append(px)
            pols.append(pol)
    if not bands:
        raise ValueError("PALSAR: no IMG- polarization files found")
    meta = {"driver": "JAXAPALSAR", "polarizations": pols,
            "PRODUCT_LEVEL": level, "SENSOR_BAND": "L",
            "RANGE_LOOKS": "1.0"}
    if len(pols) == 4:
        meta["MATRIX_REPRESENTATION"] = "SCATTERING"

    led = os.path.join(d, f"LED{suffix}")
    if os.path.exists(led) and level == "1.5":
        with open(led, "rb") as fh:
            lbuf = fh.read()
        base = 720 + 4096
        meta["AZIMUTH_LOOKS"] = _ascii_float(lbuf, 720 + 1174)
        meta["PIXEL_SPACING"] = _ascii_float(lbuf, base + 92)
        meta["LINE_SPACING"] = _ascii_float(lbuf, base + 108)
        meta["PROJECTION_NAME"] = lbuf[base + 412:base + 444].decode(
            "ascii", "replace").strip()
        h, w = bands[0].shape[:2]
        corners = []
        off = base + 1072
        for _ in range(4):
            lat = _ascii_float(lbuf, off)
            lon = _ascii_float(lbuf, off + 16)
            corners.append((lat, lon))
            off += 32
        # TL, TR, BR, BL at half-pixel inset (reference order)
        pix = [(0.5, 0.5), (w - 0.5, 0.5), (w - 0.5, h - 0.5),
               (0.5, h - 0.5)]
        meta["gcps"] = [(px_, ln_, lon, lat, 0.0)
                        for (lat, lon), (px_, ln_) in zip(corners, pix)]
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return px, None, None, meta
