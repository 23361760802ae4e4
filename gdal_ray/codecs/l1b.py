"""NOAA AVHRR Level-1B reader — the KLM (NOAA-15 and later) formats,
with or without the 512-byte ARS header, both byte orders.

Reference frmts/l1b/l1bdataset.cpp: format detection by the dataset
name's dot positions (DetectFormat), endianness by a
year/day/header-count consistency probe (l1bdataset.cpp:1714-1741),
record geometry per product type and data format (ComputeFileOffsets:
HRPT/LAC/FRAC 2048 px, PACKED10BIT rec 15872, UNPACKED16BIT rec
22528/..., data header 1264 bytes; AAPP datasets whose header says
logical-record-length 22016 are unpacked 16-bit with both offsets
22016), 10-bit triplets packed into big/little 32-bit words,
ascending passes stored bottom-up and mirrored, scanline quality
bit 31 at record+24 as the validity mask, 51 GCPs per line as
int32 lat/lon * 1e4 at record+640 (pixels 24.5 + 40k), GRS 80 /
WGS-84 ellipsoid switch at header offset 328.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_SPACECRAFT = {2: "NOAA-16", 4: "NOAA-15", 6: "NOAA-17", 7: "NOAA-18",
               8: "NOAA-19", 11: "METOP-1", 12: "METOP-2",
               13: "METOP-3", 14: "METOP-3"}
_PRODUCT = {1: "LAC", 2: "GAC", 3: "HRPT", 4: "FRAC", 13: "FRAC"}

# HRPT/LAC/FRAC record geometry, NOAA15 family
# data format -> (record size, record data end)
_HRPT_REC = {"10": (15872, 14920),
             "16": {1: (6144, 5360), 2: (10240, 9456), 3: (14336, 13552),
                    4: (18432, 17648), 5: (22528, 21744)},
             "08": {1: (4096, 3312), 2: (6144, 5360), 3: (8192, 7408),
                    4: (10240, 9456), 5: (12288, 11504)}}
_GAC_REC = {"10": (4608, 3992),
            "16": {5: (5568, 4544)},
            "08": {5: (3584, 2560)}}


def _dots(buf: bytes, base: int) -> bool:
    return all(buf[base + i] == 0x2E for i in (25, 30, 33, 40, 46, 52, 61))


def decode_l1b(path: str):
    """-> (pixels (y, 2048|409, nbands) uint16, None, None, meta with
    'mask' (y,) bool, 'gcps', 'crs', satellite metadata)."""
    buf = open(path, "rb").read()
    if len(buf) < 512 + 62:
        raise ValueError("L1B: file too short")
    if _dots(buf, 0):
        ars = False                   # AAPP / no ARS header
    elif _dots(buf, 512):
        ars = True
    elif _dots(buf, 8):
        raise ValueError("L1B: NOAA-9/14 (POD) format not supported")
    else:
        raise ValueError("not an L1B dataset")

    hdr_off = 512 if ars else 0
    hdr = buf[hdr_off:hdr_off + 992]

    # endianness probe (year/day/header-count plausibility)
    le = "<"
    for endian in (">", "<"):
        year, = struct.unpack_from(endian + "H", hdr, 6)
        day, = struct.unpack_from(endian + "H", hdr, 8)
        cnt, = struct.unpack_from(endian + "H", hdr, 14)
        if 1980 <= year <= 2100 and day <= 366 and cnt >= 1:
            le = endian
            break

    def u16(b, off):
        return struct.unpack_from(le + "H", b, off)[0]

    def u32(b, off):
        return struct.unpack_from(le + "I", b, off)[0]

    nbands = 5
    fmt = "10"
    if ars:
        chans = buf[97:117]
        mask_bits = [i for i in range(20) if chans[i] in (1, ord("Y"))]
        if 0 < len(mask_bits) <= 5:
            nbands = len(mask_bits)
        word = buf[117:119].decode("ascii", "replace")
        if word in ("10", "16", "08"):
            fmt = word

    rec_from_hdr = u16(hdr, 10)
    prod = u16(hdr, 76)
    product = _PRODUCT.get(prod)
    if product is None:
        raise ValueError(f"L1B: unknown product type {prod}")

    if product == "GAC":
        width = 409
        table = _GAC_REC
        gcp_start, gcp_step = 5 - 1, 8
    else:
        width = 2048
        table = _HRPT_REC
        gcp_start, gcp_step = 25 - 1, 40

    if not ars and rec_from_hdr == 22016 and len(buf) % 22016 == 0:
        fmt = "16"
        rec_size = data_start = 22016
    else:
        ent = table[fmt]
        if fmt != "10":
            ent = ent[nbands]
        rec_size, rec_end = ent
        data_start = (512 + rec_size) if ars else rec_end
    rec_data_start = 1264

    ny = (len(buf) - data_start) // rec_size
    if ny <= 0:
        raise ValueError("L1B: no scanlines")

    descend_flag = u16(buf, data_start + 12) & 0x8000
    descend = bool(descend_flag)

    px = np.zeros((ny, width, nbands), np.uint16)
    line_ok = np.ones(ny, bool)
    gcps = []
    for out_line in range(ny):
        i = out_line if descend else ny - out_line - 1
        rec = buf[data_start + i * rec_size:
                  data_start + (i + 1) * rec_size]
        if len(rec) < rec_size:
            break
        if (u32(rec, 24) >> 31) != 0:           # fatal quality flag
            line_ok[out_line] = False
        if fmt == "10":
            words = np.frombuffer(rec, le + "u4",
                                  (14920 - rec_data_start) // 4
                                  if product != "GAC" else
                                  (len(rec) - rec_data_start) // 4,
                                  rec_data_start)
            scan = np.empty(words.size * 3, np.uint16)
            scan[0::3] = (words >> 20) & 0x3FF
            scan[1::3] = (words >> 10) & 0x3FF
            scan[2::3] = words & 0x3FF
        elif fmt == "16":
            scan = np.frombuffer(rec, le + "u2", width * nbands,
                                 rec_data_start)
        else:
            scan = np.frombuffer(rec, np.uint8, width * nbands,
                                 rec_data_start).astype(np.uint16)
        line = scan[:width * nbands].reshape(width, nbands)
        px[out_line] = line if descend else line[::-1]

        # 51 GCPs: int32 lat/lon * 1e4 at offset 640
        raw = np.frombuffer(rec, le + "i4", 51 * 2, 640)
        lat = raw[0::2] / 10000.0
        lon = raw[1::2] / 10000.0
        pixel0 = (gcp_start + 0.5) if descend else (width - gcp_start
                                                    - 0.5)
        step = gcp_step if descend else -gcp_step
        gline = (i if descend else ny - i - 1) + 0.5
        for k in range(51):
            if -180 <= lon[k] <= 180 and -90 <= lat[k] <= 90:
                gcps.append({"pixel": pixel0 + k * step, "line": gline,
                             "x": float(lon[k]), "y": float(lat[k])})

    ell = hdr[328:336].decode("ascii", "replace")
    crs = "GRS80" if ell.strip() == "GRS 80" else "EPSG:4326"
    meta = {"driver": "L1B", "crs": crs,
            "DATASET_NAME": hdr[22:64].decode("ascii", "replace").strip(),
            "SATELLITE": _SPACECRAFT.get(u16(hdr, 72), "unknown"),
            "DATA_TYPE": product,
            "LOCATION": "Descending" if descend else "Ascending",
            "mask": line_ok, "gcps": gcps,
            "missing_scanlines": u16(hdr, 132)}
    return px, None, None, meta
