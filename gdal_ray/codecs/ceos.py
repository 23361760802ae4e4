"""CEOS (Committee on Earth Observation Satellites) imagery reader —
the plain optical CEOS layout (reference frmts/ceos/ceosopen.c, used
by IRS/Landsat distributions; the SAR flavor lives in frmts/ceos2).

Records carry a 12-byte header (record number u32, type u32, length
u32, big-endian; whole header byte-swapped on little-endian files,
detected by the first two bytes being nonzero).  The image file
descriptor record (type 0x3FC01212) holds ASCII integers at fixed
offsets: record count @180/6, record length @186/6, bits per pixel
@216/4, bands @232/4, lines @236/8, pixels @248/8, prefix @276/4,
suffix @288/4.  Band b of line y starts at
fdr_length + b*rec_len + 12 + prefix + y*(bands*rec_len).
Truncated files zero-fill missing lines (GDALTest windowed-checksum
convention).
"""

from __future__ import annotations

import struct

import numpy as np

_CRT_IMAGE_FDR = 0x3FC01212


def _scan_int(data: bytes, off: int, width: int) -> int:
    s = data[off:off + width].decode("ascii", "replace").strip()
    return int(s) if s else 0


def decode_ceos(path: str):
    """-> (pixels (lines, pixels) or (lines, pixels, bands) uint8/16,
    None, None, meta)."""
    buf = open(path, "rb").read()
    if len(buf) < 300:
        raise ValueError("CEOS: file too short")
    little = buf[0] != 0 or buf[1] != 0
    hdr = bytearray(buf[:12])
    if little:
        hdr[0:4] = hdr[3::-1]
        hdr[8:12] = hdr[11:7:-1]
    rec_type = struct.unpack_from(">I", hdr, 4)[0]
    fdr_len = struct.unpack_from(">I", hdr, 8)[0]
    if rec_type != _CRT_IMAGE_FDR:
        raise ValueError("CEOS: not an image file descriptor record")
    if not (12 <= fdr_len <= 200000):
        raise ValueError("CEOS: corrupt record length")
    fdr = buf[:fdr_len]
    if fdr[16:28] == b"CEOS-SAR-CCT":
        raise ValueError("CEOS: SAR CCT flavor not handled here")
    rec_len = _scan_int(fdr, 186, 6)
    bits = _scan_int(fdr, 216, 4)
    bands = _scan_int(fdr, 232, 4)
    lines = _scan_int(fdr, 236, 8)
    pixels = _scan_int(fdr, 248, 8)
    prefix = _scan_int(fdr, 276, 4)
    if rec_len <= 0 or bands <= 0 or lines <= 0 or pixels <= 0:
        raise ValueError("CEOS: bad image dimensions")
    if bits not in (8, 16):
        raise ValueError(f"CEOS: {bits}-bit data not supported")
    dtype = np.uint8 if bits == 8 else np.dtype(">u2")
    bpp = bits // 8
    line_stride = bands * rec_len

    out = np.zeros((lines, pixels, bands),
                   np.uint8 if bits == 8 else np.uint16)
    for b in range(bands):
        start = fdr_len + b * rec_len + 12 + prefix
        for y in range(lines):
            off = start + y * line_stride
            end = off + pixels * bpp
            if off >= len(buf):
                break
            chunk = buf[off:end]
            row = np.frombuffer(chunk, dtype, len(chunk) // bpp)
            out[y, :len(row), b] = row
    meta = {"driver": "CEOS", "bits_per_pixel": bits,
            "record_length": rec_len}
    if bands == 1:
        out = out[:, :, 0]
    return out, None, None, meta
