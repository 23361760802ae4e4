"""COSAR (TerraSAR-X annotated binary matrix) reader.

Layout (frmts/cosar/cosar_dataset.cpp): big-endian header words —
range samples (width) at byte 8, azimuth samples (height) at 12,
rangeline total number of bytes RTNB at 20, magic ``CSAR`` at 28,
version at 32 (1 = COSAR, complex int16; 2 = COSSC, complex
half-float).  Four annotation lines precede the data; each range
line starts with RSFV/RSLV (first/last valid sample, 1-based),
samples outside that window are zero-filled (:86-130)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_cosar"]


def decode_cosar(buf: bytes):
    if len(buf) < 36 or buf[28:32] != b"CSAR":
        raise ValueError("not a COSAR file")
    w = struct.unpack_from(">i", buf, 8)[0]
    h = struct.unpack_from(">i", buf, 12)[0]
    rtnb = struct.unpack_from(">I", buf, 20)[0]
    version = struct.unpack_from(">I", buf, 32)[0]
    if version not in (1, 2):
        raise ValueError(f"COSAR: unknown version {version}")
    if w <= 0 or h <= 0 or rtnb < 8 + 4 * w:
        raise ValueError("COSAR: invalid dimensions")

    # data lines start after 4 annotation lines of RTNB bytes each
    need = rtnb * (h + 4)
    if len(buf) < need:
        raise ValueError("COSAR: truncated file")
    lines = np.frombuffer(buf, dtype=np.uint8,
                          count=rtnb * h, offset=rtnb * 4
                          ).reshape(h, rtnb)
    rsfv = lines[:, 0:4].copy().view(">u4")[:, 0].astype(np.int64)
    rslv = lines[:, 4:8].copy().view(">u4")[:, 0].astype(np.int64)
    samples = lines[:, 8:8 + 4 * w]
    pairs = np.ascontiguousarray(samples).view(">i2").reshape(h, w, 2)
    if version == 1:
        px = (pairs[:, :, 0].astype(np.float32)
              + 1j * pairs[:, :, 1].astype(np.float32)
              ).astype(np.complex64)
    else:
        bits = np.ascontiguousarray(samples).view(">u2").astype("<u2")
        fl = bits.view(np.float16).astype(np.float32).reshape(h, w, 2)
        px = (fl[:, :, 0] + 1j * fl[:, :, 1]).astype(np.complex64)

    # validity window: zero samples outside [RSFV, RSLV] (1-based)
    cols = np.arange(1, w + 1)[None, :]
    valid = (cols >= np.clip(rsfv, 1, w)[:, None]) & \
        (cols <= np.clip(rslv, 1, w)[:, None])
    px = np.where(valid, px, 0).astype(np.complex64)
    meta = {"driver": "COSAR", "version": int(version),
            "dtype": "CInt16" if version == 1 else "CFloat32"}
    return px, None, None, meta
