"""PNM (PGM/PPM) codec — the reference's PNM driver (frmts/raw/
pnmdataset.cpp): P2/P3 ASCII and P5/P6 binary portable gray/pixmaps,
maxval > 255 stored big-endian uint16.

Golden parity: decoding the reference's own fixtures
autotest/gcore/data/byte.pnm and uint16.pnm must checksum 4672
(autotest/gcore/pnm_read.py:20) — asserted in tests/test_pnm_bmp.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_pnm", "encode_pnm"]


def _tokens(buf: bytes):
    """Yield whitespace-separated header tokens, skipping # comments."""
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            j = i
            while j < n and not buf[j:j + 1].isspace():
                j += 1
            yield buf[i:j], j
            i = j


def decode_pnm(buf: bytes) -> np.ndarray:
    """→ (h, w) uint8/uint16 for PGM, (h, w, 3) for PPM."""
    it = _tokens(buf)
    magic, _ = next(it)
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a supported PNM magic: {magic!r}")
    w, _ = next(it)
    h, _ = next(it)
    maxval, end = next(it)
    w, h, maxval = int(w), int(h), int(maxval)
    bands = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * bands
    if magic in (b"P5", b"P6"):
        # exactly ONE whitespace byte separates maxval from raster data
        data = buf[end + 1:]
        if maxval > 255:
            arr = np.frombuffer(data[:count * 2], ">u2").astype(np.uint16)
        else:
            arr = np.frombuffer(data[:count], np.uint8)
    else:
        vals = []
        for tok, _ in it:
            vals.append(int(tok))
            if len(vals) == count:
                break
        dt = np.uint16 if maxval > 255 else np.uint8
        arr = np.array(vals, dt)
    if len(arr) < count:
        raise ValueError("PNM raster data truncated")
    out = arr.reshape(h, w, bands)
    return out[:, :, 0] if bands == 1 else out


def encode_pnm(px: np.ndarray, *, ascii_format: bool = False) -> bytes:
    """Encode (h, w[, 3]) uint8/uint16 as P5/P6 (or P2/P3 ascii)."""
    px = np.asarray(px)
    bands = 1 if px.ndim == 2 else px.shape[2]
    if bands not in (1, 3):
        raise ValueError("PNM supports 1 or 3 bands")
    maxval = 65535 if px.dtype.itemsize > 1 else 255
    h, w = px.shape[:2]
    if ascii_format:
        magic = b"P2" if bands == 1 else b"P3"
        body = b"\n".join(b" ".join(str(int(v)).encode()
                                    for v in row.ravel())
                          for row in px.reshape(h, -1, bands))
        return b"%s\n%d %d\n%d\n%s\n" % (magic, w, h, maxval, body)
    magic = b"P5" if bands == 1 else b"P6"
    data = px.astype(">u2" if maxval > 255 else np.uint8).tobytes()
    return b"%s\n%d %d\n%d\n" % (magic, w, h, maxval) + data
