"""Minimal PNG codec — pure numpy + zlib, standard-conformant output.

Covers the subset our raster model needs (reference driver:
frmts/png/pngdataset.cpp behavior): 8-bit grayscale, gray+alpha, RGB,
RGBA. Encodes with filter type 0 (None) per scanline — simple, fast and
deterministic; decodes all five standard filter types (None/Sub/Up/
Average/Paeth) so any conformant producer round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # nbands -> PNG color type
_NBANDS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, bands) uint8 → PNG bytes."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nb = img.shape
    if img.dtype != np.uint8:
        raise ValueError("png codec is 8-bit only")
    if nb not in _COLOR_TYPE:
        raise ValueError(f"unsupported band count {nb}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[nb], 0, 0, 0)
    # scanlines with filter byte 0 prepended
    raw = np.empty((h, 1 + w * nb), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = np.ascontiguousarray(img).reshape(h, w * nb)
    idat = zlib.compress(raw.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, bands) uint8 (bands dim kept even for gray)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = nb = None
    idat = bytearray()
    while off < len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4:off + 8]
        data = buf[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or inter != 0 or ctype not in _NBANDS:
                raise ValueError("unsupported PNG variant")
            nb = _NBANDS[ctype]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * nb
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    if np.all(filters == 0):
        return data.astype(np.uint8).reshape(h, w, nb)
    out = np.zeros((h, w * nb), dtype=np.int32)
    bpp = nb
    for y in range(h):
        f = filters[y]
        line = data[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(w * nb, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 1:  # Sub
            for i in range(w * nb):
                left = out[y, i - bpp] if i >= bpp else 0
                out[y, i] = (line[i] + left) & 0xFF
        elif f == 3:  # Average
            for i in range(w * nb):
                left = out[y, i - bpp] if i >= bpp else 0
                out[y, i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(w * nb):
                a = out[y, i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8).reshape(h, w, nb)
