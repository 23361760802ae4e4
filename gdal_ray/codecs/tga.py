"""TGA / Truevision TARGA decoder (public TGA 2.0 spec).

Returns ``(pixels, geotransform=None, nodata=None, meta)`` like the
other codecs. Pixels: grayscale → (h, w) uint8/uint16; color-mapped →
(h, w) uint8 indices with ``meta["palette"]`` as an (n, 4) uint8 RGBA
array (GDAL exposes the index band + color table); true-color →
(h, w, 3|4) uint8 (16-bit 5-5-5 expanded per channel as
``((v >> 5k) & 31) << 3`` — frmts/tga/tgadataset.cpp:375).

Reference behavior parity: frmts/tga/tgadataset.cpp — fourth channel
only when the descriptor's alpha-bit count is 8 (``:585``), dropped if
the extension-area attribute type is 1, not-alpha if 2 (``:655-665``);
v2 footer "TRUEVISION-XFILE." → AUTHOR_NAME / COMMENTS metadata
(``:594-648``); image-ID bytes → IMAGE_ID; bottom-up rows flipped
unless descriptor bit 5 (``:289``). RLE runs may cross scanlines
(pre-2.0 files do this; tgadataset.cpp ScanlineState).

Goldens in tests/test_tga.py from autotest/gdrivers/tga.py
(cbw8 43089, ccm8 38151 + palette entries, ctc24 9797/9952/9848,
ubw8/ucm8, utc16 64747/64839/64796, utc24, utc32).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tga"]


def _expand555(v: np.ndarray) -> np.ndarray:
    """A1R5G5B5 → (n, 3) uint8 via the reference's << 3 expansion."""
    return np.stack([(((v >> 10) & 31) << 3).astype(np.uint8),
                     (((v >> 5) & 31) << 3).astype(np.uint8),
                     ((v & 31) << 3).astype(np.uint8)], axis=-1)


def _read_rle(buf: bytes, off: int, n_pixels: int, bpp: int) -> np.ndarray:
    """Decode the RLE pixel stream → flat (n_pixels, bpp) uint8."""
    out = np.empty((n_pixels, bpp), np.uint8)
    raw = np.frombuffer(buf, np.uint8)
    filled = 0
    while filled < n_pixels:
        rep = raw[off]
        off += 1
        count = (rep & 0x7F) + 1
        count = min(count, n_pixels - filled)
        if rep & 0x80:  # RLE packet: one pixel value repeated
            out[filled:filled + count] = raw[off:off + bpp]
            off += bpp
        else:  # raw packet: count literal pixels
            out[filled:filled + count] = \
                raw[off:off + count * bpp].reshape(count, bpp)
            off += count * bpp
        filled += count
    return out


def decode_tga(buf: bytes):
    (id_len, cmap_type, img_type, cmap_first, cmap_len, cmap_bits,
     _xo, _yo, w, h, depth, desc) = struct.unpack_from("<BBBHHBHHHHBB",
                                                       buf, 0)
    if cmap_type > 1 or img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError("not a TGA file")
    meta: dict = {"driver": "TGA"}
    if id_len:
        meta["IMAGE_ID"] = buf[18:18 + id_len].decode("latin-1")

    # --- v2 footer → extension area (AUTHOR_NAME / COMMENTS /
    # attribute type overriding the fourth channel)
    has_fourth = (desc & 15) == 8
    fourth_is_alpha = True
    if len(buf) >= 26 and buf[-18:] == b"TRUEVISION-XFILE.\x00":
        (ext_off,) = struct.unpack_from("<I", buf, len(buf) - 26)
        if ext_off and ext_off + 495 <= len(buf):
            ext = buf[ext_off:ext_off + 495]
            (ext_size,) = struct.unpack_from("<H", ext, 0)
            if ext_size >= 495:
                if ext[2:3] not in (b" ", b"\x00"):
                    name = ext[2:42].split(b"\x00")[0].decode(
                        "latin-1").rstrip(" ")
                    if name:
                        meta["AUTHOR_NAME"] = name
                if ext[43:44] not in (b" ", b"\x00"):
                    lines = []
                    for i in range(4):
                        seg = ext[43 + 81 * i:43 + 81 * i + 80]
                        if seg[:1] == b"\x00":
                            break
                        lines.append(seg.split(b"\x00")[0].decode(
                            "latin-1").rstrip(" "))
                    meta["COMMENTS"] = "\n".join(lines)
                attr_type = ext[494]
                if attr_type == 1:
                    has_fourth = False
                elif attr_type == 2:
                    fourth_is_alpha = False

    off = 18 + id_len
    # --- color map (BGR / BGRA / A1R5G5B5 entries)
    palette = None
    if cmap_type == 1:
        entry_bytes = (cmap_bits + 7) // 8
        raw = np.frombuffer(buf, np.uint8, cmap_len * entry_bytes,
                            off).reshape(cmap_len, entry_bytes)
        pal = np.zeros((cmap_first + cmap_len, 4), np.uint8)
        pal[:, 3] = 255
        if cmap_bits in (15, 16):
            v = raw[:, 0].astype(np.uint16) | \
                (raw[:, 1].astype(np.uint16) << 8)
            pal[cmap_first:, :3] = _expand555(v)
        elif cmap_bits == 24:
            pal[cmap_first:, :3] = raw[:, [2, 1, 0]]
        elif cmap_bits == 32:
            pal[cmap_first:, :3] = raw[:, [2, 1, 0]]
            pal[cmap_first:, 3] = raw[:, 3]
        else:
            raise ValueError(f"TGA colormap entry size {cmap_bits}")
        palette = pal
        off += cmap_len * entry_bytes

    # --- pixel data
    n = w * h
    bpp = depth // 8
    if img_type >= 9:  # RLE variants
        flat = _read_rle(buf, off, n, bpp)
    else:
        flat = np.frombuffer(buf, np.uint8, n * bpp, off).reshape(n, bpp)

    base = img_type if img_type < 9 else img_type - 8
    if base == 3 or (base == 1 and palette is None):  # grayscale
        if depth == 8:
            px = flat[:, 0].reshape(h, w)
        elif depth == 16:
            px = flat.view("<u2").reshape(h, w)
        else:
            raise ValueError(f"TGA gray depth {depth}")
    elif base == 1:  # color-mapped: return indices + palette
        if depth == 8:
            px = flat[:, 0].reshape(h, w)
        elif depth == 16:
            px = flat.view("<u2").reshape(h, w)
        else:
            raise ValueError(f"TGA colormap depth {depth}")
        meta["palette"] = palette
    else:  # true color
        if depth == 16:
            v = flat.view("<u2").reshape(n)
            px = _expand555(v).reshape(h, w, 3)
        elif depth == 24:
            px = flat[:, [2, 1, 0]].reshape(h, w, 3)  # BGR → RGB
        elif depth == 32:
            if has_fourth:
                px = flat[:, [2, 1, 0, 3]].reshape(h, w, 4)
                meta["fourth_is_alpha"] = fourth_is_alpha
            else:
                px = flat[:, [2, 1, 0]].reshape(h, w, 3)
        else:
            raise ValueError(f"TGA truecolor depth {depth}")

    if not desc & (1 << 5):  # bottom-up unless bit 5: flip to north-up
        px = px[::-1]
    if desc & (1 << 4):  # right-to-left
        px = px[:, ::-1]
    return np.ascontiguousarray(px), None, None, meta
