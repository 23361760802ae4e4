"""DirectDraw Surface (.dds) codec — public DDS / S3TC (BC1-BC3)
layouts.

``decode_dds(buf) -> (pixels, None, None, meta)``: uncompressed
RGB/RGBA surfaces via the pixel-format bit masks, and DXT1/2/3/4/5
block decompression (4×4 BC blocks, two RGB565 endpoints + 2-bit
selectors; DXT1 1-bit punch-through alpha when c0 <= c1; DXT3 explicit
4-bit alpha; DXT5 interpolated 3-bit alpha) — all vectorized numpy,
no per-pixel loops. ``encode_dds`` writes the uncompressed A8R8G8B8
layout (deterministic; the reference's compressed write path wraps
crnlib — frmts/dds/ddsdataset.cpp — so compressed encode is out of
scope here).

Reference parity: frmts/dds/ddsdataset.cpp (read), golden in
tests/test_dds.py from autotest/gdrivers/dds.py
test_dds_no_compression — band checksums of
stefan_full_rgba_no_compression.dds equal the stefan_full_rgba.tif
source's.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_dds", "encode_dds"]

_DDPF_ALPHAPIXELS = 0x1
_DDPF_FOURCC = 0x4
_DDPF_RGB = 0x40


def _mask_extract(pix: np.ndarray, mask: int) -> np.ndarray:
    """Extract a channel through its bit mask, scaled to 0-255."""
    if mask == 0:
        return np.zeros(pix.shape, np.uint8)
    shift = (mask & -mask).bit_length() - 1
    width = int(mask >> shift).bit_length()
    v = (pix >> shift) & (mask >> shift)
    if width < 8:
        v = (v * 255) // ((1 << width) - 1)
    return v.astype(np.uint8)


def _rgb565_pair(c0: np.ndarray, c1: np.ndarray):
    """Expand two RGB565 endpoint arrays → (n, 3) uint8 each."""
    def ex(c):
        r = ((c >> 11) & 31).astype(np.uint16)
        g = ((c >> 5) & 63).astype(np.uint16)
        b = (c & 31).astype(np.uint16)
        return np.stack([(r << 3) | (r >> 2), (g << 2) | (g >> 4),
                         (b << 3) | (b >> 2)], axis=-1).astype(np.uint8)
    return ex(c0), ex(c1)


def _bc1_colors(c0: np.ndarray, c1: np.ndarray, dxt1: bool):
    """Per-block 4-entry color tables (n, 4, 4) RGBA uint8."""
    n = len(c0)
    p0, p1 = _rgb565_pair(c0, c1)
    tab = np.zeros((n, 4, 4), np.uint8)
    tab[:, :, 3] = 255
    tab[:, 0, :3] = p0
    tab[:, 1, :3] = p1
    f0 = p0.astype(np.int32)
    f1 = p1.astype(np.int32)
    if dxt1:
        four = c0 > c1
        tab[four, 2, :3] = ((2 * f0[four] + f1[four]) // 3).astype(np.uint8)
        tab[four, 3, :3] = ((f0[four] + 2 * f1[four]) // 3).astype(np.uint8)
        three = ~four
        tab[three, 2, :3] = ((f0[three] + f1[three]) // 2).astype(np.uint8)
        tab[three, 3, :] = 0  # transparent black
    else:
        tab[:, 2, :3] = ((2 * f0 + f1) // 3).astype(np.uint8)
        tab[:, 3, :3] = ((f0 + 2 * f1) // 3).astype(np.uint8)
    return tab


def _bc_color_pixels(cdata: np.ndarray, dxt1: bool) -> np.ndarray:
    """Decode the 8-byte color half of BC blocks → (n, 4, 4, 4) RGBA."""
    c0 = cdata[:, 0].astype(np.uint16) | (cdata[:, 1].astype(np.uint16) << 8)
    c1 = cdata[:, 2].astype(np.uint16) | (cdata[:, 3].astype(np.uint16) << 8)
    tab = _bc1_colors(c0, c1, dxt1)
    bits = (cdata[:, 4].astype(np.uint32) |
            (cdata[:, 5].astype(np.uint32) << 8) |
            (cdata[:, 6].astype(np.uint32) << 16) |
            (cdata[:, 7].astype(np.uint32) << 24))
    sel = ((bits[:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3)
    out = np.take_along_axis(
        tab, sel.astype(np.intp)[:, :, None], axis=1)  # (n, 16, 4)
    return out.reshape(-1, 4, 4, 4)


def _assemble_blocks(blocks: np.ndarray, w: int, h: int) -> np.ndarray:
    """(nby*nbx, 4, 4, c) block grid → (h, w, c) image."""
    nbx = (w + 3) // 4
    nby = (h + 3) // 4
    c = blocks.shape[-1]
    img = blocks.reshape(nby, nbx, 4, 4, c).transpose(
        0, 2, 1, 3, 4).reshape(nby * 4, nbx * 4, c)
    return np.ascontiguousarray(img[:h, :w])


def _decode_dxt(data: bytes, w: int, h: int, variant: str) -> np.ndarray:
    nbx = (w + 3) // 4
    nby = (h + 3) // 4
    n = nbx * nby
    bsz = 8 if variant == "DXT1" else 16
    raw = np.frombuffer(data, np.uint8, n * bsz).reshape(n, bsz)
    if variant == "DXT1":
        px = _bc_color_pixels(raw, dxt1=True)
    elif variant in ("DXT2", "DXT3"):
        px = _bc_color_pixels(raw[:, 8:], dxt1=False)
        abits = raw[:, :8]
        a = np.empty((n, 16), np.uint8)
        for i in range(8):  # 8 alpha bytes → 16 4-bit values (tiny loop)
            lo = (abits[:, i] & 15).astype(np.uint16)
            hi = (abits[:, i] >> 4).astype(np.uint16)
            a[:, 2 * i] = (lo * 17).astype(np.uint8)
            a[:, 2 * i + 1] = (hi * 17).astype(np.uint8)
        px[:, :, :, 3] = a.reshape(n, 4, 4)
    elif variant in ("DXT4", "DXT5"):
        px = _bc_color_pixels(raw[:, 8:], dxt1=False)
        a0 = raw[:, 0].astype(np.int32)
        a1 = raw[:, 1].astype(np.int32)
        tab = np.zeros((n, 8), np.uint8)
        tab[:, 0] = a0
        tab[:, 1] = a1
        big = a0 > a1
        for k in range(1, 7):
            tab[big, k + 1] = (((7 - k) * a0[big] + k * a1[big]) // 7
                               ).astype(np.uint8)
        small = ~big
        for k in range(1, 5):
            tab[small, k + 1] = (((5 - k) * a0[small] + k * a1[small]) // 5
                                 ).astype(np.uint8)
        tab[small, 6] = 0
        tab[small, 7] = 255
        bits = np.zeros(n, np.uint64)
        for i in range(6):
            bits |= raw[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
        sel = ((bits[:, None] >> (3 * np.arange(16, dtype=np.uint64))) &
               np.uint64(7)).astype(np.intp)
        a = np.take_along_axis(tab, sel, axis=1)
        px[:, :, :, 3] = a.reshape(n, 4, 4)
    else:
        raise ValueError(f"DDS fourCC {variant} not supported")
    return _assemble_blocks(px, w, h)


def decode_dds(buf: bytes):
    if buf[:4] != b"DDS " or len(buf) < 128:
        raise ValueError("not a DDS file")
    hdr = struct.unpack_from("<31I", buf, 4)
    if hdr[0] != 124:
        raise ValueError("bad DDS header size")
    h, w = hdr[2], hdr[3]
    pf_flags = hdr[19]
    fourcc = struct.pack("<I", hdr[20])
    rgb_bits = hdr[21]
    masks = hdr[22:26]
    meta = {"driver": "DDS"}
    data = buf[128:]
    if pf_flags & _DDPF_FOURCC:
        variant = fourcc.decode("ascii", "replace")
        meta["compression"] = variant
        px = _decode_dxt(data, w, h, variant)
        if variant == "DXT1" and (px[:, :, 3] == 255).all():
            px = px[:, :, :3]
    elif pf_flags & _DDPF_RGB:
        nbytes = rgb_bits // 8
        if rgb_bits not in (16, 24, 32):
            raise ValueError(f"DDS RGB bit count {rgb_bits}")
        dt = {2: "<u2", 3: None, 4: "<u4"}[nbytes]
        if dt is None:  # 24-bit: widen to u4 via 3-byte gather
            b3 = np.frombuffer(buf, np.uint8, w * h * 3, 128).reshape(-1, 3)
            pix = (b3[:, 0].astype(np.uint32) |
                   (b3[:, 1].astype(np.uint32) << 8) |
                   (b3[:, 2].astype(np.uint32) << 16))
        else:
            pix = np.frombuffer(buf, dt, w * h, 128).astype(np.uint32)
        chans = [_mask_extract(pix, masks[0]),
                 _mask_extract(pix, masks[1]),
                 _mask_extract(pix, masks[2])]
        if pf_flags & _DDPF_ALPHAPIXELS and masks[3]:
            chans.append(_mask_extract(pix, masks[3]))
        px = np.stack(chans, axis=-1).reshape(h, w, len(chans))
        meta["compression"] = "NONE"
    else:
        raise ValueError("DDS pixel format not supported")
    return np.ascontiguousarray(px), None, None, meta


def encode_dds(px: np.ndarray) -> bytes:
    """Write uncompressed A8R8G8B8 / X8R8G8B8 DDS (deterministic)."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    if px.dtype != np.uint8:
        px = np.clip(px, 0, 255).astype(np.uint8)
    h, w = px.shape[:2]
    bands = px.shape[2]
    has_a = bands == 4
    flags = 0x1 | 0x2 | 0x4 | 0x1000 | 0x8  # caps|height|width|pf|pitch
    pf_flags = _DDPF_RGB | (_DDPF_ALPHAPIXELS if has_a else 0)
    hdr = struct.pack(
        "<4s31I", b"DDS ", 124, flags, h, w, w * 4, 0, 1,
        *([0] * 11),  # reserved1
        32, pf_flags, 0, 32,  # pixel format: size, flags, fourCC, bits
        0xFF0000, 0xFF00, 0xFF, 0xFF000000 if has_a else 0,
        0x1000, 0, 0, 0, 0)  # caps, caps2-4, reserved2
    out = np.zeros((h, w, 4), np.uint8)
    out[:, :, 0] = px[:, :, 2]  # B
    out[:, :, 1] = px[:, :, 1]
    out[:, :, 2] = px[:, :, 0]  # R
    out[:, :, 3] = px[:, :, 3] if has_a else 255
    return hdr + out.tobytes()
