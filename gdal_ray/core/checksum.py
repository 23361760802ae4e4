"""GDAL-compatible image checksum — the conformance fingerprint.

Independently re-implements the published checksum semantics
(reference: alg/gdalchecksum.cpp:54-66,120-190):

    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    for each pixel at flattened row-major position k (= y*xsize + x):
        checksum += int(v) % primes[k % 11]
        checksum &= 0xffff

Position-keyed (the prime index depends only on the pixel's position,
not on iteration order), so per-tile checksums are stable under any
parallel tiling of the band — which is exactly why it is safe as a
distributed fingerprint. Integer conversion from float adds 0.5 then
floors, clamping to ±2147483647, non-finite → INT_MIN. The C ``%``
truncates toward zero (matters only for negative values).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _to_int32(arr: np.ndarray) -> np.ndarray:
    if np.issubdtype(arr.dtype, np.floating):
        v = arr.astype(np.float64) + 0.5
        out = np.where(np.isfinite(v), np.floor(np.clip(v, -2147483647.0, 2147483647.0)),
                       np.iinfo(np.int32).min).astype(np.int64)
        return out
    # integer path reads through an Int32 conversion (GDALCopyWords
    # clamps to the full int32 range; alg/gdalchecksum.cpp:190+)
    if arr.dtype.kind == "u":
        return np.minimum(arr, np.uint64(2147483647)).astype(np.int64)
    return np.clip(arr.astype(np.int64), -2147483648, 2147483647)


def checksum(band: np.ndarray) -> int:
    """Checksum of a 2-D band (or 1-D line) with window offset (0,0).
    Complex bands iterate (real, imag) value pairs — the prime index
    advances per VALUE, not per pixel (gdalchecksum.cpp nValsPerIter)."""
    a = np.asarray(band)
    if np.issubdtype(a.dtype, np.complexfloating):
        a = np.stack([a.real, a.imag], axis=-1)
    vals = _to_int32(a).ravel()
    primes = PRIMES[np.arange(vals.size, dtype=np.int64) % 11]
    # C-style truncation-toward-zero modulo:
    mods = np.sign(vals) * (np.abs(vals) % primes)
    # cumulative &0xffff after every add == final sum & 0xffff for
    # nonnegative mods; negative intermediate values in C wrap the same
    # way because the final mask only keeps low bits of the two's
    # complement sum.
    return int(np.sum(mods) & 0xFFFF)


def checksum_multiband(pixels: np.ndarray) -> list[int]:
    """Per-band checksums of an (h, w, bands) or (h, w) array."""
    if pixels.ndim == 2:
        return [checksum(pixels)]
    return [checksum(pixels[:, :, b]) for b in range(pixels.shape[2])]
