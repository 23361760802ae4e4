"""AirSAR (JPL aircraft SAR) compressed-Stokes-matrix reader.

Layout (frmts/airsar/airsardataset.cpp): a stack of 50-byte ASCII
header records (``KEY = value`` or double-space separated, keys
upper-cased with spaces/colons/commas → underscores, prefixed MH_ /
PH_ / CH_ per header block, :360-490); identification requires the
first record ``RECORD LENGTH IN BYTES`` plus ``COMPRESSED`` and
``JPL AIRCRAFT`` in the first 800 bytes (:500-514).

Pixels are 10-byte compressed Stokes matrices (signed bytes
b0..b9, :326-338)::

    M11 = (b1/254 + 1.5) · 2^b0
    M12 = b2·M11/127
    M13..M24 = b(3..6)·|b(3..6)|·M11/127²
    M33, M34, M44 = b(7..9)·M11/127
    M22 = M11 − M33 − M44

exposed as the reference's six complex symmetrized-covariance bands
(C11, C12, C13, C22, C23, C33 — :157-245), fully vectorized."""

from __future__ import annotations

import numpy as np

__all__ = ["decode_airsar", "identify_airsar"]

_SQRT2 = 1.4142135623730951


def identify_airsar(head: bytes) -> bool:
    return (head[:22].upper().startswith(b"RECORD LENGTH IN BYTES")
            and b"COMPRESSED" in head[:800]
            and b"JPL AIRCRAFT" in head[:800])


def _read_header(buf: bytes, offset: int, prefix: str,
                 max_lines: int) -> dict:
    md = {}
    for i in range(max_lines):
        rec = buf[offset + 50 * i:offset + 50 * (i + 1)]
        if len(rec) < 50:
            break
        line = rec.split(b"\x00")[0].decode("ascii", "replace")
        if not line.strip() or any(ord(c) > 127 or ord(c) < 10
                                   for c in line):
            break
        if "=" in line:
            key, _, val = line.partition("=")
        else:
            pivot = -1
            for j in range(48, -1, -1):
                if line[j:j + 2] == "  ":
                    pivot = j
                    break
            if pivot < 0:
                break
            key, val = line[:pivot], line[pivot:]
        key = key.rstrip()
        for ch in " :,":
            key = key.replace(ch, "_")
        md[f"{prefix}_{key}"] = val.strip()
    return md


def decode_airsar(buf: bytes):
    """Decode an AirSAR compressed Stokes file → ``(pixels
    (h, w, 6) complex64, None, None, meta)`` with the C3 covariance
    bands in the reference's order."""
    if not identify_airsar(buf[:800]):
        raise ValueError("not an AirSAR compressed Stokes file")
    md = _read_header(buf, 0, "MH", 20)
    w = int(md.get("MH_NUMBER_OF_SAMPLES_PER_RECORD", 0))
    h = int(md.get("MH_NUMBER_OF_LINES_IN_IMAGE", 0))
    rec_len = int(md.get("MH_RECORD_LENGTH_IN_BYTES", 0))
    data_start = int(md.get("MH_BYTE_OFFSET_OF_FIRST_DATA_RECORD", 0))
    if w <= 0 or h <= 0 or rec_len < 10 * w:
        raise ValueError("AirSAR: invalid header dimensions")
    ph_off = md.get("MH_BYTE_OFFSET_OF_PARAMETER_HEADER")
    if ph_off:
        ph = int(ph_off)
        md.update(_read_header(buf, ph, "PH", 100))
        md.update(_read_header(buf, ph + rec_len, "CH", 18))

    lines = np.frombuffer(buf, dtype=np.int8, count=rec_len * h,
                          offset=data_start).reshape(h, rec_len)
    b = lines[:, :10 * w].reshape(h, w, 10).astype(np.float64)

    m11 = (b[..., 1] / 254.0 + 1.5) * np.exp2(b[..., 0])
    m12 = b[..., 2] * m11 / 127.0
    sq = m11 / (127.0 * 127.0)
    m13 = b[..., 3] * np.abs(b[..., 3]) * sq
    m14 = b[..., 4] * np.abs(b[..., 4]) * sq
    m23 = b[..., 5] * np.abs(b[..., 5]) * sq
    m24 = b[..., 6] * np.abs(b[..., 6]) * sq
    m33 = b[..., 7] * m11 / 127.0
    m34 = b[..., 8] * m11 / 127.0
    m44 = b[..., 9] * m11 / 127.0
    m22 = m11 - m33 - m44

    c11 = (m11 + m22 + 2 * m12).astype(np.complex64)
    c12 = (_SQRT2 * (m13 + m23)
           - 1j * _SQRT2 * (m24 + m14)).astype(np.complex64)
    c13 = (2 * m33 + m22 - m11 - 2j * m34).astype(np.complex64)
    c22 = (2 * (m11 - m22)).astype(np.complex64)
    c23 = (_SQRT2 * (m13 - m23)
           + 1j * _SQRT2 * (m24 - m14)).astype(np.complex64)
    c33 = (m11 + m22 - 2 * m12).astype(np.complex64)

    px = np.stack([c11, c12, c13, c22, c23, c33], axis=-1)
    md["driver"] = "AirSAR"
    md["MATRIX_REPRESENTATION"] = "SYMMETRIZED_COVARIANCE"
    md["band_names"] = ["C11", "C12", "C13", "C22", "C23", "C33"]
    return px, None, None, md
