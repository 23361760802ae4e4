"""GFF (Sandia Ground-based SAR Applications Testbed) reader.

Layout (frmts/gff/gff_dataset.cpp): ``GSATIMG`` magic, little-endian
header — version minor/major u16 at 8/10, header length u32 at 12,
endianness u16 at 54, then at 56: BPP u32, frame count, image type
(0 = uint8 magnitude, 1 = complex int16/int32 by BPP, 2 = complex
float32), row-major flag, range count, azimuth count.  Complex
images store twice the sample count in the fast dimension
(:268-280); pixel data starts at the header-length offset."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gff"]


def decode_gff(buf: bytes):
    if len(buf) < 80 or not buf[:7].upper().startswith(b"GSATIMG"):
        raise ValueError("not a GFF file")
    ver_minor, ver_major, length = struct.unpack_from("<HHI", buf, 8)
    bpp, frame_cnt, image_type, row_major, rg_cnt, az_cnt = \
        struct.unpack_from("<6I", buf, 56)
    if image_type == 0:
        dt = np.uint8
        complex_ = False
    elif image_type == 1:
        dt = np.int16 if bpp == 4 else np.int32
        complex_ = True
    elif image_type == 2:
        dt = np.float32
        complex_ = True
    else:
        raise ValueError(f"GFF: unknown image type {image_type}")
    div = 1 if image_type == 0 else 2
    if row_major:
        w, h = rg_cnt // div, az_cnt
    else:
        w, h = az_cnt // div, rg_cnt
    if w <= 0 or h <= 0:
        raise ValueError(f"GFF: invalid dimensions {w}x{h}")
    count = w * h * (2 if complex_ else 1)
    arr = np.frombuffer(buf, dtype=np.dtype(dt).newbyteorder("<"),
                        count=count, offset=length)
    if complex_:
        arr = arr.astype(np.float32).reshape(h, w, 2)
        px = (arr[:, :, 0] + 1j * arr[:, :, 1]).astype(np.complex64)
    else:
        px = arr.reshape(h, w).copy()
    meta = {"driver": "GFF",
            "version": f"{ver_major}.{ver_minor}",
            "image_type": int(image_type), "frames": int(frame_cnt)}
    return px, None, None, meta
