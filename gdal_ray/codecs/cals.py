"""CALS Type 1 raster (MIL-STD-1840 / MIL-R-28002) — 1-bit CCITT
Group 4 documents behind a fixed 2048-byte text-record header.

Layout (reference frmts/cals/calsdataset.cpp:296-380,519-583): eleven
128-byte space-padded text records (``srcdocid:`` … ``notes:``) with
``rtype: 1``, ``rorient: a1,a2``, ``rpelcnt: w,h`` and ``rdensty:``;
the T.6 (FAX4) codestream starts at byte 2048.  Pixels keep the fax
polarity (1 = black) with a white/black two-entry palette, exactly how
the reference exposes the wrapped MINISWHITE TIFF; on write the source
is inverted unless its palette is already (white, black)
(calsdataset.cpp:139-152 CALSWrapperSrcBand bInvertValues).
"""

from __future__ import annotations

import numpy as np

from .fax import decode_g4, encode_g4

_FIELDS = ("srcdocid: NONE", "dstdocid: NONE", "txtfilid: NONE",
           "figid: NONE", "srcgph: NONE", "doccls: NONE")


def decode_cals(buf: bytes):
    """-> (pixels uint8 0/1 with 1=black, None gt, None nodata, meta)."""
    head = buf[:2048].decode("ascii", "replace")
    if "rtype: 1" not in head or "rpelcnt:" not in head:
        raise ValueError("not a CALS Type 1 file")
    pel = head.split("rpelcnt:", 1)[1]
    w, h = (int(v) for v in pel.split(None, 1)[0].split(",")[:2])
    if not (0 < w <= 999999 and 0 < h <= 999999):
        raise ValueError("CALS implausible rpelcnt")
    px = decode_g4(buf[2048:], w, h)
    meta = {"driver": "CALS",
            "color_table": [(255, 255, 255), (0, 0, 0)]}
    if "rorient:" in head:
        ang = head.split("rorient:", 1)[1].split(None, 1)[0]
        a1, a2 = (int(v) for v in ang.split(",")[:2])
        if (a1, a2) != (0, 270):
            meta["PIXEL_PATH"] = a1
            meta["LINE_PROGRESSION"] = a2
    if "rdensty:" in head:
        dens = int(head.split("rdensty:", 1)[1].split(None, 1)[0])
        if dens:
            meta["TIFFTAG_XRESOLUTION"] = dens
            meta["TIFFTAG_YRESOLUTION"] = dens
    return px, None, None, meta


def encode_cals(px: np.ndarray, color_table=None, density: int = 200,
                pixel_path: int = 0, line_progression: int = 270) -> bytes:
    """Source values are inverted into fax polarity unless the palette
    is already (white, black) — the reference's bInvertValues rule."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise ValueError("CALS is single-band only")
    if px.shape[0] > 999999 or px.shape[1] > 999999:
        raise ValueError("CALS dimensions must be <= 999999")
    invert = True
    if color_table is not None and len(color_table) >= 2:
        e0, e1 = (tuple(color_table[0])[:3], tuple(color_table[1])[:3])
        if e0 == (255, 255, 255) and e1 == (0, 0, 0):
            invert = False
    bits = (px == 0) if invert else (px != 0)
    data = encode_g4(bits.astype(np.uint8))
    if not (1 <= density <= 9999):
        density = 200
    recs = list(_FIELDS) + [
        "rtype: 1",
        "rorient: %03d,%03d" % (pixel_path, line_progression),
        "rpelcnt: %06d,%06d" % (px.shape[1], px.shape[0]),
        "rdensty: %04d" % density,
        "notes: NONE",
    ]
    head = bytearray(b" " * 2048)
    for i, rec in enumerate(recs):
        head[i * 128:i * 128 + len(rec)] = rec.encode("ascii")
    return bytes(head) + data
