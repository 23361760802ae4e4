"""RasterLite2 (.rl2 / SpatiaLite raster coverage) reader.

Independent implementation of the librasterlite2 storage layout (the
reference wraps the library, ogr/ogrsf_frmts/sqlite/rasterlite2.cpp):
a SQLite DB with ``raster_coverages`` plus per-coverage ``_sections``
/ ``_levels`` / ``_tiles`` / ``_tile_data`` tables.  Each tile is a
pair of blobs:

* odd block — 0x00 0xfa, endian, compression code, sample type
  (0xa1 1-bit … 0xab double), pixel type (0x11 monochrome, 0x12
  palette, 0x13 grayscale, 0x14 rgb, 0x16 datagrid), u8 band count,
  u16 width/height/row-stride/odd-row-count, u32 odd uncompressed /
  odd compressed / mask uncompressed / mask compressed sizes, 0xc8,
  payload (then the transparency mask, which this reader skips).
* even block — same magic with 0xdb, a crc32, u32 even sizes at
  +17/+21, payload at +26.

DEFLATE payloads are zlib streams of the horizontally-differenced
bytes (TIFF-predictor-style, lag = bytes-per-pixel, little-endian
samples); the odd block holds rows 0,2,4…, the even block rows
1,3,5… (lossy JPEG/WEBP tiles keep every row in the odd block).
Sub-byte samples are packed MSB-first.  Coverage ``palette`` blobs
carry u16 entry count at +3 and RGB triplets at +6; ``nodata_pixel``
blobs carry the per-band sample values at +8.

Pyramid: physical levels come from ``_levels`` rows > 0 with their
own tiles; the 1:2/1:4/1:8 sub-resolutions of each level are nearest
decimations (autotest rl2.py: byte overview checksum 1087 = base
[::2, ::2]).
"""

from __future__ import annotations

import sqlite3
import struct
import zlib

import numpy as np

__all__ = ["list_rl2_coverages", "read_rl2"]

_SAMPLE = {0xa1: ("u1", 1), 0xa2: ("u1", 2), 0xa3: ("u1", 4),
           0xa4: ("i1", 8), 0xa5: ("u1", 8), 0xa6: ("i2", 16),
           0xa7: ("u2", 16), 0xa8: ("i4", 32), 0xa9: ("u4", 32),
           0xaa: ("f4", 32), 0xab: ("f8", 64)}

_PIXEL = {0x11: "MONOCHROME", 0x12: "PALETTE", 0x13: "GRAYSCALE",
          0x14: "RGB", 0x15: "MULTIBAND", 0x16: "DATAGRID"}


def _undelta(arr8: np.ndarray, lag: int) -> np.ndarray:
    """Inverse horizontal byte differencing with the given lag."""
    if lag == 1:
        return np.cumsum(arr8, axis=1, dtype=np.uint64).astype(np.uint8)
    out = arr8.astype(np.int64)
    for i in range(lag, out.shape[1]):
        out[:, i] = (out[:, i] + out[:, i - lag]) & 0xFF
    return out.astype(np.uint8)


def _decode_payload(comp: int, data: bytes,
                    scale: int = 1) -> bytes | np.ndarray:
    if data[:2] == b"\x78\x9c" or data[:1] == b"\x78":
        return zlib.decompress(data)
    if data[:2] == b"\xff\xd8":                  # JPEG
        from ..codecs import jpeg
        return jpeg.decode(data, scale=scale)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from ..codecs import png
        return png.decode(data)
    if data[:4] == b"RIFF":
        from ..codecs.webp import decode_webp
        return decode_webp(data)
    if comp == 0x21 or comp == 0x20:             # NONE
        return data
    return zlib.decompress(data)                 # default: deflate


def _unpack_bits(row_bytes: np.ndarray, w: int, bits: int) -> np.ndarray:
    b = np.unpackbits(row_bytes, axis=1)
    if bits == 1:
        return b[:, :w]
    spb = 8 // bits
    vals = b.reshape(b.shape[0], -1, bits)
    weights = (1 << np.arange(bits - 1, -1, -1))
    out = (vals * weights).sum(axis=2)
    return out[:, :w].astype(np.uint8)


def decode_rl2_tile(odd: bytes, even: bytes | None, scale: int = 1):
    """→ (pixels (h, w[, bands]), meta dict).  ``scale`` ∈ {1,2,4,8}
    decodes lossy tiles through libjpeg's reduced-IDCT path (the
    librasterlite2 pyramid sub-resolutions) and decimates lossless
    tiles (the transparency mask is parsed past, not applied)."""
    if odd[0] != 0 or odd[1] != 0xFA:
        raise ValueError("not an RL2 odd tile block")
    comp, sample, pixel = odd[3], odd[4], odd[5]
    nbands = odd[6]
    w, h = struct.unpack_from("<HH", odd, 7)
    stride, orows = struct.unpack_from("<HH", odd, 11)
    ou, oc, _mu, _mc = struct.unpack_from("<IIII", odd, 15)
    if sample not in _SAMPLE:
        raise NotImplementedError(f"RL2 sample type 0x{sample:02x}")
    dt, bits = _SAMPLE[sample]
    bps = np.dtype(dt).itemsize

    od = _decode_payload(comp, odd[32:32 + oc], scale)
    if isinstance(od, np.ndarray):               # self-describing image
        px = od
        if px.ndim == 3 and px.shape[2] == 1:
            px = px[:, :, 0]
        sw, sh = -(-w // scale), -(-h // scale)
        return px[:sh, :sw], {"pixel": _PIXEL.get(pixel),
                              "bands": nbands}

    rows8 = [np.frombuffer(od, np.uint8).reshape(orows, stride)]
    if even is not None and orows < h:
        eu, ec = struct.unpack_from("<II", even, 17)
        ed = _decode_payload(comp, even[26:26 + ec])
        rows8.append(np.frombuffer(ed, np.uint8).reshape(h - orows,
                                                         stride))
    full8 = np.empty((h, stride), np.uint8)
    if len(rows8) == 2:
        full8[0::2] = rows8[0]
        full8[1::2] = rows8[1]
    else:
        full8[:orows] = rows8[0]
        if orows < h:
            full8[orows:] = 0

    if bits < 8:
        px = _unpack_bits(full8, w, bits)
        if pixel == 0x11:                 # MONOCHROME: 0=white, 1=black
            px = np.where(px == 0, 255, 0).astype(np.uint8)
        elif pixel == 0x13 and bits in (1, 2, 4):
            px = (px * (255 // ((1 << bits) - 1))).astype(np.uint8)
    else:
        full8 = _undelta(full8, bps * nbands)
        px = full8.view("<" + dt)
        px = px.reshape(h, w, nbands) if nbands > 1 else \
            px.reshape(h, w)
    if scale > 1:
        px = px[::scale, ::scale]
    return px, {"pixel": _PIXEL.get(pixel), "bands": nbands}


def _mbr(blob: bytes):
    """SpatiaLite geometry blob → (minx, miny, maxx, maxy)."""
    return struct.unpack_from("<4d", blob, 6)


def _palette(blob: bytes):
    if not blob or len(blob) < 9:
        return None
    n, = struct.unpack_from("<H", blob, 3)
    out = []
    p = 6
    for _ in range(n):
        out.append((blob[p], blob[p + 1], blob[p + 2], 255))
        p += 3
    return out


def _nodata(blob: bytes, dt: str, nbands: int):
    if not blob or len(blob) < 9:
        return None
    try:
        v = np.frombuffer(blob, "<" + dt, count=1, offset=8)[0]
        return float(v)
    except ValueError:
        return None


def list_rl2_coverages(path: str) -> list[str]:
    db = sqlite3.connect(path)
    try:
        # rowid order = registration order (a bare name SELECT would
        # walk the coverage_name index alphabetically instead)
        return [r[0] for r in db.execute(
            "SELECT coverage_name FROM raster_coverages ORDER BY rowid")]
    finally:
        db.close()


def read_rl2(path: str, coverage: str | None = None,
             section: str | None = None, level: int = 0,
             scale: int = 1):
    """→ (pixels, geotransform, nodata, meta).  ``level`` selects a
    physical pyramid level, ``scale`` ∈ {1,2,4,8} a nearest-decimated
    sub-resolution of it; ``section`` restricts the mosaic to one
    section (the driver's RASTERLITE2:db:coverage:id:section
    subdatasets)."""
    db = sqlite3.connect(path)
    try:
        cov = None
        if coverage is None:
            coverage = list_rl2_coverages(path)[0]
        cov = db.execute(
            "SELECT sample_type, pixel_type, num_bands, compression, "
            "tile_width, tile_height, horz_resolution, vert_resolution,"
            " srid, nodata_pixel, palette, extent_minx, extent_miny, "
            "extent_maxx, extent_maxy FROM raster_coverages WHERE "
            "coverage_name=?", (coverage,)).fetchone()
        if cov is None:
            raise KeyError(f"RL2 coverage {coverage!r} absent")
        (s_type, p_type, nbands, comp_name, tw, th, xres, yres, srid,
         nd_blob, pal_blob, minx, miny, maxx, maxy) = cov

        lv = db.execute(
            f'SELECT x_resolution_1_1, y_resolution_1_1 FROM '
            f'"{coverage}_levels" WHERE pyramid_level=?',
            (level,)).fetchone()
        if lv is None:
            raise KeyError(f"RL2 pyramid level {level} absent")
        xres, yres = lv

        sec_filter = ""
        args: list = [level]
        if section is not None:
            sid = db.execute(
                f'SELECT section_id FROM "{coverage}_sections" WHERE '
                f'section_name=?', (section,)).fetchone()
            if sid is None:
                raise KeyError(f"RL2 section {section!r} absent")
            sec_filter = " AND t.section_id=?"
            args.append(sid[0])
            g = db.execute(
                f'SELECT geometry FROM "{coverage}_sections" WHERE '
                f'section_id=?', (sid[0],)).fetchone()[0]
            minx, miny, maxx, maxy = _mbr(g)

        if scale not in (1, 2, 4, 8):
            raise ValueError("RL2 scale must be 1, 2, 4 or 8")
        xres *= scale
        yres *= scale
        w = int(0.5 + (maxx - minx) / xres)
        h = int(0.5 + (maxy - miny) / yres)

        dt = None
        px = None
        nodata = None
        rows = db.execute(
            f'SELECT t.geometry, d.tile_data_odd, d.tile_data_even '
            f'FROM "{coverage}_tiles" t JOIN "{coverage}_tile_data" d '
            f'ON t.tile_id = d.tile_id WHERE t.pyramid_level=?'
            + sec_filter, args).fetchall()
        for geom, oddb, evenb in rows:
            tile, tmeta = decode_rl2_tile(oddb, evenb, scale)
            if px is None:
                dt = tile.dtype
                shape = (h, w) if tile.ndim == 2 else (h, w,
                                                       tile.shape[2])
                nodata = _nodata(nd_blob, _SAMPLE.get(
                    oddb[4], ("u1",))[0], nbands)
                px = np.full(shape, 0 if nodata is None else nodata,
                             dt)
            tminx, tminy, tmaxx, tmaxy = _mbr(geom)
            x0 = int(round((tminx - minx) / xres))
            y0 = int(round((maxy - tmaxy) / yres))
            t_h, t_w = tile.shape[:2]
            cx1 = min(x0 + t_w, w)
            cy1 = min(y0 + t_h, h)
            if x0 >= w or y0 >= h or cx1 <= max(x0, 0) or \
                    cy1 <= max(y0, 0):
                continue
            sx0, sy0 = max(-x0, 0), max(-y0, 0)
            px[max(y0, 0):cy1, max(x0, 0):cx1] = \
                tile[sy0:sy0 + (cy1 - max(y0, 0)),
                     sx0:sx0 + (cx1 - max(x0, 0))]
        if px is None:
            raise ValueError("RL2 coverage has no tiles at this level")

        gt = (minx, xres, 0.0, maxy, 0.0, -yres)
        meta = {"driver": "RasterLite2", "coverage": coverage,
                "pixel_type": p_type, "crs": f"EPSG:{srid}",
                "coverages": list_rl2_coverages(path)}
        pal = _palette(pal_blob)
        if pal:
            meta["palette"] = pal
        nlv = db.execute(
            f'SELECT COUNT(*) FROM "{coverage}_levels" WHERE '
            f'pyramid_level > 0').fetchone()[0]
        meta["overview_levels"] = nlv
        return px, gt, nodata, meta
    finally:
        db.close()
