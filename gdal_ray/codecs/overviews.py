"""Overview build + read — the gdaladdo analog.

Reference: gcore/overview.cpp (downsample kernels) +
gcore/gdaldefaultoverviews.cpp (external ``.ovr`` files — a plain TIFF
whose IFD chain holds the reduced-resolution levels). Kernel semantics
were bisected against the reference's own goldens
(autotest/gcore/tiff_ovr.py):

  * NEAREST picks src[j*factor, i*factor]  (mfloat32 [2,4] → checksums
    1087 / 328; test_average_palette → 0);
  * AVERAGE is the nodata-aware block mean, integer outputs rounded
    +0.5-floor (GDALCopyWords), all-nodata blocks stay nodata
    (nodata_byte AVERAGE [2] → checksum 1130);
  * level size is ceil(size / factor), edge blocks average the pixels
    that exist.

Scale note: overviews are a per-image artifact — in pipelines they are
produced inside ``map_batches`` (one cascade per image row), never in
a driver loop; the tile pyramid path (pipelines/tiles.py) remains the
corpus-scale overview machine.
"""

from __future__ import annotations

import os

import numpy as np


def overview_size(size: int, factor: int) -> int:
    return (size + factor - 1) // factor


def downsample_near(px: np.ndarray, factor: int) -> np.ndarray:
    """GDAL NEAREST overview kernel: top-left sample of each block."""
    return np.ascontiguousarray(px[::factor, ::factor])


def downsample_average(px: np.ndarray, factor: int,
                       nodata=None) -> np.ndarray:
    """GDAL AVERAGE overview kernel (nodata-aware block mean; integer
    dtypes round +0.5-floor; all-nodata blocks emit nodata)."""
    squeeze = px.ndim == 2
    s = px[:, :, None] if squeeze else px
    h, w, nb = s.shape
    oh, ow = overview_size(h, factor), overview_size(w, factor)
    ph, pw = oh * factor, ow * factor
    pad = np.full((ph, pw, nb), np.nan, np.float64)
    pad[:h, :w] = s.astype(np.float64)
    if nodata is not None:
        pad[pad == float(nodata)] = np.nan
    q = pad.reshape(oh, factor, ow, factor, nb)
    cnt = (~np.isnan(q)).sum(axis=(1, 3))
    tot = np.nansum(q, axis=(1, 3))
    out = tot / np.maximum(cnt, 1)
    allnan = cnt == 0
    if nodata is not None:
        out[allnan] = float(nodata)
    else:
        out[allnan] = 0.0
    if np.issubdtype(px.dtype, np.integer):
        info = np.iinfo(px.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    out = out.astype(px.dtype)
    return out[:, :, 0] if squeeze else out


def build_overviews(pixels: np.ndarray, levels: list[int],
                    resampling: str = "nearest",
                    nodata=None) -> list[np.ndarray]:
    """gdaladdo's BuildOverviews: one reduced raster per factor in
    ``levels`` (each relative to FULL resolution, like the CLI)."""
    out = []
    for f in levels:
        if f <= 0:
            raise ValueError(f"overview factor {f} is invalid")
        if resampling in ("nearest", "near", "none"):
            out.append(downsample_near(pixels, f))
        elif resampling in ("average", "avg"):
            out.append(downsample_average(pixels, f, nodata))
        else:
            raise ValueError(f"unsupported overview resampling "
                             f"{resampling!r}")
    return out


def encode_ovr(levels_px: list[np.ndarray], *, nodata=None,
               tile_size: int = 256) -> bytes:
    """Reduced-resolution levels → external ``.ovr`` bytes (a tiled
    TIFF IFD chain, every IFD flagged NewSubfileType=1 — the layout
    gdaldefaultoverviews.cpp writes)."""
    import struct

    from .cog import _level_blocks, _level_entries

    levels = [lv if lv.ndim == 3 else lv[:, :, None] for lv in levels_px]
    ts = tile_size
    comp_id = 8
    lv_blocks = [_level_blocks(lv, ts, comp_id) for lv in levels]
    lv_entries = [
        _level_entries(lv, ts, comp_id, len(bl), [len(b) for b in bl],
                       overview=True, nodata=nodata)
        for lv, bl in zip(levels, lv_blocks)]

    pos = 8
    ifd_offsets = []
    ool_offsets: list[list[int]] = []
    for entries in lv_entries:
        ifd_offsets.append(pos)
        pos += 2 + 12 * len(entries) + 4
        offs = []
        for t, typ, cnt, payload in entries:
            if len(payload) > 4:
                offs.append(pos)
                pos += len(payload) + (len(payload) & 1)
            else:
                offs.append(-1)
        ool_offsets.append(offs)
    block_offsets: list[list[int]] = []
    for bl in lv_blocks:
        offs = []
        for b in bl:
            offs.append(pos)
            pos += len(b) + (len(b) & 1)
        block_offsets.append(offs)

    from .cog import _T_SUBFILE  # noqa: F401  (layout parity with COG)
    from .gtiff import _T_TILE_OFF

    buf = bytearray()
    buf += b"II*\x00" + struct.pack("<I", ifd_offsets[0])
    for k, entries in enumerate(lv_entries):
        assert len(buf) == ifd_offsets[k]
        ool_payloads = []
        buf += struct.pack("<H", len(entries))
        for (t, typ, cnt, payload), ooff in zip(entries, ool_offsets[k]):
            if t == _T_TILE_OFF:
                payload = struct.pack(f"<{len(lv_blocks[k])}I",
                                      *block_offsets[k])
            if len(payload) <= 4:
                buf += struct.pack("<HHI", t, typ, cnt) \
                    + payload.ljust(4, b"\x00")
            else:
                buf += struct.pack("<HHII", t, typ, cnt, ooff)
                ool_payloads.append((ooff, payload))
        nxt = ifd_offsets[k + 1] if k + 1 < len(lv_entries) else 0
        buf += struct.pack("<I", nxt)
        for ooff, payload in ool_payloads:
            assert len(buf) == ooff
            buf += payload
            if len(payload) & 1:
                buf += b"\x00"
    for offs, bl in zip(block_offsets, lv_blocks):
        for off, b in zip(offs, bl):
            assert len(buf) == off
            buf += b
            if len(b) & 1:
                buf += b"\x00"
    return bytes(buf)


def add_overviews(path: str, levels: list[int],
                  resampling: str = "nearest") -> str:
    """gdaladdo analog: build overview levels for a raster file and
    write them as ``<path>.ovr`` (external overviews — works for any
    format read_raster opens, like GDAL's default-overview machinery).
    Returns the .ovr path."""
    from ..sources.raster import read_raster

    px, gt, nodata, meta = read_raster(path)
    ovs = build_overviews(np.asarray(px), levels, resampling, nodata)
    out = path + ".ovr"
    with open(out, "wb") as f:
        f.write(encode_ovr(ovs, nodata=nodata))
    return out


def read_overviews(path: str) -> list:
    """All reduced-resolution levels of a raster: internal IFD-chain
    overviews (GTiff/COG), then external ``<path>.ovr`` levels —
    GDAL's lookup order (gdaldefaultoverviews.cpp). Returns a list of
    GeoTiff-like objects with .pixels."""
    from .gtiff import decode_gtiff_all

    out = []
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("tif", "tiff"):
        chain = decode_gtiff_all(open(path, "rb").read())
        out.extend(chain[1:])
    elif ext in ("img", "rrd", "aux"):
        with open(path, "rb") as fh:
            if fh.read(15) == b"EHFA_HEADER_TAG":
                from .hfa import read_hfa_overviews
                out.extend(read_hfa_overviews(path))
    ovr = path + ".ovr"
    if os.path.exists(ovr):
        out.extend(decode_gtiff_all(open(ovr, "rb").read()))
    return out
