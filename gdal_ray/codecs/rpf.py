"""RPF (Raster Product Format, MIL-STD-2411) — CADRG/CIB frame files
(VQ-compressed NITF, IC=C4/M4) and the A.TOC table-of-contents mosaic.

Reference frmts/nitf/nitfimage.c + rpftocfile.cpp + rpftocdataset.cpp:
the RPFIMG TRE in the NITF image subheader is an RPF location section
(id/size/offset triplets, absolute file offsets).  VQ tables live at
the CompressionLookupSubsection (4 kernel-row LUTs of 4096 x 4-byte
entries, addressed by the 12-bit codes packed 2-per-3-bytes in each
6144-byte 256x256 subframe).  M4 subframes resolve through the
MaskSubsection's offset table (0xFFFFFFFF = transparent subframe,
filled with the transparency code that is also the NoData value);
C4 subframes are 6144-byte slots after the SpatialDataSubsection.
The CADRG color table is colormap record id 2 (216 RGBM entries) plus
a transparent 217th entry.  A.TOC: boundary rectangles give
type/scale/zone, corner lat/lons and frame grids; frame file index
records place each frame file (north-to-south rows when the index is
zero-based) into a 1536x1536-per-frame mosaic with geotransform
(nwLong, horizInterval, 0, nwLat, 0, -vertInterval).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .nitf import read_nitf_info

_LID_COMPRESSION_LOOKUP = 132
_LID_COLOR_SECTION = 134
_LID_COLORMAP = 135
_LID_IMAGE_DESC = 136
_LID_MASK = 138
_LID_SPATIAL_DATA = 140
_LID_BOUNDARY_HDR = 148
_LID_BOUNDARY_TABLE = 149
_LID_FRAME_INDEX_HDR = 150
_LID_FRAME_INDEX = 151


def _be16(b, o):
    return struct.unpack_from(">H", b, o)[0]


def _be32(b, o):
    return struct.unpack_from(">I", b, o)[0]


def _read_location_table(buf: bytes, pos: int):
    """RPF location section -> {loc_id: (size, offset)}."""
    sec_off = _be32(buf, pos + 2)
    count = _be16(buf, pos + 6)
    reclen = _be16(buf, pos + 8)
    if reclen != 10:
        raise ValueError("RPF: unexpected location record length")
    locs = {}
    p = pos + sec_off
    for _ in range(count):
        lid = _be16(buf, p)
        locs[lid] = (_be32(buf, p + 2), _be32(buf, p + 6))
        p += 10
    return locs


def _find_tre(buf: bytes, start: int, size: int, tag: bytes):
    hdr = buf[start:start + size]
    i = hdr.find(tag)
    if i < 0:
        return None
    ln = int(hdr[i + 6:i + 11])
    return start + i + 11, ln


def _vq_luts(buf: bytes, vq_off: int):
    """4 LUTs of 4096 kernel rows (4 bytes each)."""
    sig = b"\x00\x00\x00\x06\x00\x0e"
    if buf[vq_off:vq_off + 6] != sig:
        j = buf.find(sig, vq_off, vq_off + 1000)
        if j < 0:
            raise ValueError("RPF: VQ table signature not found")
        vq_off = j
    luts = []
    for i in range(4):
        vec = _be32(buf, vq_off + 6 + i * 14 + 10)
        luts.append(np.frombuffer(buf, np.uint8, 4096 * 4,
                                  vq_off + vec).reshape(4096, 4))
    return luts


def _vq_decompress(block: bytes, luts) -> np.ndarray:
    """One 6144-byte VQ subframe -> 256x256 uint8
    (nitfimage.c NITFUncompressVQTile, vectorized)."""
    raw = np.frombuffer(block, np.uint8, 6144).reshape(-1, 3)
    b0 = raw[:, 0].astype(np.uint16)
    b1 = raw[:, 1].astype(np.uint16)
    b2 = raw[:, 2].astype(np.uint16)
    val1 = (b0 << 4) | (b1 >> 4)
    val2 = ((b1 & 0x0F) << 8) | b2
    codes = np.empty(val1.size * 2, np.uint16)
    codes[0::2] = val1
    codes[1::2] = val2                       # (64 rows * 64 pairs)
    codes = codes.reshape(64, 64)            # kernel grid
    out = np.empty((256, 256), np.uint8)
    for t in range(4):
        rows = luts[t][codes]                # (64, 64, 4)
        out[t::4, :] = rows.reshape(64, 256)
    return out


def _rpf_color_table(buf: bytes, locs):
    """CADRG colormap record id 2 (216 RGBM entries) -> [(r, g, b)]."""
    if _LID_COLOR_SECTION not in locs or _LID_COLORMAP not in locs:
        return None
    nrecs = buf[locs[_LID_COLOR_SECTION][1]]
    cpos = locs[_LID_COLORMAP][1]
    p = cpos + 6
    for _ in range(nrecs):
        table_id = _be16(buf, p)
        n = _be32(buf, p + 2)
        elem_len = buf[p + 6]
        color_off = _be32(buf, p + 9)
        p += 17
        if table_id == 2 and elem_len == 4 and n == 216:
            rgbm = np.frombuffer(buf, np.uint8, n * 4,
                                 cpos + color_off).reshape(n, 4)
            return [tuple(int(v) for v in row[:3]) for row in rgbm]
    return None


def read_rpf_frame(path: str):
    """CADRG/CIB frame file -> (pixels (h, w) uint8 palette indexes,
    geotransform (from IGEOLO), nodata, meta with color_table)."""
    buf = open(path, "rb").read()
    ver, segs = read_nitf_info(buf)
    seg = next(s for s in segs if s.rows > 0)
    if seg.ic not in ("C4", "M4"):
        raise ValueError(f"RPF: IC={seg.ic!r} is not VQ-compressed")
    tre = _find_tre(buf, seg.header_start, seg.header_size, b"RPFIMG")
    if tre is None:
        raise ValueError("RPF: no RPFIMG TRE in image subheader")
    locs = _read_location_table(buf, tre[0])

    luts = None
    if _LID_COMPRESSION_LOOKUP in locs:
        luts = _vq_luts(buf, locs[_LID_COMPRESSION_LOOKUP][1])
    nblocks = seg.bpr * seg.bpc
    spatial = locs.get(_LID_SPATIAL_DATA, (0, seg.data_start))[1]

    nodata = None
    starts = None
    if _LID_MASK in locs:
        mpos = locs[_LID_MASK][1]
        sfr_len = _be16(buf, mpos)
        tr_len = _be16(buf, mpos + 2)
        tr_bits = _be16(buf, mpos + 4)
        if tr_bits == 8:
            nodata = buf[mpos + 6]
        table_off = 6
        if _LID_IMAGE_DESC in locs:
            v = _be32(buf, locs[_LID_IMAGE_DESC][1] + 20)
            if v != 0xFFFFFFFF:
                table_off = v
        if sfr_len == 4 and table_off >= 6:
            starts = []
            p = mpos + table_off
            for i in range(nblocks):
                off = _be32(buf, p + 4 * i)
                starts.append(None if off == 0xFFFFFFFF
                              else spatial + off)
    if starts is None:
        starts = [spatial + 6144 * i for i in range(nblocks)]

    ct = _rpf_color_table(buf, locs)
    if nodata is None and ct is not None and len(ct) == 216:
        # CADRG convention (rpftocdataset.cpp:963-968): a 216-entry
        # palette gets a transparent 217th entry as NoData
        nodata = 216

    h, w = seg.bpc * 256, seg.bpr * 256
    fill = nodata if nodata is not None else 0
    px = np.full((h, w), fill, np.uint8)
    for i, off in enumerate(starts):
        if off is None or luts is None or off + 6144 > len(buf):
            continue
        by, bx = divmod(i, seg.bpr)
        px[by * 256:(by + 1) * 256, bx * 256:(bx + 1) * 256] = \
            _vq_decompress(buf[off:off + 6144], luts)
    px = px[:seg.rows, :seg.cols]

    if ct is not None and nodata is not None:
        ct = list(ct)
        while len(ct) <= nodata:
            ct.append((0, 0, 0))

    gt = None
    if seg.igeolo.strip():
        from .nitf import _corners_to_gt, _parse_igeolo
        pts, _ = _parse_igeolo(seg.icords, seg.igeolo)
        if pts:
            gt = _corners_to_gt(pts, seg.rows, seg.cols)
    meta = {"driver": "RPF", "IC": seg.ic, "crs": "EPSG:4326"}
    if ct is not None:
        meta["color_table"] = ct
    return px, gt, (float(nodata) if nodata is not None else None), meta


def _trim(b: bytes) -> str:
    return b.decode("ascii", "replace").strip()


def read_rpftoc(path: str):
    """A.TOC -> list of entry dicts (type, scale, zone, corners, frame
    grid, frame paths)."""
    buf = open(path, "rb").read()
    pos = buf.find(b"RPFHDR")
    hdr = (pos + 11) if pos >= 0 else 0
    loc_ptr = _be32(buf, hdr + 44)
    locs = _read_location_table(buf, loc_ptr)
    for lid in (_LID_BOUNDARY_HDR, _LID_BOUNDARY_TABLE,
                _LID_FRAME_INDEX_HDR, _LID_FRAME_INDEX):
        if lid not in locs:
            raise ValueError("RPFTOC: missing location section")
    bh = locs[_LID_BOUNDARY_HDR][1]
    count = _be16(buf, bh + 4)
    p = locs[_LID_BOUNDARY_TABLE][1]
    entries = []
    for _ in range(count):
        e = {"type": _trim(buf[p:p + 5]),
             "compression": _trim(buf[p + 5:p + 10]),
             "scale": _trim(buf[p + 10:p + 22]),
             "zone": _trim(buf[p + 22:p + 23]),
             "producer": _trim(buf[p + 23:p + 28])}
        vals = struct.unpack_from(">12d", buf, p + 28)
        (e["nwLat"], e["nwLong"], e["swLat"], e["swLong"],
         e["neLat"], e["neLong"], e["seLat"], e["seLong"],
         e["vertRes"], e["horizRes"],
         e["vertInterval"], e["horizInterval"]) = vals
        e["nVertFrames"] = _be32(buf, p + 124)
        e["nHorizFrames"] = _be32(buf, p + 128)
        if e["scale"].startswith("1:"):
            e["scale"] = e["scale"][2:]
        e["frames"] = {}
        entries.append(e)
        p += 132

    fih = locs[_LID_FRAME_INDEX_HDR][1]
    nrecs = _be32(buf, fih + 5)
    reclen = _be16(buf, fih + 11)
    fis = locs[_LID_FRAME_INDEX][1]
    new_style = None
    for i in range(nrecs):
        p = fis + reclen * i
        bid = _be16(buf, p)
        if i == 0:
            new_style = (bid == 0)
        if not new_style:
            bid -= 1
        e = entries[bid]
        row = _be16(buf, p + 2)
        col = _be16(buf, p + 4)
        path_off = _be32(buf, p + 6)
        fname = _trim(buf[p + 10:p + 22])
        if not new_style:
            row -= 1
            col -= 1
        else:
            row = e["nVertFrames"] - 1 - row
        q = fis + path_off
        plen = _be16(buf, q)
        subdir = _trim(buf[q + 2:q + 2 + plen]).rstrip("/")
        if subdir.startswith("./"):
            subdir = subdir[2:]
        base = os.path.dirname(path)
        cand = os.path.join(base, subdir, fname)
        if not os.path.exists(cand):
            for d in (os.path.join(base, subdir), base):
                if os.path.isdir(d):
                    hit = next((f for f in os.listdir(d)
                                if f.upper() == fname.upper()), None)
                    if hit:
                        cand = os.path.join(d, hit)
                        break
        e["frames"][(row, col)] = cand
    return entries


def decode_rpftoc(path: str, entry: int = 0):
    """Mosaic one TOC entry -> (pixels, gt, nodata, meta)."""
    entries = read_rpftoc(path)
    usable = [e for e in entries if e["frames"]]
    e = usable[entry] if entry < len(usable) else entries[entry]
    fw = fh = 1536 if e["type"] in ("CADRG", "CIB") else None
    if fw is None:
        fw = int(round((e["seLong"] - e["nwLong"])
                       / (e["nHorizFrames"] * e["horizInterval"])))
        fh = int(round((e["nwLat"] - e["seLat"])
                       / (e["nVertFrames"] * e["vertInterval"])))
    h = fh * e["nVertFrames"]
    w = fw * e["nHorizFrames"]
    px = None
    nodata = None
    ct = None
    for (row, col), fpath in sorted(e["frames"].items()):
        if not os.path.exists(fpath):
            continue
        tile, _, nd, meta = read_rpf_frame(fpath)
        if px is None:
            fill = int(nd) if nd is not None else 0
            px = np.full((h, w), fill, np.uint8)
            nodata = nd
            ct = meta.get("color_table")
        px[row * fh:row * fh + tile.shape[0],
           col * fw:col * fw + tile.shape[1]] = tile
    if px is None:
        raise ValueError("RPFTOC: no frame files found on disk")
    gt = (e["nwLong"], e["horizInterval"], 0.0,
          e["nwLat"], 0.0, -e["vertInterval"])
    meta = {"driver": "RPFTOC", "crs": "EPSG:4326",
            "type": e["type"], "scale": e["scale"], "zone": e["zone"]}
    if ct is not None:
        meta["color_table"] = ct
    return px, gt, nodata, meta
