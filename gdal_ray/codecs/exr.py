"""OpenEXR 2.0 scanline codec (read + write) from the published
format layout — NONE / RLE / ZIPS / ZIP compression, HALF / FLOAT /
UINT channels.

The reference driver (frmts/exr/exrdataset.cpp) wraps the OpenEXR
library; this module implements the container directly:

- magic ``0x01312f76`` + version 2, attribute list (``name\\0
  type\\0 size value``) ended by an empty name; required attributes
  channels / compression / dataWindow / displayWindow / lineOrder /
  pixelAspectRatio / screenWindowCenter / screenWindowWidth;
- chlist entries (name, pixel type 0=UINT 1=HALF 2=FLOAT, pLinear,
  x/ySampling) stored alphabetically, scanline data in the same
  order, one channel-plane per scanline;
- scanline chunks (``y:int32, size:int32, data``) addressed by a
  u64 offset table; 1 line per chunk (NONE/RLE/ZIPS), 16 for ZIP;
- ZIP/ZIPS = byte reorder (even/odd split) + delta predictor +
  zlib, stored raw when compression does not shrink the block
  (OpenEXR ImfZip.cpp transform order); RLE = the same byte
  transform + OpenEXR's signed-count run-length coding
  (ImfRle.cpp: n<0 → -n literals, n>=0 → n+1 repeats);
- georeferencing via the driver's ``gdal:geoTransform`` M33d
  attribute (row-major 3x3, exrdataset.cpp:876-890) and
  ``gdal:crsWkt`` string; other ``gdal:*`` strings → metadata;
- band naming like the driver: R/G/B[/A] for color, ``Band%d``
  otherwise, single ``Y`` for gray (exrdataset.cpp:996-1010);
  HALF decodes to float32 like GDAL exposes it.

Tiled ONE_LEVEL storage reads and writes (4-int tile chunk
headers, tiledesc attribute).  PIZ / PXR24 / B44 / B44A blocks
decode and encode through ``codecs/exr_piz.py``; MIPMAP/RIPMAP
levels and DWAA/DWAB blocks fail fast by name.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["read_exr", "write_exr"]

_MAGIC = b"\x76\x2f\x31\x01"

_PIXEL_DTYPE = {0: np.dtype("<u4"), 1: np.dtype("<f2"),
                2: np.dtype("<f4")}
_COMPRESSION_NAMES = {0: None, 1: "RLE", 2: "ZIPS", 3: "ZIP",
                      4: "PIZ", 5: "PXR24", 6: "B44", 7: "B44A",
                      8: "DWAA", 9: "DWAB"}
_LINES_PER_CHUNK = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16, 6: 32,
                    7: 32}


# ----------------------------------------------------- byte transform
def _reorder_delta_encode(raw: bytes) -> bytes:
    """OpenEXR zip/rle preprocessing: split bytes into even/odd
    streams, then delta-code (ImfZip.cpp compress)."""
    a = np.frombuffer(raw, dtype=np.uint8)
    n = len(a)
    half = (n + 1) // 2
    buf = np.empty(n, dtype=np.uint8)
    buf[:half] = a[0::2]
    buf[half:] = a[1::2]
    d = buf.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + (128 + 256)
    return d.astype(np.uint8).tobytes()


def _reorder_delta_decode(data: bytes) -> bytes:
    """Inverse: integrate the deltas, then interleave the halves
    (ImfZip.cpp uncompress)."""
    d = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    d[1:] -= 128
    buf = np.cumsum(d).astype(np.uint8)
    n = len(buf)
    half = (n + 1) // 2
    out = np.empty(n, dtype=np.uint8)
    out[0::2] = buf[:half]
    out[1::2] = buf[half:]
    return out.tobytes()


# ----------------------------------------------------- RLE
def _rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(run - 1)
            out.append(data[i])
            i += run
        else:
            start = i
            while i < n and (i - start) < 127 and not (
                    i + 2 < n and data[i] == data[i + 1] == data[i + 2]):
                i += 1
            cnt = i - start
            out.append(256 - cnt)  # -cnt as unsigned byte
            out += data[start:i]
    return bytes(out)


def _rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c > 127:  # negative: literals
            cnt = 256 - c
            out += data[i:i + cnt]
            i += cnt
        else:
            out += bytes([data[i]]) * (c + 1)
            i += 1
    return bytes(out)


# ----------------------------------------------------- header I/O
def _read_cstr(buf: bytes, off: int):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("utf-8", "replace"), end + 1


def read_exr(path_or_bytes):
    """Read an EXR file → ``(pixels, geotransform, nodata, meta)``.
    Bands ordered R,G,B[,A] / Band1..N / Y like the reference
    driver; HALF channels are returned as float32."""
    buf = path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray)) \
        else open(path_or_bytes, "rb").read()
    if buf[:4] != _MAGIC:
        raise ValueError("not an EXR file")
    version = struct.unpack_from("<I", buf, 4)[0]
    tiled = bool(version & 0x200)
    if version & 0x800:
        raise ValueError("EXR: deep data not supported")
    if version & 0x1000:
        raise ValueError("EXR: multi-part files not supported")
    if version & 0xFF not in (1, 2):
        raise ValueError(f"EXR: version {version & 0xFF}")
    off = 8
    attrs = {}
    while True:
        name, off = _read_cstr(buf, off)
        if not name:
            break
        typ, off = _read_cstr(buf, off)
        size = struct.unpack_from("<I", buf, off)[0]
        off += 4
        attrs[name] = (typ, buf[off:off + size])
        off += size

    if "channels" not in attrs or "dataWindow" not in attrs:
        raise ValueError("EXR: missing required attributes")
    chs = []
    cbuf = attrs["channels"][1]
    p = 0
    while cbuf[p] != 0:
        nm, p = _read_cstr(cbuf, p)
        ptype, plin, xs, ys = struct.unpack_from("<IBxxxii", cbuf, p)
        p += 16
        if ptype not in _PIXEL_DTYPE:
            raise ValueError(f"EXR: pixel type {ptype}")
        if xs != 1 or ys != 1:
            raise ValueError("EXR: subsampled channels not supported")
        chs.append((nm, ptype))
    chs.sort()  # chlist is stored sorted; keep deterministic

    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise ValueError(
            f"EXR: {_COMPRESSION_NAMES.get(comp, comp)} compression "
            "not supported")
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    planes = {nm: np.empty((h, w), dtype=_PIXEL_DTYPE[t])
              for nm, t in chs}

    def _inflate(data, raw_len, cw, rows):
        if len(data) >= raw_len:
            return data[:raw_len]
        if comp in (2, 3):  # ZIPS / ZIP
            return _reorder_delta_decode(zlib.decompress(data))
        if comp == 1:  # RLE
            return _reorder_delta_decode(_rle_decode(data, raw_len))
        if comp in (4, 5, 6, 7):
            from .exr_piz import (b44_uncompress, piz_uncompress,
                                  pxr24_uncompress)
            if comp == 4:
                return piz_uncompress(data, chs, cw, rows)
            if comp == 5:
                return pxr24_uncompress(data, chs, cw, rows)
            return b44_uncompress(data, chs, cw, rows)
        return data[:raw_len]

    if tiled:
        if "tiles" not in attrs:
            raise ValueError("EXR: tiled file without tiles attribute")
        tw, th = struct.unpack_from("<II", attrs["tiles"][1], 0)
        mode = attrs["tiles"][1][8]
        if (mode & 0x0F) != 0:
            raise ValueError("EXR: only ONE_LEVEL tiled images supported")
        ntx, nty = -(-w // tw), -(-h // th)
        offsets = struct.unpack_from(f"<{ntx * nty}Q", buf, off)
        for coff in offsets:
            dx, dy, lx, ly, size = struct.unpack_from("<5i", buf, coff)
            data = buf[coff + 20:coff + 20 + size]
            cw = min(tw, w - dx * tw)
            chh = min(th, h - dy * th)
            raw_len = sum(cw * _PIXEL_DTYPE[t].itemsize
                          for _, t in chs) * chh
            raw = _inflate(data, raw_len, cw, chh)
            pos = 0
            for r in range(chh):
                yy = dy * th + r
                for nm, t in chs:
                    nb = cw * _PIXEL_DTYPE[t].itemsize
                    planes[nm][yy, dx * tw:dx * tw + cw] = \
                        np.frombuffer(raw, dtype=_PIXEL_DTYPE[t],
                                      count=cw, offset=pos)
                    pos += nb
    else:
        lpc = _LINES_PER_CHUNK[comp]
        n_chunks = -(-h // lpc)
        line_bytes = sum(w * _PIXEL_DTYPE[t].itemsize for _, t in chs)
        offsets = struct.unpack_from(f"<{n_chunks}Q", buf, off)
        for ci, coff in enumerate(offsets):
            y, size = struct.unpack_from("<ii", buf, coff)
            data = buf[coff + 8:coff + 8 + size]
            rows = min(lpc, y1 - y + 1)
            raw_len = line_bytes * rows
            raw = _inflate(data, raw_len, w, rows)
            pos = 0
            for r in range(rows):
                yy = y - y0 + r
                for nm, t in chs:
                    nb = w * _PIXEL_DTYPE[t].itemsize
                    planes[nm][yy] = np.frombuffer(
                        raw, dtype=_PIXEL_DTYPE[t], count=w, offset=pos)
                    pos += nb

    # band order like the driver: RGBA by name, Band%d numeric, else
    # alphabetical
    names = [nm for nm, _ in chs]
    if set(names) <= {"R", "G", "B", "A"} and "R" in names:
        order = [n for n in ("R", "G", "B", "A") if n in names]
    elif all(n.startswith("Band") for n in names):
        order = sorted(names, key=lambda n: int(n[4:] or 0))
    else:
        order = names
    bands = []
    for nm in order:
        a = planes[nm]
        if a.dtype == np.float16:
            a = a.astype(np.float32)
        bands.append(a)
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)

    meta: dict = {"driver": "EXR"}
    cname = _COMPRESSION_NAMES.get(comp)
    if cname:
        meta["compression"] = cname
    gt = None
    if "gdal:geoTransform" in attrs:
        m = struct.unpack("<9d", attrs["gdal:geoTransform"][1])
        gt = (m[2], m[0], m[1], m[5], m[3], m[4])
    for nm, (typ, val) in attrs.items():
        if typ == "string":
            text = val.decode("utf-8", "replace")
            if nm == "gdal:crsWkt":
                meta["crs"] = text
            elif nm.startswith("gdal:"):
                meta[nm[5:]] = text
            elif nm != "type":
                meta[nm] = text
    return px, gt, None, meta


# ----------------------------------------------------- writer
_PIXEL_CODE = {"UINT": 0, "HALF": 1, "FLOAT": 2}


def _attr(name: str, typ: str, val: bytes) -> bytes:
    return (name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<I", len(val)) + val)


def write_exr(path: str, pixels, *, pixel_type: str | None = None,
              compression: str = "ZIP", geotransform=None,
              crs: str | None = None, metadata=None,
              tile: tuple[int, int] | None = None) -> None:
    """Write a scanline EXR.  ``pixel_type`` HALF/FLOAT/UINT
    (default: HALF for uint8/uint16 inputs like the reference
    driver's byte path, FLOAT for floats, UINT for uint32);
    ``compression`` NONE/RLE/ZIPS/ZIP/PIZ/PXR24/B44/B44A (PXR24 is
    lossy for FLOAT, B44/B44A for HALF)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    if pixel_type is None:
        if px.dtype == np.uint32:
            pixel_type = "UINT"
        elif px.dtype in (np.dtype(np.float32), np.dtype(np.float64)):
            pixel_type = "FLOAT"
        else:
            pixel_type = "HALF"
    code = _PIXEL_CODE[pixel_type]
    dt = _PIXEL_DTYPE[code]
    comp_code = {"NONE": 0, "RLE": 1, "ZIPS": 2, "ZIP": 3, "PIZ": 4,
                 "PXR24": 5, "B44": 6, "B44A": 7}[compression.upper()]
    lpc = _LINES_PER_CHUNK[comp_code]

    if nb in (3, 4):
        names = ["R", "G", "B", "A"][:nb]
    elif nb == 1:
        names = ["Y"]
    else:
        names = [f"Band{i + 1}" for i in range(nb)]
    order = sorted(range(nb), key=lambda i: names[i])

    chl = bytearray()
    for i in order:
        chl += names[i].encode() + b"\x00"
        chl += struct.pack("<IBxxxii", code, 0, 1, 1)
    chl += b"\x00"

    header = bytearray()
    header += _MAGIC + struct.pack("<I", 2 | (0x200 if tile else 0))
    header += _attr("channels", "chlist", bytes(chl))
    if tile:
        header += _attr("tiles", "tiledesc",
                        struct.pack("<IIB", tile[0], tile[1], 0))
    header += _attr("compression", "compression", bytes([comp_code]))
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")
    if geotransform is not None:
        g = geotransform
        header += _attr("gdal:geoTransform", "m33d", struct.pack(
            "<9d", g[1], g[2], g[0], g[4], g[5], g[3], 0.0, 0.0, 1.0))
    if crs is not None:
        header += _attr("gdal:crsWkt", "string", crs.encode())
    for k, v in (metadata or {}).items():
        header += _attr(f"gdal:{k}", "string", str(v).encode())
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f",
                    struct.pack("<2f", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float",
                    struct.pack("<f", 1.0))
    header += b"\x00"

    conv = px.astype(dt)
    chs_sorted = [(names[i], code) for i in order]

    def _pack(raw: bytes, cw: int = w, rows: int = 1) -> bytes:
        if comp_code in (2, 3):
            enc = zlib.compress(_reorder_delta_encode(raw), 6)
        elif comp_code == 1:
            enc = _rle_encode(_reorder_delta_encode(raw))
        elif comp_code in (4, 5, 6, 7):
            from .exr_piz import (b44_compress, piz_compress,
                                  pxr24_compress)
            if comp_code == 4:
                enc = piz_compress(raw, chs_sorted, cw, rows)
            elif comp_code == 5:
                enc = pxr24_compress(raw, chs_sorted, cw, rows)
            else:
                enc = b44_compress(raw, chs_sorted, cw, rows,
                                   flat=comp_code == 7)
        else:
            enc = raw
        return raw if len(enc) >= len(raw) else enc

    if tile:
        tw, th = tile
        ntx, nty = -(-w // tw), -(-h // th)
        chunks = []
        for dy in range(nty):
            for dx in range(ntx):
                cw = min(tw, w - dx * tw)
                chh = min(th, h - dy * th)
                parts = []
                for r in range(chh):
                    for i in order:
                        parts.append(np.ascontiguousarray(
                            conv[dy * th + r,
                                 dx * tw:dx * tw + cw, i]).tobytes())
                chunks.append(((dx, dy), _pack(b"".join(parts),
                                               cw, chh)))
        n_chunks = len(chunks)
        data_off = len(header) + 8 * n_chunks
        offsets = []
        pos = data_off
        for _, enc in chunks:
            offsets.append(pos)
            pos += 20 + len(enc)
        with open(path, "wb") as fh:
            fh.write(header)
            fh.write(struct.pack(f"<{n_chunks}Q", *offsets))
            for (dx, dy), enc in chunks:
                fh.write(struct.pack("<5i", dx, dy, 0, 0, len(enc)))
                fh.write(enc)
        return

    n_chunks = -(-h // lpc)
    chunks = []
    for c in range(n_chunks):
        y = c * lpc
        rows = min(lpc, h - y)
        parts = []
        for r in range(rows):
            for i in order:
                parts.append(np.ascontiguousarray(
                    conv[y + r, :, i]).tobytes())
        chunks.append((y, _pack(b"".join(parts), w, rows)))

    table_off = len(header)
    data_off = table_off + 8 * n_chunks
    offsets = []
    pos = data_off
    for y, enc in chunks:
        offsets.append(pos)
        pos += 8 + len(enc)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(struct.pack(f"<{n_chunks}Q", *offsets))
        for y, enc in chunks:
            fh.write(struct.pack("<ii", y, len(enc)))
            fh.write(enc)
