"""MRF (Meta Raster Format, NASA/ESRI) reader — an XML metadata file
(.mrf) + a big-endian (offset, size) int64-pair tile index (.idx) + a
data file of independently compressed pages.

Reference frmts/mrf/: page-index ordering c-fastest then x, y, z
(mrf_util.cpp:327 IdxOffset), data-file extension per compression
(mrf_util.cpp ILC_E: NONE .til, DEFLATE .pzp, PNG/PPNG .ppg,
JPEG .pjg, TIF .ptf, LERC .lrc), zero-size index entries are empty
tiles filled with NoData.  Page payloads reuse this repo's own PNG /
JPEG / GTiff codecs; LERC pages decode via codecs/lerc.py (both the
Lerc1/CntZImage and Lerc2 layouts).  Uniform Rsets overviews share the
data file, each level's index following the previous one.
"""

from __future__ import annotations

import os
import re
import struct
import zlib

import numpy as np

_EXT = {"NONE": ".til", "DEFLATE": ".pzp", "PNG": ".ppg", "PPNG": ".ppg",
        "JPEG": ".pjg", "JPNG": ".pjp", "TIF": ".ptf", "LERC": ".lrc",
        "QB3": ".pq3", "ZSTD": ".pzs"}

_DTYPES = {"BYTE": np.uint8, "UINT8": np.uint8, "INT8": np.int8,
           "INT16": np.int16, "UINT16": np.uint16,
           "INT32": np.int32, "UINT32": np.uint32,
           "INT64": np.int64, "UINT64": np.uint64,
           "FLOAT32": np.float32, "FLOAT": np.float32,
           "FLOAT64": np.float64, "DOUBLE": np.float64}


def _attr(xml: str, tag: str, name: str, default=None):
    m = re.search(rf"<{tag}\b[^>]*\b{name}=['\"]([^'\"]*)['\"]", xml)
    return m.group(1) if m else default


def _text(xml: str, tag: str, default=None):
    m = re.search(rf"<{tag}[^>]*>([^<]*)</{tag}>", xml, re.S)
    return m.group(1).strip() if m else default


def _decode_page(payload: bytes, comp: str, pw: int, ph: int, pc: int,
                 dtype, swap: bool) -> np.ndarray:
    """One page -> (ph, pw, pc) array."""
    if comp in ("NONE", "DEFLATE"):
        raw = zlib.decompress(payload) if comp == "DEFLATE" else payload
        arr = np.frombuffer(raw, dtype, pw * ph * pc)
        if swap and arr.dtype.itemsize > 1:
            arr = arr.byteswap()
        return arr.reshape(ph, pw, pc)
    if comp in ("PNG", "PPNG"):
        from .png import decode as png_decode
        arr = png_decode(payload)
    elif comp == "JPEG":
        from .jpeg import decode as jpeg_decode
        arr = jpeg_decode(payload)
    elif comp == "TIF":
        from .gtiff import decode_gtiff
        arr = decode_gtiff(payload).pixels
    elif comp == "LERC":
        from .lerc import decode_lerc
        arr = decode_lerc(payload)
    else:
        raise ValueError(f"MRF: unsupported compression {comp!r}")
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.astype(dtype, copy=False)


def decode_mrf(path: str, overview: int | None = None):
    """-> (pixels (h, w) or (h, w, c), geotransform, nodata, meta)."""
    xml = open(path, "r", encoding="utf-8", errors="replace").read()
    if "<MRF_META>" not in xml:
        raise ValueError("not an MRF metadata file")
    sx = int(_attr(xml, "Size", "x", "0"))
    sy = int(_attr(xml, "Size", "y", "0"))
    sc = int(_attr(xml, "Size", "c", "1"))
    if sx <= 0 or sy <= 0:
        raise ValueError("MRF: bad Size")
    pw = int(_attr(xml, "PageSize", "x", "512"))
    ph = int(_attr(xml, "PageSize", "y", "512"))
    pc = int(_attr(xml, "PageSize", "c", "1"))
    comp = (_text(xml, "Compression", "PNG") or "PNG").upper()
    dt_name = (_text(xml, "DataType", "Byte") or "Byte").upper()
    dtype = _DTYPES.get(dt_name)
    if dtype is None:
        raise ValueError(f"MRF: unknown DataType {dt_name}")
    # NONE/DEFLATE multi-byte payloads are big-endian unless
    # NetByteOrder says otherwise (is_Endianness_Dependent rule)
    nbo = (_text(xml, "NetByteOrder", "") or "").lower()
    swap = nbo in ("true", "yes", "on", "1")
    nodata = None
    ndtext = _attr(xml, "DataValues", "NoData")
    if ndtext is not None:
        nodata = float(ndtext.split()[0])

    base = os.path.splitext(path)[0]
    ext = _EXT.get(comp)
    if ext is None:
        raise ValueError(f"MRF: unsupported compression {comp!r}")
    data_path = _text(xml, "DataFile") or base + ext
    idx_path = _text(xml, "IndexFile") or base + ".idx"
    if not os.path.isabs(data_path):
        data_path = os.path.join(os.path.dirname(path),
                                 os.path.basename(data_path))

    # page grid (z is unused here: single slice)
    ncx = (sx + pw - 1) // pw
    ncy = (sy + ph - 1) // ph
    ncc = (sc + pc - 1) // pc
    level = 0 if overview is None else overview
    lx, ly, lw, lh = ncx, ncy, sx, sy
    idx_base = 0
    scale_m = re.search(r"<Rsets[^>]*scale=['\"](\d+)['\"]", xml)
    scale = int(scale_m.group(1)) if scale_m else 2
    for _ in range(level):
        idx_base += lx * ly * ncc
        lw = (lw + scale - 1) // scale
        lh = (lh + scale - 1) // scale
        lx = (lw + pw - 1) // pw
        ly = (lh + ph - 1) // ph
    idx = np.frombuffer(open(idx_path, "rb").read(), ">i8")
    data = open(data_path, "rb").read()

    out = np.zeros((lh, lw, sc), dtype)
    if nodata is not None:
        out[:] = dtype(nodata)
    for py in range(ly):
        for pxi in range(lx):
            for pci in range(ncc):
                slot = idx_base + pci + ncc * (pxi + lx * py)
                off, size = int(idx[2 * slot]), int(idx[2 * slot + 1])
                if size == 0:
                    continue
                page = _decode_page(data[off:off + size], comp,
                                    pw, ph, pc, dtype, swap)
                y0, x0 = py * ph, pxi * pw
                hh = min(ph, lh - y0)
                ww = min(pw, lw - x0)
                c0 = pci * pc
                cn = min(pc, sc - c0)
                out[y0:y0 + hh, x0:x0 + ww, c0:c0 + cn] = \
                    page[:hh, :ww, :cn]

    gt = None
    if "<BoundingBox" in xml:
        minx = float(_attr(xml, "BoundingBox", "minx", "0"))
        miny = float(_attr(xml, "BoundingBox", "miny", "0"))
        maxx = float(_attr(xml, "BoundingBox", "maxx", "0"))
        maxy = float(_attr(xml, "BoundingBox", "maxy", "0"))
        gt = (minx, (maxx - minx) / lw, 0.0, maxy, 0.0,
              -(maxy - miny) / lh)
    meta = {"driver": "MRF", "compression": comp}
    proj = _text(xml, "Projection")
    if proj:
        meta["crs"] = proj
    if sc == 1:
        out = out[:, :, 0]
    return out, gt, nodata, meta


def encode_mrf(px: np.ndarray, path: str, *, compression: str = "DEFLATE",
               geotransform=None, crs: str | None = None,
               nodata=None, page: int = 512):
    """Write a single-level MRF (meta XML + .idx + data file).

    Pages are tiled ``page``x``page`` in the c-fastest index order the
    reader uses; DEFLATE/NONE payloads are stored little-endian
    (NetByteOrder false), PNG/JPEG/TIF reuse this repo's encoders."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    comp = compression.upper()
    ext = _EXT.get(comp)
    if ext is None:
        raise ValueError(f"MRF: unsupported compression {comp!r}")
    dt_name = {np.dtype(np.uint8): "Byte", np.dtype(np.int16): "Int16",
               np.dtype(np.uint16): "UInt16",
               np.dtype(np.int32): "Int32",
               np.dtype(np.uint32): "UInt32",
               np.dtype(np.float32): "Float32",
               np.dtype(np.float64): "Float64"}.get(px.dtype)
    if dt_name is None:
        raise ValueError(f"MRF: unsupported dtype {px.dtype}")
    base = os.path.splitext(path)[0]
    ncx = (w + page - 1) // page
    ncy = (h + page - 1) // page
    idx = np.zeros(ncy * ncx * c * 2, ">i8")
    data = bytearray()
    for py in range(ncy):
        for pxi in range(ncx):
            for ci in range(c):
                tile = np.zeros((page, page), px.dtype)
                blk = px[py * page:(py + 1) * page,
                         pxi * page:(pxi + 1) * page, ci]
                tile[:blk.shape[0], :blk.shape[1]] = blk
                if comp == "NONE":
                    payload = tile.astype("<" + px.dtype.str[1:]).tobytes()
                elif comp == "DEFLATE":
                    payload = zlib.compress(
                        tile.astype("<" + px.dtype.str[1:]).tobytes(), 6)
                elif comp in ("PNG", "PPNG"):
                    from .png import encode as png_encode
                    payload = png_encode(tile)
                elif comp == "JPEG":
                    from .jpeg import encode as jpeg_encode
                    payload = jpeg_encode(tile)
                elif comp == "TIF":
                    from .gtiff import encode_gtiff
                    payload = encode_gtiff(tile)
                else:
                    raise ValueError(f"MRF: cannot encode {comp!r}")
                slot = ci + c * (pxi + ncx * py)
                idx[2 * slot] = len(data)
                idx[2 * slot + 1] = len(payload)
                data += payload
    with open(base + ext, "wb") as f:
        f.write(bytes(data))
    with open(base + ".idx", "wb") as f:
        f.write(idx.tobytes())
    geo = ""
    if geotransform is not None:
        gt = geotransform
        minx, maxy = gt[0], gt[3]
        maxx = minx + gt[1] * w
        miny = maxy + gt[5] * h
        proj = f"\n    <Projection>{crs}</Projection>" if crs else ""
        geo = (f"\n  <GeoTags>\n    <BoundingBox minx=\"{minx!r}\" "
               f"miny=\"{miny!r}\" maxx=\"{maxx!r}\" "
               f"maxy=\"{maxy!r}\" />{proj}\n  </GeoTags>")
    nd = (f"\n    <DataValues NoData=\"{nodata!r}\" />"
          if nodata is not None else "")
    xml = (f"<MRF_META>\n  <Raster>\n    <Size x=\"{w}\" y=\"{h}\" "
           f"c=\"{c}\" />\n    <PageSize x=\"{page}\" y=\"{page}\" "
           f"c=\"1\" />\n    <Compression>{comp}</Compression>\n"
           f"    <DataType>{dt_name}</DataType>{nd}\n  </Raster>"
           f"{geo}\n</MRF_META>\n")
    with open(base + ".mrf", "w") as f:
        f.write(xml)
    return base + ".mrf"
