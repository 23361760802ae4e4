"""Esri Compact Cache V2 reader (``conf.xml`` + ``_alllayers/Lxx/
RyyyyCxxxx.bundle``) — the bundled tile cache ArcGIS exports.

Reference frmts/esric/esric_dataset.cpp: bundle files hold a 64-byte
header (magic words 3 @0, 5 @12, 40 @32, 0 @36, index size @60) and a
128x128 little-endian uint64 tile index where the low 40 bits are the
tile's file offset and the high 24 bits its size (0 = missing tile);
bundle names use the hex row/col of the 128-tile block.  Extent and
per-LOD resolutions come from conf.xml's TileCacheInfo; missing tiles
read as zeros; JPEG caches expose 3 bands, everything else 4
(grayscale tiles replicate, missing alpha is opaque).
"""

from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET

import numpy as np


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def parse_esric_conf(conf_path: str) -> dict:
    root = ET.parse(conf_path).getroot()
    for el in root.iter():
        el.tag = _local(el.tag)
    tci = root.find(".//TileCacheInfo")
    fmt = root.findtext(".//TileImageInfo/CacheTileFormat", "JPEG")
    storage = root.findtext(".//CacheStorageInfo/StorageFormat", "")
    if "CompactV2" not in storage:
        raise ValueError("ESRIC: not an esri V2 bundled cache")
    bsz = int(float(root.findtext(".//CacheStorageInfo/PacketSize",
                                  "128")))
    tsz = int(float(tci.findtext("TileCols", "256")))
    minx = float(tci.findtext("TileOrigin/X", "-180"))
    maxy = float(tci.findtext("TileOrigin/Y", "90"))
    maxx = float(tci.findtext("TileEnd/X", str(-minx)))
    miny = float(tci.findtext("TileEnd/Y", str(-maxy)))
    lods = {}
    for li in tci.iter("LODInfo"):
        lods[int(li.findtext("LevelID"))] = float(
            li.findtext("Resolution"))
    wkt = tci.findtext("SpatialReference/WKT", "")
    wkid = tci.findtext("SpatialReference/WKID", "")
    return {"bsz": bsz, "tsz": tsz, "minx": minx, "maxy": maxy,
            "maxx": maxx, "miny": miny, "lods": lods, "format": fmt,
            "crs": f"EPSG:{wkid}" if wkid else wkt}


def _read_bundle_index(path: str, bsz: int):
    buf = open(path, "rb").read()
    if len(buf) < 64 + bsz * bsz * 8:
        return None, None
    magic = struct.unpack_from("<4I", buf, 0)
    if magic[0] != 3 or magic[3] != 5:
        return None, None
    if struct.unpack_from("<I", buf, 60)[0] != bsz * bsz * 8:
        return None, None
    idx = np.frombuffer(buf, "<u8", bsz * bsz, 64)
    return idx, buf


def _decode_tile(blob: bytes) -> np.ndarray:
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode as png_decode
        return np.asarray(png_decode(blob))
    if blob[:2] == b"\xff\xd8":
        from .jpeg import decode as jpeg_decode
        return np.asarray(jpeg_decode(blob))
    raise ValueError("ESRIC: unknown tile payload")


def decode_esric(conf_path: str, lod: int | None = None):
    """-> (pixels (h, w, 3|4) uint8 for the requested LOD, gt,
    None, meta)."""
    conf = parse_esric_conf(conf_path)
    lods = conf["lods"]
    if lod is None:
        lod = max(lods)
    if lod not in lods:
        raise ValueError(f"ESRIC: no LOD {lod}")
    res = lods[lod]
    tsz, bsz = conf["tsz"], conf["bsz"]
    w = int(round((conf["maxx"] - conf["minx"]) / res))
    h = int(round((conf["maxy"] - conf["miny"]) / res))
    ntx = (w + tsz - 1) // tsz
    nty = (h + tsz - 1) // tsz
    nbands = 3 if conf["format"].upper() == "JPEG" else 4
    out = np.zeros((h, w, nbands), np.uint8)
    layers = os.path.join(os.path.dirname(conf_path), "_alllayers")
    cache: dict = {}
    for ty in range(nty):
        for tx in range(ntx):
            bname = os.path.join(
                layers, f"L{lod:02d}",
                f"R{(ty // bsz) * bsz:04x}C{(tx // bsz) * bsz:04x}"
                ".bundle")
            if bname not in cache:
                cache[bname] = (_read_bundle_index(bname, bsz)
                                if os.path.exists(bname)
                                else (None, None))
            idx, buf = cache[bname]
            if idx is None:
                continue
            v = int(idx[(ty % bsz) * bsz + (tx % bsz)])
            off = v & 0xFFFFFFFFFF
            size = v >> 40
            if size == 0:
                continue
            tile = _decode_tile(buf[off:off + size])
            if tile.ndim == 2:
                tile = tile[:, :, None]
            th, tw, tc = tile.shape
            y0, x0 = ty * tsz, tx * tsz
            hh, ww = min(th, h - y0), min(tw, w - x0)
            blk = out[y0:y0 + hh, x0:x0 + ww]
            if tc >= nbands:
                blk[:] = tile[:hh, :ww, :nbands]
            else:
                for b in range(min(3, nbands)):
                    blk[:, :, b] = tile[:hh, :ww, min(b, tc - 1)]
                if nbands == 4:
                    blk[:, :, 3] = (tile[:hh, :ww, 3]
                                    if tc == 4 else 255)
    gt = (conf["minx"], res, 0.0, conf["maxy"], 0.0, -res)
    meta = {"driver": "ESRIC", "crs": conf["crs"], "lod": lod,
            "lods": sorted(lods), "format": conf["format"]}
    return out, gt, None, meta
