"""Northwood/VerticalMapper grids: NWT_GRD (.grd continuous surface)
and NWT_GRC (.grc classified) — frmts/northwood/.

Layout (northwood.cpp nwt_ParseHeader): "HGPC" magic, format char at
byte 4 ('1' surface, '8' classified); u16 grid sides at 9/11 (u32
fallback at 128/132); bounds doubles at 13..45; zmin/zmax floats at
45/49; color inflections (float z + rgb, 7 bytes each) from 518;
bits-per-pixel byte at 1023; 1024-byte header then row-major samples
top-down.

GRD exposes the reference's 4 synthesized bands: R/G/B rendered
through the 4096-entry inflection color ramp (nwt_LoadColors /
createIP linear interpolation with the +0.5 rounding, indexed by
raw >> 4) and band 4 = Z as ``offset + (raw-1) * (zmax-zmin)/65534``
with raw 0 -> nodata -1e37 (grddataset.cpp IReadBlock). GRC is one
band of class indices plus the class dictionary color table stored
after the pixel data.

Goldens in tests/test_rmf.py from autotest/gdrivers/nwt_grd.py
(28093/33690/20365/25856) and nwt_grc.py (46760).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_nwt_grd", "decode_nwt_grc"]

_NODATA = -1.0e37


def _parse_header(buf: bytes):
    if buf[:4] != b"HGPC":
        raise ValueError("not a Northwood grid")
    h = {}
    h["format"] = chr(buf[4])
    (xs,) = struct.unpack_from("<H", buf, 9)
    (ys,) = struct.unpack_from("<H", buf, 11)
    if xs == 0:
        (xs,) = struct.unpack_from("<I", buf, 128)
    if ys == 0:
        (ys,) = struct.unpack_from("<I", buf, 132)
    h["nx"], h["ny"] = xs, ys
    (h["minx"], h["maxx"], h["miny"], h["maxy"]) = struct.unpack_from(
        "<4d", buf, 13)
    (h["zmin"], h["zmax"]) = struct.unpack_from("<2f", buf, 45)
    (n_infl,) = struct.unpack_from("<H", buf, 516)
    infl = []
    if n_infl <= 32:
        for i in range(n_infl):
            (z,) = struct.unpack_from("<f", buf, 518 + 7 * i)
            r, g, b = buf[522 + 7 * i:525 + 7 * i]
            infl.append((z, r, g, b))
    h["inflections"] = infl
    bpp_byte = buf[1023]
    if h["format"] == "8":  # GRC: 0 -> 16 bit, else nibbles
        h["bpp"] = 16 if bpp_byte == 0 else bpp_byte * 4
    else:
        h["bpp"] = bpp_byte * 8
    h["step"] = (h["maxx"] - h["minx"]) / (xs - 1)
    return h


def _load_colors(h, map_size: int = 4096) -> np.ndarray:
    """nwt_LoadColors + createIP: piecewise-linear ramp over the
    inflection points scaled into zmin..zmax."""
    cmap = np.zeros((map_size, 3), np.uint8)
    infl = h["inflections"]
    zmin, zmax = h["zmin"], h["zmax"]
    mark = 0
    cmap[0] = (255, 255, 255)

    def linear(lo, hi, z):
        if z < lo[0]:
            return lo[1:]
        if z > hi[0]:
            return hi[1:]
        if hi[0] == lo[0]:
            return lo[1:]
        t = (z - lo[0]) / (hi[0] - lo[0])
        return tuple(int(lo[k + 1] + (hi[k + 1] - lo[k + 1]) * t + 0.5)
                     for k in range(3))

    def create_ip(index, rgb):
        nonlocal mark
        if index == 0:
            cmap[0] = rgb
            mark = 0
            return
        if index <= mark:
            return
        wm = mark
        base = cmap[wm].astype(np.float32)
        slope = (np.asarray(rgb, np.float32) - base) / (index - wm)
        for i in range(wm + 1, index):
            cmap[i] = np.asarray(base + (i - wm) * slope + 0.5, np.uint8)
        cmap[index] = rgb
        mark = index

    if not infl:
        return cmap
    if zmin <= infl[0][0]:
        create_ip(1, infl[0][1:])
        i = 1
    else:
        i = 1
        while i < len(infl):
            if zmin < infl[i][0]:
                create_ip(1, linear(infl[i - 1], infl[i], zmin))
                break
            i += 1
    if i >= len(infl):
        create_ip(1, infl[-1][1:])
        create_ip(map_size - 1, infl[-1][1:])
    else:
        index = 0
        while i < len(infl):
            if zmax < infl[i][0]:
                index = map_size - 1
                create_ip(index, linear(infl[i - 1], infl[i], zmax))
                break
            index = int((infl[i][0] - zmin) / (zmax - zmin) * map_size)
            index = min(index, map_size - 1)
            create_ip(index, infl[i][1:])
            i += 1
        if index < map_size - 1:
            create_ip(map_size - 1, infl[-1][1:])
    return cmap


def decode_nwt_grd(buf: bytes):
    h = _parse_header(buf)
    if h["format"] != "1":
        raise ValueError("not an NWT_GRD surface grid")
    nx, ny = h["nx"], h["ny"]
    raw = np.frombuffer(buf, "<u2", nx * ny, 1024).reshape(ny, nx)
    cmap = _load_colors(h)
    idx = (raw >> 4).astype(np.intp)
    rgb = cmap[idx]  # (ny, nx, 3)
    scale = (h["zmax"] - h["zmin"]) / 65534.0
    z = h["zmin"] + (raw.astype(np.float64) - 1) * scale
    z = np.where(raw == 0, _NODATA, z).astype(np.float32)
    px = np.dstack([rgb.astype(np.float32),
                    z[:, :, None]]).astype(np.float32)
    # bands 1-3 are uint8 colors, band 4 float Z; keep native types by
    # returning float32 with integral color planes (checksum-stable)
    gt = (h["minx"] - h["step"] * 0.5, h["step"], 0.0,
          h["maxy"] + h["step"] * 0.5, 0.0, -h["step"])
    meta = {"driver": "NWT_GRD", "z_min": h["zmin"], "z_max": h["zmax"]}
    return px, gt, _NODATA, meta


def decode_nwt_grc(buf: bytes):
    h = _parse_header(buf)
    if h["format"] != "8":
        raise ValueError("not an NWT_GRC classified grid")
    nx, ny = h["nx"], h["ny"]
    bpp = h["bpp"]
    dt = np.dtype("<u2") if bpp == 16 else np.dtype("u1")
    raw = np.frombuffer(buf, dt, nx * ny, 1024).reshape(ny, nx)
    # class dictionary follows the pixel block
    off = 1024 + nx * ny * dt.itemsize
    meta: dict = {"driver": "NWT_GRC"}
    if off + 2 <= len(buf):
        (n_items,) = struct.unpack_from("<H", buf, off)
        off += 2
        classes = []
        pal = {}
        for _ in range(n_items):
            if off + 9 > len(buf):
                break
            pix, _res1, r, g, b, _res2, ln = struct.unpack_from(
                "<HBBBBBH", buf, off)
            off += 9
            name = buf[off:off + ln].split(b"\x00")[0].decode(
                "latin-1", "replace")
            off += ln
            classes.append((pix, name))
            pal[pix] = (r, g, b, 255)
        meta["classes"] = classes
        meta["palette_map"] = pal
    gt = (h["minx"] - h["step"] * 0.5, h["step"], 0.0,
          h["maxy"] + h["step"] * 0.5, 0.0, -h["step"])
    return np.ascontiguousarray(raw), gt, None, meta
