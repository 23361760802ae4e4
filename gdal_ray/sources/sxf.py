"""SXF (Panorama / Russian military topographic exchange) vector
reader with RSC classifier support.

Independent implementation of the published SXF 3/4 binary layout
with the reference driver's semantics (ogr/ogrsf_frmts/sxf/):

* passport: creation date / sheet (CP1251) / scale, information
  flags (real-coordinate compliance, semantics coding), v4 EPSG or
  ellipsoid+projection normalization inputs, projected + geographic
  corner coordinates, device frame (resolution, frame corners) —
  device coordinates map through ``origin + value * scale/resolution``
  exactly like ogrsxflayer.cpp's TranslateXYH (disk order is
  northing-first; OGR x = second value).
* records: 32-byte headers (magic 0x7FFF7FFF), local geometry type
  from the low nibble of the first reference byte (line / polygon /
  point / text / vector), value width from the float/big flags
  (i16/i32/f32/f64, H always f32 except doubles), sub-objects as
  (no, count) prefixed point runs → polygon holes / extra line parts,
  text signs appended after coordinates.
* semantics: (code, type, scale) attribute headers — numbers scaled
  by 10^scale, ASCIIZ-DOS (CP866) / ANSI (CP1251) / UNICODE /
  BIGTEXT strings — exposed as ``SC_<code>`` columns.
* layers: from an RSC classifier (layer table + object table mapping
  classify codes to layers, KOI8-R/CP1251 names per nFontEnc, short
  or full names) falling back to the default SYSTEM
  (1000000001-14, 91000000) + Not_Classified pair; the catch-all
  Not_Classified layer is last and empty layers are dropped, matching
  ogrsxfdatasource.cpp's CreateLayers/FillLayers.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pyarrow as pa

__all__ = ["read_sxf"]

_IDSXFOBJ = 0x7FFF7FFF
_TO_DEG = 180.0 / math.pi


def _cstr(raw: bytes, enc="cp1251") -> str:
    return raw.split(b"\0")[0].decode(enc, "replace").strip()


class _Passport:
    pass


def _read_passport(buf: bytes) -> _Passport:
    if buf[:3] != b"SXF":
        raise ValueError("not an SXF file")
    p = _Passport()
    p.version = buf[10]
    if p.version not in (3, 4):
        # v3 stores the version in the low half-word
        p.version = buf[8] or buf[10]
    if p.version == 4:
        desc = buf[16:96]
        p.sheet = _cstr(desc[12:44])
        p.scale = struct.unpack_from("<I", desc, 44)[0]
        p.sheet_name = _cstr(desc[48:80])
        flags = buf[96:100]
        p.real_coords = bool(flags[0] & 0x10)
        p.epsg = struct.unpack_from("<i", buf, 100)[0]
        proj = struct.unpack_from("<8d", buf, 104)
        geo = struct.unpack_from("<8d", buf, 168)
        p.proj_corners = list(proj)
        p.geo_corners = [v * _TO_DEG for v in geo]
        p.ellips, p.vcs, p.projsys, p.datum, p.unit = buf[232:237]
        dev = struct.unpack_from("<10I", buf, 312)
        p.resolution = dev[0]
        p.frame = [struct.unpack_from("<i", buf, 316 + 4 * i)[0]
                   for i in range(8)]
        params = struct.unpack_from("<6d", buf, 352)
        p.x_or = params[2] * _TO_DEG
        p.y_or = params[3] * _TO_DEG
        p.record_count = struct.unpack_from("<I", buf, 440)[0]
        p.records_at = 452
    elif p.version == 3:
        desc = buf[16:78]
        p.sheet = _cstr(desc[8:32])
        p.scale = struct.unpack_from("<I", desc, 32)[0]
        p.sheet_name = _cstr(desc[36:62], "cp866")
        flags = buf[78:82]
        p.real_coords = bool(flags[0] & 0x10)
        p.epsg = 0
        corners = struct.unpack_from("<8i", buf, 94)
        p.proj_corners = [v / 10.0 for v in corners]
        geo = struct.unpack_from("<8i", buf, 126)
        p.geo_corners = [v * 0.00000057295779513082 for v in geo]
        p.ellips, p.vcs, p.projsys, p.datum, p.unit = buf[158:163]
        nres, = struct.unpack_from("<I", buf, 212)
        p.resolution = nres
        p.frame = list(struct.unpack_from("<8h", buf, 216))
        p.x_or = p.y_or = 0.0
        p.record_count = struct.unpack_from("<I", buf, 288)[0]
        p.records_at = 300
    else:
        raise ValueError(f"unsupported SXF version {p.version}")

    # device→map transform (ogrsxfdatasource.cpp:820-855)
    p.coeff = (p.scale / p.resolution) if p.resolution else 0.0
    if not p.real_coords:
        if all(v == 0 for v in p.frame):
            p.real_coords = True
        else:
            p.x_or = p.proj_corners[1] - p.frame[1] * p.coeff
            p.y_or = p.proj_corners[0] - p.frame[0] * p.coeff
    return p


# ------------------------------------------------------------- RSC

def _read_rsc(path: str, fullname: bool):
    """→ (layers [(id, name)], {classify code: (layer id, obj name)})
    or None when the file is not a parseable RSC."""
    try:
        buf = open(path, "rb").read()
    except OSError:
        return None
    hdr_fmt = "<4sIIIIIII8s32s32s8sI4s" + "III" * 14 + "BB30sII"
    if len(buf) < struct.calcsize(hdr_fmt):
        return None
    vals = struct.unpack_from(hdr_fmt, buf, 0)
    if vals[0] not in (b"RSC\0", b"RSC "):
        return None
    sec = vals[14:14 + 42]
    objects = sec[0:3]          # (offset, length, count)
    layers_sec = sec[15:18]
    font_enc = vals[-2]
    enc = {125: "koi8-r", 126: "cp1251"}.get(font_enc, "cp1251")

    layers = []
    off = layers_sec[0]
    for _ in range(layers_sec[2]):
        if off + 56 > len(buf):
            break
        ln, = struct.unpack_from("<I", buf, off)
        name = _cstr(buf[off + 4:off + 36], enc)
        short = _cstr(buf[off + 36:off + 52], enc)
        no = buf[off + 52]
        layers.append((no, (name if fullname else short) or "Unnamed"))
        off += ln if ln else 56

    codes = {}
    off = objects[0]
    for _ in range(objects[2]):
        if off + 96 > len(buf):
            break
        ln, ccode = struct.unpack_from("<II", buf, off)
        name = _cstr(buf[off + 48:off + 80], enc) or "Unnamed"
        layer_no = buf[off + 81]
        codes.setdefault(ccode, (layer_no, name))
        off += ln if ln else 96
    return layers, codes


# ------------------------------------------------------------ records

_VAL_SIZES = {("short", False): 4, ("float", False): 8,
              ("int", False): 8, ("double", False): 16,
              ("short", True): 8, ("float", True): 12,
              ("int", True): 12, ("double", True): 24}


def _read_points(buf, off, n, vt, b3d, p: _Passport):
    """n vertices at off → (list[(x, y)], new off)."""
    out = []
    if vt == "short":
        step, fmt, hsz = 4, "<hh", 4
    elif vt == "float":
        step, fmt, hsz = 8, "<ff", 4
    elif vt == "int":
        step, fmt, hsz = 8, "<ii", 4
    else:
        step, fmt, hsz = 16, "<dd", 8
    full = step + (hsz if b3d else 0)
    for _ in range(n):
        if off + step > len(buf):
            break
        yv, xv = struct.unpack_from(fmt, buf, off)
        if p.real_coords:
            x, y = float(xv), float(yv)
        else:
            x = p.x_or + float(xv) * p.coeff
            y = p.y_or + float(yv) * p.coeff
        out.append((x, y))
        off += full
    return out, off


def _semantic_attrs(buf) -> dict:
    out = {}
    off = 0
    n = len(buf)
    while off + 4 <= n:
        code, typ, scale = struct.unpack_from("<HBb", buf, off)
        off += 4
        key = f"SC_{code}"
        if typ == 0:                          # ASCIIZ DOS
            ln = (scale & 0xFF) + 1
            out[key] = _cstr(buf[off:off + ln], "cp866")
            off += ln
        elif typ == 1:
            if off + 1 > n:
                break
            out[key] = buf[off] * 10.0 ** scale
            off += 1
        elif typ == 2:
            if off + 2 > n:
                break
            out[key] = struct.unpack_from("<h", buf, off)[0] * 10.0 ** scale
            off += 2
        elif typ == 4:
            if off + 4 > n:
                break
            out[key] = struct.unpack_from("<i", buf, off)[0] * 10.0 ** scale
            off += 4
        elif typ == 8:
            if off + 8 > n:
                break
            out[key] = struct.unpack_from("<d", buf, off)[0] * 10.0 ** scale
            off += 8
        elif typ == 126:                      # ANSI WIN
            ln = (scale & 0xFF) + 1
            out[key] = _cstr(buf[off:off + ln], "cp1251")
            off += ln
        elif typ == 127:                      # UNICODE (UCS-2)
            ln = ((scale & 0xFF) + 1) * 2
            out[key] = buf[off:off + ln].decode("utf-16-le",
                                                "replace").rstrip("\0")
            off += ln
        elif typ == 128:                      # BIGTEXT (UTF-16 + u32 len)
            if off + 4 > n:
                break
            ln = struct.unpack_from("<I", buf, off)[0]
            out[key] = buf[off + 4:off + 4 + ln].decode(
                "utf-16-le", "replace").rstrip("\0")
            off += 4 + ln
        else:
            break
    return out


def read_sxf(path: str, rsc_path: str | None = None,
             layer_fullname: bool = False) -> dict[str, pa.Table]:
    """→ {layer name: table (ogc_fid, CLCODE, CLNAME, OBJECTNUMB,
    TEXT, SC_* semantics, wkb)} in classifier order with the
    Not_Classified catch-all last; empty layers dropped."""
    buf = open(path, "rb").read()
    p = _read_passport(buf)

    # layer set: explicit RSC > sibling .rsc > default pair
    rsc = None
    if rsc_path is None:
        for cand in (os.path.splitext(path)[0] + ".rsc",
                     path + ".rsc"):
            if os.path.exists(cand):
                rsc_path = cand
                break
    if rsc_path is not None:
        rsc = _read_rsc(rsc_path, layer_fullname)

    layer_defs: list[tuple[int, str]] = []
    code_map: dict[int, tuple[int, str]] = {}
    if rsc:
        layer_defs, code_map = rsc
        layer_defs = list(layer_defs)
    else:
        layer_defs = [(0, "SYSTEM")]
        for c in list(range(1000000001, 1000000015)) + [91000000]:
            code_map[c] = (0, str(c))
    layer_defs.append((255, "Not_Classified"))

    feats: dict[int, list[dict]] = {lid: [] for lid, _n in layer_defs}

    from ..core import wkb as W

    off = p.records_at
    for fid in range(p.record_count):
        if off + 32 > len(buf):
            break
        (nid, full_len, geom_len, clcode, _g0, _g1) = struct.unpack_from(
            "<IIIIHH", buf, off)
        if nid != _IDSXFOBJ:
            break
        ref = buf[off + 20:off + 23]
        n_points, = struct.unpack_from("<I", buf, off + 24)
        n_sub, n_small = struct.unpack_from("<HH", buf, off + 28)

        if p.version == 4:
            code = ref[0] & 15
            if ref[2] & 0x20:
                n_sub = 0
            if code == 4:
                code = 0x21
                n_sub = 0
            has_text = bool(ref[2] & 0x08)
        else:
            if ref[2] & 0x08:
                code = 0x22 if (ref[2] & 0x10) else 0x21
                n_sub = 0
            else:
                code = ref[0] & 3
            has_text = bool(ref[2] & 0x20)
        b3d = bool(ref[2] & 0x02)
        vt = ("double" if (ref[2] & 0x04) and (ref[1] & 0x04) else
              "float" if ref[2] & 0x04 else
              "int" if ref[1] & 0x04 else "short")
        has_attrs = bool(ref[1] & 0x02)

        npt = n_points if n_small == 65535 else n_small
        geom = buf[off + 32:off + 32 + geom_len]

        parts = []
        o2 = 0
        pts, o2 = _read_points(geom, 0, npt, vt, b3d, p)
        parts.append(pts)
        for _s in range(n_sub):
            if o2 + 4 > len(geom):
                break
            _no, ncoord = struct.unpack_from("<HH", geom, o2)
            o2 += 4
            sub, o2 = _read_points(geom, o2, ncoord, vt, b3d, p)
            parts.append(sub)

        text = None
        if has_text and o2 < len(geom):
            tlen = geom[o2]
            raw = geom[o2 + 1:o2 + 1 + tlen]
            text = raw.split(b"\0")[0].decode("cp1251", "replace")

        g = None
        if code == 0x02 and parts[0]:                       # point
            g = (W.multipoint([pt[0] for pt in
                               [pp for pp in parts if pp]])
                 if len([pp for pp in parts if pp]) > 1
                 else W.point(*parts[0][0]))
        elif code in (0x00, 0x22, 0x03, 0x05, 0x21):        # line/text
            lines = [pp for pp in parts if len(pp) >= 2]
            if len(lines) == 1:
                g = W.linestring(lines[0])
            elif lines:
                g = W.collection([W.linestring(ln) for ln in lines])
        elif code == 0x01:                                  # polygon
            rings = []
            for pp in parts:
                if len(pp) >= 3:
                    ring = pp if pp[0] == pp[-1] else pp + [pp[0]]
                    rings.append(ring)
            if rings:
                g = W.polygon(rings[0], holes=rings[1:])

        row = {"ogc_fid": fid, "CLCODE": clcode,
               "OBJECTNUMB": n_sub, "TEXT": text,
               "wkb": W.dumps(g) if g is not None else None}
        if has_attrs and geom_len <= full_len - 32:
            row.update(_semantic_attrs(
                buf[off + 32 + geom_len:off + full_len]))

        lid, oname = code_map.get(clcode, (255, str(clcode)))
        row["CLNAME"] = oname
        if lid not in feats:
            lid = 255
        feats[lid].append(row)
        off += full_len

    out: dict[str, pa.Table] = {}
    for lid, lname in layer_defs:
        rows = feats.get(lid) or []
        if not rows:
            continue
        fields = ["ogc_fid", "CLCODE", "CLNAME", "OBJECTNUMB", "TEXT"]
        extra = []
        for r in rows:
            for k in r:
                if k not in fields and k != "wkb" and k not in extra:
                    extra.append(k)
        cols = {f: [r.get(f) for r in rows] for f in fields + extra}
        cols["wkb"] = [r.get("wkb") for r in rows]
        schema = pa.schema(
            [("ogc_fid", pa.int64()), ("CLCODE", pa.int64()),
             ("CLNAME", pa.string()), ("OBJECTNUMB", pa.int64()),
             ("TEXT", pa.string())]
            + [(k, pa.string() if any(
                isinstance(r.get(k), str) for r in rows) else pa.float64())
               for k in extra]
            + [("wkb", pa.binary())],
            metadata={b"sheet": p.sheet.encode("utf-8", "replace"),
                      b"scale": str(p.scale).encode(),
                      b"epsg": str(p.epsg).encode()})
        out[lname] = pa.Table.from_pydict(
            {k: ([str(v) if v is not None else None for v in vs]
                 if schema.field(k).type == pa.string() and k != "wkb"
                 else vs)
             for k, vs in cols.items()}, schema=schema)
    return out
