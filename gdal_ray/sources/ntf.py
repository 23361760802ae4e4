"""UK Ordnance Survey NTF (generic profile) reader.

NTF volumes are 80-column text records: each physical line ends with
``%``, the character before it is the continuation flag (``1`` =
record continues on the next line, whose ``00`` prefix and 2-char
tail are stripped on merge — ogr/ogrsf_frmts/ntf/ntfrecord.cpp
:28-80); the merged record's first two digits are the record type.

This port implements the driver's *generic* handling
(ntf_generic.cpp) for point and line features:

- ``07`` section header → tile name (3-12), XYLEN (15-19), XY_MULT
  /1000 (21-30), X/Y origin (47-56 / 57-66)
  (ntffilereader.cpp:435-455);
- ``40`` attribute descriptions → 2-char code (3-4), field width
  (5-7), interpretation (8-12), ``\\``-terminated name (13..)
  (ProcessAttDesc);
- ``14`` attribute records → ATT_ID (3-8) then repeated [2-char
  code, fwidth-wide value] until ``0``, zero-width values
  ``\\``-terminated (ProcessAttRec :876-960);
- ``21`` geometry → GTYPE (9), NUM_COORD (10-13), packed XYLEN-wide
  integer coordinate pairs from column 14, scaled by XY_MULT and
  offset by the section origin, consecutive duplicates dropped
  (ProcessGeometry);
- record groups start at POINTREC (15) / LINEREC (23) and collect
  the following 14/21 records (ReadRecordGroup semantics).

Polygon topology (24/31/33) and the product-specific layer schemas
(ntf_estlayers.cpp) are out of scope — the generic GEOMETRY/
attribute model covers the transport-format semantics."""

from __future__ import annotations

import pyarrow as pa

from ..core import wkb as W

__all__ = ["read_ntf"]


def _merge_records(path: str):
    """Physical lines → logical records (continuation handling)."""
    with open(path, "rb") as fh:
        lines = fh.read().decode("latin1", "replace").splitlines()
    rec = ""
    for line in lines:
        line = line.rstrip()
        if len(line) < 2 or not line.endswith("%"):
            continue
        cont = line[-2]
        if not rec:
            rec = line[:-2]
        else:
            if not line.startswith("00") or len(line) < 4:
                continue
            rec += line[2:-2]
        if cont != "1":
            if len(rec) >= 2 and rec[:2].isdigit():
                yield int(rec[:2]), rec
            rec = ""


def _field(rec: str, beg: int, end: int) -> str:
    """GetField: 1-based inclusive columns."""
    return rec[beg - 1:end]


def _int(rec: str, beg: int, end: int) -> int:
    s = _field(rec, beg, end).strip()
    try:
        return int(s)
    except ValueError:
        return 0


def read_ntf(path: str) -> pa.Table:
    """Read an NTF volume → one Arrow table of generic point/line
    features (FEAT_CODE-style attributes flattened by ADR name)."""
    xylen = 10
    xymult = 1.0
    xorig = yorig = 0.0
    tile = ""
    att_desc: dict[str, tuple] = {}  # code -> (width, name)

    features: list[dict] = []
    group_type = None
    group_attrs: list[tuple] = []
    group_geom = None
    group_id = 0

    def parse_attrec(rec: str):
        out = []
        i = 9  # 1-based col 9 == index 8; after ATT_ID 3-8
        while i <= len(rec) and rec[i - 1:i] not in ("", "0"):
            code = _field(rec, i, i + 1)
            if code not in att_desc:
                break
            width, name = att_desc[code]
            if width == 0:
                end = rec.find("\\", i + 1)
                if end < 0:
                    end = len(rec)
                val = rec[i + 1:end]
                i = end + 2
            else:
                val = _field(rec, i + 2, i + 2 + width - 1)
                i = i + 2 + width
            out.append((name or code, val.strip()))
        return out

    def parse_geometry(rec: str):
        gtype = _int(rec, 9, 9)
        ncoord = _int(rec, 10, 13)
        pts = []
        if gtype == 1:
            x = _int(rec, 14, 14 + xylen - 1) * xymult + xorig
            y = _int(rec, 14 + xylen, 14 + 2 * xylen - 1) * xymult \
                + yorig
            return W.point(x, y)
        if gtype in (2, 3, 4):
            last = None
            for k in range(ncoord):
                start = 14 + k * (2 * xylen + 1)
                x = _int(rec, start, start + xylen - 1) * xymult + xorig
                y = _int(rec, start + xylen,
                         start + 2 * xylen - 1) * xymult + yorig
                if last != (x, y):
                    pts.append((x, y))
                    last = (x, y)
            if len(pts) >= 2:
                return W.linestring(pts)
        return None

    def flush():
        nonlocal group_type, group_attrs, group_geom, group_id
        if group_type is not None:
            features.append({
                "fid": group_id,
                "kind": "POINT" if group_type == 15 else "LINE",
                "attrs": list(group_attrs),
                "geom": group_geom,
            })
        group_type = None
        group_attrs = []
        group_geom = None
        group_id = 0

    saw_vhr = False
    for rtype, rec in _merge_records(path):
        if rtype == 1:
            saw_vhr = True
        elif rtype == 7:
            tile = _field(rec, 3, 12).strip()
            xylen = _int(rec, 15, 19) or 10
            xymult = (_int(rec, 21, 30) or 1000) / 1000.0
            xorig = float(_int(rec, 47, 56))
            yorig = float(_int(rec, 57, 66))
        elif rtype == 40:
            code = _field(rec, 3, 4)
            width = _int(rec, 5, 7)
            end = rec.find("\\", 12)
            name = rec[12:end if end > 0 else len(rec)].strip()
            att_desc[code] = (width, name)
        elif rtype in (15, 23):
            flush()
            group_type = rtype
            group_id = _int(rec, 3, 8)
        elif rtype == 14 and group_type is not None:
            group_attrs.extend(parse_attrec(rec))
        elif rtype == 21 and group_type is not None:
            group_geom = parse_geometry(rec)
        elif rtype == 99:
            flush()
    flush()

    if not saw_vhr:
        raise ValueError("not an NTF volume (no volume header record)")

    names: list[str] = []
    for f in features:
        for k, _v in f["attrs"]:
            if k not in names:
                names.append(k)
    cols: dict[str, list] = {"FID": [], "KIND": []}
    for n in names:
        cols[n] = []
    wkbs = []
    for f in features:
        cols["FID"].append(f["fid"])
        cols["KIND"].append(f["kind"])
        d = dict(f["attrs"])
        for n in names:
            cols[n].append(d.get(n))
        wkbs.append(W.dumps(f["geom"]) if f["geom"] is not None
                    else None)
    arrays = {"FID": pa.array(cols["FID"], pa.int64()),
              "KIND": pa.array(cols["KIND"], pa.string())}
    for n in names:
        arrays[n] = pa.array(cols[n], pa.string())
    arrays["wkb_geometry"] = pa.array(wkbs, pa.binary())
    t = pa.table(arrays)
    if tile:
        t = t.replace_schema_metadata({b"tile": tile.encode()})
    return t
