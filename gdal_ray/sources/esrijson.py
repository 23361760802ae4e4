"""ESRIJSON (ArcGIS FeatureService JSON) reader.

Independent implementation of the Esri REST API featureSet encoding
with the reference driver's semantics
(ogr/ogrsf_frmts/geojson/ogresrijsonreader.cpp):

* ``fields`` declares the schema (esriFieldTypeSmallInteger/Integer/
  BigInteger/Single/Double/String/Date/DateOnly/TimeOnly/GUID/
  GlobalID/OID); the OID field doubles as the FID column.
* ``esriFieldTypeDate`` values are epoch milliseconds rendered UTC as
  ``YYYY/MM/DD HH:MM:SS+00``; DateOnly swaps ``-`` for ``/``.
* geometries: ``x/y(/z/m)`` points, ``points`` multipoints, ``paths``
  polylines (one path → LineString, several → MultiLineString) and
  ``rings`` polygons organized by ring containment — a ring contained
  in an outer ring becomes its hole, disjoint outers make a
  MultiPolygon (the reference delegates to OGROrganizePolygons).
* hasZ/hasM control the 3rd/4th tuple components; ``hasM`` without
  ``hasZ`` reads the 3rd component as M (WKT ``MULTIPOINT M (...)``).
* ``spatialReference.wkid`` → CRS (latestWkid preferred).

Output: one Arrow table per document; typed attribute columns, the
OID column also exposed as ``fid``, geometry as OGR-dialect ``wkt``
(Z/M-aware) plus 2-D ``wkb``.
"""

from __future__ import annotations

import datetime
import json
import os
import re

import numpy as np
import pyarrow as pa

__all__ = ["read_esrijson"]

_TYPES = {
    "esriFieldTypeSmallInteger": pa.int16(),
    "esriFieldTypeInteger": pa.int32(),
    "esriFieldTypeBigInteger": pa.int64(),
    "esriFieldTypeOID": pa.int64(),
    "esriFieldTypeSingle": pa.float32(),
    "esriFieldTypeDouble": pa.float64(),
}


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _tuple_wkt(pt, nord):
    return " ".join(_fmt(c) for c in pt[:nord])


def _ring_area(r):
    a = np.asarray(r, float)[:, :2]
    x, y = a[:, 0], a[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_ring(pt, ring):
    x, y = pt[0], pt[1]
    inside = False
    a = np.asarray(ring, float)
    n = len(a)
    j = n - 1
    for i in range(n):
        xi, yi = a[i, 0], a[i, 1]
        xj, yj = a[j, 0], a[j, 1]
        if (yi > y) != (yj > y) and \
                x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _organize_rings(rings):
    """ESRI rings → [(outer, [holes...])] by containment (the
    reference's OGROrganizePolygons DEFAULT method on the same
    input)."""
    if not rings:
        return []
    order = sorted(range(len(rings)),
                   key=lambda i: -abs(_ring_area(rings[i])))
    polys: list[list] = []           # each [outer, holes...]
    for i in order:
        r = rings[i]
        placed = False
        # smallest containing outer wins (scan newest-first so nested
        # islands-in-lakes stay outers)
        for p in reversed(polys):
            if _point_in_ring(r[0], p[0]):
                # contained an odd number of times → hole of that poly
                depth = sum(1 for q in polys
                            if _point_in_ring(r[0], q[0]))
                if depth % 2 == 1:
                    p.append(r)
                    placed = True
                break
        if not placed:
            polys.append([r])
    return [(p[0], p[1:]) for p in polys]


def _zm_mode(geom, tuples):
    """→ (n_ordinates, has_z, has_m).  Explicit per-geometry
    hasZ/hasM flags win; otherwise a 3rd tuple component is Z and a
    4th is M (ogresrijsonreader.cpp's defaults).  A promised ordinate
    missing from the data degrades the whole geometry (the reference's
    hasZ-without-z multipoint reads 2-D)."""
    avail = min((len(t) for t in tuples if isinstance(t, list)),
                default=2)
    z_flag, m_flag = geom.get("hasZ"), geom.get("hasM")
    if z_flag is None and m_flag is None:
        has_z = avail >= 3
        has_m = avail >= 4
    else:
        has_m = bool(m_flag)
        has_z = bool(z_flag)
    # degrade when data is short
    need = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    while need > avail:
        if has_m:
            has_m = False
        elif has_z:
            has_z = False
        need = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    return need, has_z, has_m


def _geometry_wkt(geom, _doc_z=False, _doc_m=False):
    """→ OGR-dialect WKT or None when the object has no geometry.
    Z geometries use OGR's legacy inline-ordinate style; measured
    ones the tagged ``M``/``ZM`` form with per-point parentheses
    (matching exportToWkt's output for each case)."""
    if not isinstance(geom, dict):
        return None

    def norm(pt, nord):
        if not isinstance(pt, list) or len(pt) < 2:
            return None
        vals = [float(v) for v in pt[:nord]
                if isinstance(v, (int, float)) and not isinstance(v, bool)]
        if len(vals) < 2:
            return None
        while len(vals) < nord:
            vals.append(0.0)
        return vals

    if "x" in geom and "y" in geom:
        if not isinstance(geom.get("x"), (int, float)):
            return "POINT EMPTY"
        pt = [float(geom["x"]), float(geom["y"])]
        has_m = isinstance(geom.get("m"), (int, float))
        if isinstance(geom.get("z"), (int, float)):
            pt.append(float(geom["z"]))
        elif has_m:
            pass
        if has_m:
            if len(pt) == 2:
                return f"POINT M ({_tuple_wkt(pt + [float(geom['m'])], 3)})"
            return f"POINT ZM ({_tuple_wkt(pt + [float(geom['m'])], 4)})"
        return f"POINT ({_tuple_wkt(pt, len(pt))})"
    if "points" in geom:
        raw = [p for p in (geom["points"] or []) if isinstance(p, list)]
        nord, has_z, has_m = _zm_mode(geom, raw)
        pts = [norm(p, nord) for p in raw]
        pts = [p for p in pts if p is not None]
        if not pts:
            return "MULTIPOINT EMPTY"
        if has_m:
            tag = " ZM" if has_z else " M"
            inner = ",".join(f"({_tuple_wkt(p, nord)})" for p in pts)
            return f"MULTIPOINT{tag} ({inner})"
        return ("MULTIPOINT ("
                + ",".join(_tuple_wkt(p, nord) for p in pts) + ")")
    if "paths" in geom:
        raw_paths = [p for p in (geom["paths"] or [])
                     if isinstance(p, list)]
        all_pts = [t for pth in raw_paths for t in pth
                   if isinstance(t, list)]
        nord, has_z, has_m = _zm_mode(geom, all_pts)
        tag = (" ZM" if has_z and has_m else " M" if has_m else "")
        paths = []
        for path in raw_paths:
            pts = [norm(p, nord) for p in path]
            pts = [p for p in pts if p is not None]
            if pts:
                paths.append(pts)
        if not paths:
            return "LINESTRING EMPTY"
        if len(paths) == 1:
            return (f"LINESTRING{tag} ("
                    + ",".join(_tuple_wkt(p, nord) for p in paths[0]) + ")")
        body = ",".join(
            "(" + ",".join(_tuple_wkt(p, nord) for p in pth) + ")"
            for pth in paths)
        return f"MULTILINESTRING{tag} ({body})"
    if "rings" in geom:
        raw_rings = [r for r in (geom["rings"] or [])
                     if isinstance(r, list)]
        all_pts = [t for r in raw_rings for t in r if isinstance(t, list)]
        nord, has_z, has_m = _zm_mode(geom, all_pts)
        tag = (" ZM" if has_z and has_m else " M" if has_m else "")
        rings = []
        for r in raw_rings:
            pts = [norm(p, nord) for p in r]
            pts = [p for p in pts if p is not None]
            if len(pts) >= 4:
                rings.append(pts)
        if not rings:
            return "POLYGON EMPTY"
        polys = _organize_rings(rings)

        def ring_wkt(r):
            return "(" + ",".join(_tuple_wkt(p, nord) for p in r) + ")"
        if len(polys) == 1:
            outer, holes = polys[0]
            return (f"POLYGON{tag} ("
                    + ",".join(ring_wkt(r) for r in [outer] + holes) + ")")
        body = ",".join(
            "(" + ",".join(ring_wkt(r) for r in [outer] + holes) + ")"
            for outer, holes in polys)
        return f"MULTIPOLYGON{tag} ({body})"
    return None


def _format_date_ms(ms) -> str | None:
    if not isinstance(ms, (int, float)):
        return None if ms is None else str(ms)
    dt = datetime.datetime.fromtimestamp(ms / 1000.0,
                                         tz=datetime.timezone.utc)
    return dt.strftime("%Y/%m/%d %H:%M:%S+00")


def read_esrijson(path_or_text: str) -> pa.Table:
    if path_or_text.lstrip().startswith("{"):
        text = path_or_text
        name = "ESRIJSON"
    else:
        text = open(path_or_text, encoding="utf-8").read()
        name = os.path.splitext(os.path.basename(path_or_text))[0]
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = json.loads(re.sub(r",\s*([}\]])", r"\1", text))

    feats = doc.get("features")
    if not isinstance(feats, list):
        raise ValueError("not an ESRIJSON featureSet (no features array)")
    fields = doc.get("fields") or []
    fdefs = []                   # (name, esri type, alias)
    oid_field = doc.get("objectIdFieldName") or None
    for f in fields:
        if not isinstance(f, dict) or "name" not in f:
            continue
        ft = f.get("type", "esriFieldTypeString")
        fdefs.append((f["name"], ft, f.get("alias")))
        if ft == "esriFieldTypeOID" and not oid_field:
            oid_field = f["name"]
    if not fdefs:
        # infer from the first feature's attributes
        for ft in feats:
            attrs = (ft or {}).get("attributes")
            if isinstance(attrs, dict):
                for k, v in attrs.items():
                    if isinstance(v, bool) or isinstance(v, str):
                        t = "esriFieldTypeString"
                    elif isinstance(v, int):
                        t = "esriFieldTypeBigInteger"
                    elif isinstance(v, float):
                        t = "esriFieldTypeDouble"
                    else:
                        t = "esriFieldTypeString"
                    fdefs.append((k, t, None))
                break

    cols: dict[str, list] = {n: [] for n, _t, _a in fdefs}
    wkts, wkbs, fids = [], [], []
    from ..core.wkt import loads_wkt
    from ..core.wkb import dumps as wkb_dumps

    for ft in feats:
        if not isinstance(ft, dict):
            continue
        attrs = ft.get("attributes")
        attrs = attrs if isinstance(attrs, dict) else {}
        for fname, ftype, _alias in fdefs:
            v = attrs.get(fname)
            if v is None:
                cols[fname].append(None)
            elif ftype == "esriFieldTypeDate":
                cols[fname].append(_format_date_ms(v))
            elif ftype == "esriFieldTypeDateOnly":
                cols[fname].append(str(v).replace("-", "/"))
            elif ftype in _TYPES:
                cols[fname].append(v)
            else:
                cols[fname].append(str(v))
        wkt = _geometry_wkt(ft.get("geometry"))
        wkts.append(wkt)
        if wkt is None or wkt.endswith(" EMPTY"):
            wkbs.append(None)
        else:
            try:
                # wkb model is 2-D: drop any Z/M ordinates and tags
                wkt2d = re.sub(r"\b(MULTIPOINT|POINT|LINESTRING|POLYGON|"
                               r"MULTILINESTRING|MULTIPOLYGON) (ZM|M|Z) ",
                               r"\1 ", wkt)
                wkt2d = re.sub(
                    r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
                    r" -?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
                    r"(?: -?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?){1,2}",
                    r"\1", wkt2d)
                wkbs.append(wkb_dumps(loads_wkt(wkt2d)))
            except (ValueError, KeyError):
                wkbs.append(None)
        fid = attrs.get(oid_field) if oid_field else None
        fids.append(fid if isinstance(fid, int) else None)

    arrays, schema_fields = [], []
    schema_fields.append(pa.field("fid", pa.int64()))
    arrays.append(pa.array(fids, pa.int64()))
    for fname, ftype, alias in fdefs:
        at = _TYPES.get(ftype, pa.string())
        f = pa.field(fname, at,
                     metadata={"alias": alias} if alias else None)
        schema_fields.append(f)
        arrays.append(pa.array(cols[fname], at))
    schema_fields.append(pa.field("wkt", pa.string()))
    arrays.append(pa.array(wkts, pa.string()))
    schema_fields.append(pa.field("wkb", pa.binary()))
    arrays.append(pa.array(wkbs, pa.binary()))

    sr = doc.get("spatialReference")
    meta = {b"layer": name.encode()}
    if isinstance(sr, dict):
        wkid = sr.get("latestWkid") or sr.get("wkid")
        if isinstance(wkid, int):
            meta[b"crs"] = f"EPSG:{wkid}".encode()
    if b"crs" not in meta:
        # the reference defaults FeatureService responses without an
        # explicit SR to WGS84 when coordinates look geographic
        meta[b"crs"] = b"EPSG:4326"
    return pa.Table.from_arrays(arrays,
                                schema=pa.schema(schema_fields,
                                                 metadata=meta))
