"""INTERLIS 2 (.xtf) transfer reader — both the 2.3 TRANSFER/
DATASECTION layout (dotted object tags, COORD/POLYLINE/SURFACE
geometry) and the 2.4 ``ili:transfer`` layout (namespaced bare tags,
``geom:coord``/``geom:polyline``/``geom:surface``, ``ili:tid`` /
``ili:ref`` attributes).

Layers are the distinct object tags directly under each basket; with
an IlisMeta ``.imd`` model, nested structure classes the model
declares (e.g. LINEATTR payloads) become layers too — mirroring the
reference driver's behavior where opening with a model shows the
declared classes (ogr/ogrsf_frmts/ili/ogrili2layer.cpp +
iom-compatible reader).  Attribute elements flatten to strings,
``REF``/``ili:ref`` attributes to their target id, geometry elements
to WKB.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = ["read_ili2"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _attr(el, name):
    for k, v in el.attrib.items():
        if _local(k).lower() == name:
            return v
    return None


def _coords_of(el):
    """COORD/geom:coord element → (x, y)."""
    x = y = None
    for ch in el:
        nm = _local(ch.tag).lower()
        if nm == "c1":
            x = float(ch.text)
        elif nm == "c2":
            y = float(ch.text)
    return (x, y) if x is not None and y is not None else None


def _polyline_pts(el):
    pts = []
    for ch in el.iter():
        if _local(ch.tag).lower() == "coord":
            xy = _coords_of(ch)
            if xy:
                pts.append(xy)
    return pts


def _geometry_of(el):
    """An attribute element wrapping COORD / POLYLINE / SURFACE (2.3)
    or geom:* (2.4) → Geometry | None."""
    from ..core import wkb as W
    for ch in el.iter():
        nm = _local(ch.tag).lower()
        if nm == "surface":
            rings = []
            for b in ch.iter():
                if _local(b.tag).lower() == "boundary":
                    for pl in b:
                        if _local(pl.tag).lower() == "polyline":
                            pts = _polyline_pts(pl)
                            if len(pts) >= 3:
                                if pts[0] != pts[-1]:
                                    pts.append(pts[0])
                                rings.append(pts)
            if rings:
                return W.polygon(rings[0], holes=rings[1:])
            return None
        if nm == "polyline":
            pts = _polyline_pts(ch)
            return W.linestring(pts) if len(pts) >= 2 else None
        if nm == "coord":
            xy = _coords_of(ch)
            return W.point(*xy) if xy else None
    return None


def _flatten(obj):
    """Object element → (fields dict, geometry)."""
    fields = {}
    geom = None
    tid = _attr(obj, "tid")
    if tid is not None:
        fields["TID"] = tid
    for ch in obj:
        name = _local(ch.tag)
        ref = _attr(ch, "ref")
        if ref is not None:
            fields[name] = ref
            continue
        kids = list(ch)
        if kids and _local(kids[0].tag).lower() in ("coord", "polyline",
                                                    "surface",
                                                    "multisurface"):
            g = _geometry_of(ch)
            if g is not None:
                geom = g
                continue
        if not kids:
            fields[name] = (ch.text or "").strip() or None
        else:
            # nested structure: single text grandchild or skipped
            texts = [(gc.text or "").strip() for gc in ch.iter()
                     if not list(gc) and gc.text and gc.text.strip()]
            if len(texts) == 1:
                fields[name] = texts[0]
    return fields, geom


def read_ili2(xtf_path: str, imd_path: str | None = None
              ) -> dict[str, pa.Table]:
    """→ {layer name: table}.  2.3 layer names are the dotted class
    tags; 2.4 layers the bare element names."""
    from ..core import wkb as W

    root = ET.parse(xtf_path).getroot()
    datasection = None
    for el in root:
        if _local(el.tag).lower() == "datasection":
            datasection = el
    if datasection is None:
        raise ValueError("XTF has no DATASECTION")

    imd_classes = set()
    if imd_path:
        from .ili import read_imd
        imd_classes = set(read_imd(imd_path)["classes"])

    feats: dict[str, list] = {}
    for basket in datasection:
        for obj in basket:
            lname = _local(obj.tag)
            feats.setdefault(lname, []).append(_flatten(obj))
            # nested declared classes (LINEATTR structures)
            if imd_classes:
                for sub in obj.iter():
                    nm = _local(sub.tag)
                    if sub is not obj and nm in imd_classes:
                        feats.setdefault(nm, []).append(_flatten(sub))

    out: dict[str, pa.Table] = {}
    for lname, rows in feats.items():
        names: list[str] = []
        for fields, _g in rows:
            for k in fields:
                if k not in names:
                    names.append(k)
        cols = {n: [f.get(n) for f, _g in rows] for n in names}
        cols["wkb"] = [W.dumps(g) if g is not None else None
                       for _f, g in rows]
        out[lname] = pa.Table.from_pydict(
            cols, schema=pa.schema([(n, pa.string()) for n in names]
                                   + [("wkb", pa.binary())]))
    return out
