"""LV BAG 2.0 (Dutch Kadaster Basisregistratie Adressen en Gebouwen)
extract reader.

Independent implementation of the BAG extract-deelbestand-lvc XML
layout with the reference driver's fixed per-objecttype schemas
(ogr/ogrsf_frmts/lvbag/ogrlvbaglayer.cpp:190-330): Pand (pnd),
Nummeraanduiding (num), Ligplaats (lig), Standplaats (sta),
Openbareruimte (opr), Verblijfsobject (vbo), Woonplaats (wpl) — each
with its specific fields followed by the shared identifier
(``identificatie`` = domein "." value), document (status,
geconstateerd J/N → 1/0, documentdatum, documentnummer) and
Historie voorkomen blocks (voorkomenidentificatie, geldigheid dates,
registration timestamps incl. the BeschikbaarLV pair).  Dates are
rendered in OGR's field-string form (``YYYY/MM/DD`` and
``YYYY/MM/DD HH:MM:SS[.mmm]``).  Geometry comes from the embedded
GML (polygon / point / multisurface) with srsName EPSG:28992
(Amersfoort / RD New).  Zip archives read every member XML of the
same object type into one layer.
"""

from __future__ import annotations

import io
import os
import re
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

__all__ = ["read_lvbag"]

_LAYER_NAMES = {"pnd": "Pand", "num": "Nummeraanduiding",
                "lig": "Ligplaats", "sta": "Standplaats",
                "opr": "Openbareruimte", "vbo": "Verblijfsobject",
                "wpl": "Woonplaats"}

_TYPE_TAGS = {v.lower(): k for k, v in _LAYER_NAMES.items()}

_DOC_FIELDS = ["status", "geconstateerd", "documentdatum",
               "documentnummer"]
_OCC_FIELDS = ["voorkomenidentificatie", "begingeldigheid",
               "eindgeldigheid", "tijdstipregistratie",
               "eindregistratie", "tijdstipinactief",
               "tijdstipregistratielv", "tijdstipeindregistratielv",
               "tijdstipinactieflv", "tijdstipnietbaglv"]

_SPECIFIC = {
    "pnd": ["oorspronkelijkbouwjaar"],
    "num": ["huisnummer", "huisletter", "huisnummertoevoeging",
            "postcode", "typeadresseerbaarobject", "openbareruimteref",
            "woonplaatsref"],
    "lig": ["hoofdadresnummeraanduidingref",
            "nevenadresnummeraanduidingref"],
    "sta": ["hoofdadresnummeraanduidingref",
            "nevenadresnummeraanduidingref"],
    "opr": ["naam", "type", "woonplaatsref", "verkortenaam"],
    "vbo": ["gebruiksdoel", "oppervlakte",
            "hoofdadresnummeraanduidingref",
            "nevenadresnummeraanduidingref", "pandref"],
    "wpl": ["naam"],
}

_INT_FIELDS = {"oorspronkelijkbouwjaar", "huisnummer", "oppervlakte",
               "geconstateerd", "voorkomenidentificatie"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _fmt_date(v: str) -> str:
    return v.replace("-", "/")


def _fmt_datetime(v: str) -> str:
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
                 r"(?:\.(\d+))?", v)
    if not m:
        return v
    out = (f"{m.group(1)}/{m.group(2)}/{m.group(3)} "
           f"{m.group(4)}:{m.group(5)}:{m.group(6)}")
    if m.group(7) and int(m.group(7)):
        out += "." + m.group(7).rstrip("0").ljust(3, "0")[:3]
    return out


def _ref_value(el) -> str:
    dom = el.get("domein")
    txt = (el.text or "").strip()
    return f"{dom}.{txt}" if dom else txt


def _parse_object(obj_el, kind: str) -> dict:
    row: dict = {}
    neven: list[str] = []
    gebruiksdoel: list[str] = []
    pandrefs: list[str] = []
    geom = None

    def walk(el):
        nonlocal geom
        name = _local(el.tag).lower()
        if name == "geometrie":
            from .gml import parse_gml_geometry
            for sub in el.iter():
                nm = _local(sub.tag)
                if nm in ("Polygon", "Point", "MultiSurface",
                          "MultiPolygon", "Surface"):
                    g = parse_gml_geometry(sub)
                    if g is not None:
                        geom = g
                    return
            return
        if name == "heeftalshoofdadres":
            for sub in el.iter():
                if _local(sub.tag) == "NummeraanduidingRef":
                    row["hoofdadresnummeraanduidingref"] = _ref_value(sub)
            return
        if name == "heeftalsnevenadres":
            for sub in el.iter():
                if _local(sub.tag) == "NummeraanduidingRef":
                    neven.append(_ref_value(sub))
            return
        if name == "maaktdeeluitvan":
            for sub in el.iter():
                if _local(sub.tag) == "PandRef":
                    pandrefs.append(_ref_value(sub))
            return
        if name == "ligtaan":
            for sub in el.iter():
                if _local(sub.tag) == "OpenbareRuimteRef":
                    row["openbareruimteref"] = _ref_value(sub)
            return
        if name == "ligtin":
            for sub in el.iter():
                if _local(sub.tag) == "WoonplaatsRef":
                    row["woonplaatsref"] = _ref_value(sub)
            return
        if name == "gebruiksdoel" and el.text:
            gebruiksdoel.append(el.text.strip())
            return
        if len(el) == 0:
            txt = (el.text or "").strip()
            if not txt and not el.attrib:
                return
            key = name
            if key == "identificatie":
                row[key] = _ref_value(el)
            elif key == "geconstateerd":
                row[key] = 1 if txt.upper() in ("J", "Y", "TRUE") else 0
            elif key in ("documentdatum", "begingeldigheid",
                         "eindgeldigheid"):
                row[key] = _fmt_date(txt)
            elif key.startswith("tijdstip") or key == "eindregistratie":
                row[key] = _fmt_datetime(txt)
            elif key in _INT_FIELDS:
                try:
                    row[key] = int(txt)
                except ValueError:
                    row[key] = None
            else:
                row[key] = txt
        else:
            for sub in el:
                walk(sub)

    for sub in obj_el:
        walk(sub)
    if neven:
        row["nevenadresnummeraanduidingref"] = ",".join(neven)
    if gebruiksdoel:
        row["gebruiksdoel"] = ",".join(gebruiksdoel)
    if pandrefs:
        row["pandref"] = ",".join(pandrefs)
    row["_geom"] = geom
    return row


def _objects_of_xml(data: bytes):
    """yields (kind, object element)."""
    root = ET.fromstring(data)
    for el in root.iter():
        kind = _TYPE_TAGS.get(_local(el.tag).lower())
        if kind is not None:
            yield kind, el


def read_lvbag(path: str) -> dict[str, pa.Table]:
    """→ {layer name: table}; a zip archive merges all member XMLs
    (one layer per object type present)."""
    from ..core import wkb as W

    docs: list[bytes] = []
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                if name.lower().endswith(".xml"):
                    docs.append(z.read(name))
    else:
        docs.append(open(path, "rb").read())

    rows_by_kind: dict[str, list[dict]] = {}
    for data in docs:
        for kind, el in _objects_of_xml(data):
            rows_by_kind.setdefault(kind, []).append(
                _parse_object(el, kind))

    out: dict[str, pa.Table] = {}
    for kind, rows in rows_by_kind.items():
        fields = _SPECIFIC[kind] + ["identificatie"] + _DOC_FIELDS \
            + _OCC_FIELDS
        cols: dict[str, list] = {f: [] for f in fields}
        cols["wkb"] = []
        for r in rows:
            for f in fields:
                cols[f].append(r.get(f))
            g = r.get("_geom")
            cols["wkb"].append(W.dumps(g) if g is not None else None)
        schema = pa.schema(
            [(f, pa.int64() if f in _INT_FIELDS else pa.string())
             for f in fields] + [("wkb", pa.binary())],
            metadata={b"crs": b"EPSG:28992"})
        out[_LAYER_NAMES[kind]] = pa.Table.from_pydict(cols,
                                                       schema=schema)
    return out
