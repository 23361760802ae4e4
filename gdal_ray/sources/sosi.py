"""SOSI (Norwegian Samordnet Opplegg for Stedfestet Informasjon)
vector reader.

Independent implementation of the SOSI 4.x text format (the reference
wraps the FYBA library, ogr/ogrsf_frmts/sosi/): dot-level structured
records (``.HODE`` header, ``.KURVE``/``.PUNKT``/``.FLATE``/``.TEKST``
features), ``..NØ``/``..NØH`` coordinate blocks scaled by
``...ENHET`` around ``...ORIGO-NØ`` (northing first on disk, x=east
out), ``..REF`` curve references assembling FLATE rings (negative id
= reversed curve, parenthesised groups = interior rings), TEGNSETT
charsets (ISO8859-1/10, UTF-8, DOSN8).

Layer organization matches the reference datasource's reverse-fill
order (ogrsosidatasource.cpp:533-600): text, points, lines, polygons —
only non-empty classes present.  Field names go through the public
SOSI→OGR name table (ogrsosidatatypes.h); the subset covering common
cadastre/reindeer-husbandry data is embedded, unknown names pass
through unchanged.  A duplicated attribute keeps its first value
unless ``append_fields`` maps the name to a join character (the
driver's appendFieldsMap open option: ``YD,YG`` with ``,``).
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["read_sosi"]

# subset of ogrsosidatatypes.h addSimpleType entries (full table is
# ~800 rows; unknown names pass through as-is)
_NAME_MAP = {
    "OBJTYPE": "objekttypenavn",
    "OPPHAV": "opphav",
    "OPPDATERINGSDATO": "oppdateringsdato",
    "VERIFISERINGSDATO": "verifiseringsdato",
    "FØRSTEDATAFANGSTDATO": "førsteDatafangstdato",
    "BEITEBRUKERID": "reinbeitebrukerID",
    "LTEMA": "linjetema",
    "FTEMA": "flatetema",
    "PTEMA": "punkttema",
    "KVALITET": "kvalitet",
    "KOMM": "kommunenummer",
    "NAVN": "navn",
    "STRENG": "tekststreng",
}

_CHARSETS = {"ISO8859-1": "latin-1", "ISO8859-10": "iso8859-10",
             "UTF-8": "utf-8", "ANSI": "cp1252", "DOSN8": "cp865",
             "ND7": "latin-1", "DECN7": "latin-1"}


def _decode_text(raw: bytes) -> str:
    m = re.search(rb"\.\.TEGNSETT\s+(\S+)", raw[:4096])
    enc = _CHARSETS.get(m.group(1).decode("ascii", "replace").upper()
                        if m else "", "latin-1")
    return raw.decode(enc, "replace")


class _Rec:
    __slots__ = ("kind", "serial", "attrs", "coords", "refs")

    def __init__(self, kind, serial):
        self.kind = kind
        self.serial = serial
        self.attrs: list[tuple[str, str]] = []
        self.coords: list[tuple[float, float]] = []
        self.refs: list[list[int]] = []      # [exterior, hole1, ...]


def _parse(text: str):
    head = {"origo": (0.0, 0.0), "enhet": 1.0, "koordsys": None}
    recs: list[_Rec] = []
    cur: _Rec | None = None
    in_coords = False
    in_ref = False

    for raw_line in text.splitlines():
        line = raw_line.rstrip()
        if not line or line.startswith("!"):
            continue
        if line.startswith("."):
            dots = len(line) - len(line.lstrip("."))
            body = line[dots:]
            parts = body.split(None, 1)
            key = parts[0] if parts else ""
            val = parts[1] if len(parts) > 1 else ""
            in_coords = False
            in_ref = False
            if dots == 1:
                kind = key.upper()
                if kind == "SLUTT":
                    break
                serial = val.rstrip(":").strip()
                cur = _Rec(kind, serial)
                if kind != "HODE":
                    recs.append(cur)
            elif cur is None:
                continue
            elif cur.kind == "HODE":
                k = key.upper()
                if k.startswith("ORIGO"):
                    nums = [float(v) for v in val.split()[:2]]
                    if len(nums) == 2:
                        head["origo"] = (nums[0], nums[1])
                elif k == "ENHET":
                    head["enhet"] = float(val)
                elif k == "KOORDSYS":
                    head["koordsys"] = val.split()[0]
            else:
                k = key.upper()
                if k in ("NØ", "NØH", "NO", "NOH"):
                    in_coords = True
                elif k == "REF":
                    in_ref = True
                    _add_refs(cur, val)
                else:
                    v = val.strip()
                    if v.startswith('"') and v.endswith('"') and len(v) > 1:
                        v = v[1:-1]
                    cur.attrs.append((key, v))
        elif cur is not None and in_coords:
            nums = line.split("...")[0].split()
            if len(nums) >= 2:
                try:
                    n, e = float(nums[0]), float(nums[1])
                except ValueError:
                    continue
                cur.coords.append((n, e))
        elif cur is not None and in_ref:
            _add_refs(cur, line)
    return head, recs


def _add_refs(rec: _Rec, text: str):
    if not rec.refs:
        rec.refs.append([])
    target = rec.refs[-1]
    for tok in re.findall(r"[():]|-?\d+", text):
        if tok == "(":
            rec.refs.append([])
            target = rec.refs[-1]
        elif tok == ")":
            target = rec.refs[0]
        elif tok == ":":
            continue
        else:
            target.append(int(tok))


def read_sosi(path: str, append_fields: dict[str, str] | None = None
              ) -> dict[str, pa.Table]:
    """→ {layer: table} in the reference's layer order (text, points,
    lines, polygons; empty classes omitted).  ``append_fields`` maps
    ORIGINAL SOSI attribute names to a join character for repeated
    values (appendFieldsMap)."""
    raw = open(path, "rb").read()
    head, recs = _parse(_decode_text(raw))
    oy, ox = head["origo"]
    unit = head["enhet"]
    append_fields = append_fields or {}

    from ..core import wkb as W

    def to_xy(coords):
        # SOSI stores northing first; x = east, y = north
        return [(ox + e * unit, oy + n * unit) for n, e in coords]

    curves = {r.serial: r for r in recs if r.kind == "KURVE"}

    classes = {"TEKST": [], "PUNKT": [], "KURVE": [], "FLATE": []}
    for r in recs:
        if r.kind in classes:
            classes[r.kind].append(r)

    def fields_of(rs):
        order = []
        for r in rs:
            for k, _v in r.attrs:
                name = _NAME_MAP.get(k.upper(), k)
                if name not in order:
                    order.append(name)
        return order

    def attr_row(r, order):
        row = {}
        for k, v in r.attrs:
            name = _NAME_MAP.get(k.upper(), k)
            if name not in row:
                row[name] = v
            else:
                join = append_fields.get(k.upper()) or \
                    append_fields.get(k)
                if join is not None:
                    row[name] = row[name] + join + v
        return [row.get(n) for n in order]

    def flate_ring(ref_ids):
        pts: list = []
        for rid in ref_ids:
            c = curves.get(str(abs(rid)))
            if c is None:
                continue
            seg = to_xy(c.coords)
            if rid < 0:
                seg = seg[::-1]
            if pts and seg and pts[-1] == seg[0]:
                seg = seg[1:]
            pts.extend(seg)
        if pts and pts[0] != pts[-1]:
            pts.append(pts[0])
        return pts

    out: dict[str, pa.Table] = {}
    for kind, lname in (("TEKST", "text"), ("PUNKT", "points"),
                        ("KURVE", "lines"), ("FLATE", "polygons")):
        rs = classes[kind]
        if not rs:
            continue
        order = fields_of(rs)
        cols = {"serial": [], **{n: [] for n in order}, "wkb": []}
        for r in rs:
            cols["serial"].append(r.serial)
            for n, v in zip(order, attr_row(r, order)):
                cols[n].append(v)
            g = None
            if kind == "FLATE":
                rings = [flate_ring(refs) for refs in r.refs if refs]
                rings = [rg for rg in rings if len(rg) >= 4]
                if rings:
                    g = W.polygon(rings[0], holes=rings[1:])
            else:
                xy = to_xy(r.coords)
                if kind == "KURVE" and len(xy) >= 2:
                    g = W.linestring(xy)
                elif xy:
                    g = W.point(*xy[0])
            cols["wkb"].append(W.dumps(g) if g is not None else None)
        schema = pa.schema(
            [("serial", pa.string())]
            + [(n, pa.string()) for n in order]
            + [("wkb", pa.binary())],
            metadata={b"koordsys": (head["koordsys"] or "").encode()})
        out[lname] = pa.Table.from_pydict(cols, schema=schema)
    return out
