"""IHO S-101 ENC (next-generation Electronic Navigational Chart) reader.

S-101 datasets are ISO/IEC 8211 files using the S-100 Edition 5.2
Part 10a encoding: a Dataset General Information record (DSID/DSSI +
ATCS/ITCS/FTCS/IACS/FACS/ARCS code tables), one CRS record
(CSID/CRSH/CSAX/VDAT), then vector records (information types IRID,
points PRID, multipoints MRID, curves CRID, composite curves CCID,
surfaces SRID) and feature-type records (FRID/FOID/ATTR/INAS/SPAS/
FASC/MASK).

Reference driver: ogr/ogrsf_frmts/s101/ (ogrs101reader.cpp,
ogrs101readerattributes.cpp, ogrs101reader{point,multipoint,curve,
compositecurve,surface,featuretype}.cpp, ogrs101readercrs.cpp,
ogrs101readerdatasetgeneralinformationrecord.cpp); layer/field
naming per ogrs101readerconstants.h. Semantics re-derived, not
ported:

- one OGR-style layer per (feature-type code, geometry primitive,
  CRS); spatial primitives are also exposed as their own layers
  (Point2D / Point3D_<datum> / MultiPoint2D / ... / Curve /
  CompositeCurve / Surface) plus a geometry-less informationType
  layer;
- attributes are flattened from the ATTR/INAS/FASC (NATC, ATIX,
  PAIX, ATIN, ATVL) instance trees to dotted field names with [n]
  indices on multi-instance parents (ogrs101readerattributes.cpp
  BuildFieldName), field types value-sniffed per field and promoted
  to lists when an attribute repeats inside one record;
- coordinates are integers scaled by the DSSI CMFX/CMFY/CMFZ
  multiplication factors (plus DCOX/DCOY/DCOZ shifts); 3-D records
  carry a VCID pointing at a vertical CRS built from the CRSH/VDAT
  pair ("WGS 84 + <name> depth");
- composite curves chain curve parts with ORNT forward/reverse and
  endpoint matching; surfaces assemble RIAS exterior/interior rings;
  feature types promote multi point-associations to MultiPoint and
  multi multipoint-associations to GeometryCollection, exactly like
  the reference's layer-key logic.

``read_s101(path)`` returns an ``S101Dataset`` (metadata dict +
ordered layers of GeoJSON-style feature dicts); ``read_s101_table``
converts one layer to a pyarrow Table with WKB geometry for the Ray
vector pipelines.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["read_s101", "read_s101_table", "S101Dataset", "S101Error"]

FT = 0x1E
UT = 0x1F

# record names (RCNM)
RCNM_DSID = 10
RCNM_CRS = 15
RCNM_INFO = 150
RCNM_POINT = 110
RCNM_MULTIPOINT = 115
RCNM_CURVE = 120
RCNM_COMPOSITE_CURVE = 125
RCNM_SURFACE = 130
RCNM_FEATURE = 100
NO_GEOM = -1

HORIZONTAL_CRS_ID = 1

INSTRUCTION_INSERT = 1
ORNT_FORWARD = 1
ORNT_REVERSE = 2
ORNT_NULL = 255


class S101Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# S-100 Part 10a ISO 8211 typed decoding
# ---------------------------------------------------------------------------

def _parse_format_list(fmt: str):
    """Split one level of a DDF format-control string into tokens,
    keeping a trailing parenthesised group intact."""
    out, depth, part = [], 0, ""
    for ch in fmt:
        if ch == "," and depth == 0:
            out.append(part)
            part = ""
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        part += ch
    if part:
        out.append(part)
    return out


def _expand_formats(fmt: str):
    """'(b11,b14,7A,A(8),3A,(b11))' -> (head_formats, tail_formats).

    Each format is a (kind, width) pair: kind in {'A','R','I','buint',
    'bint','bfloat'}; width None = UT/FT-delimited text. A trailing
    parenthesised group is the repeating tail of a concatenated field.
    """
    fmt = fmt.strip()
    if fmt.startswith("(") and fmt.endswith(")"):
        fmt = fmt[1:-1]
    head: list = []
    tail: list | None = None
    for tok in _parse_format_list(fmt):
        tok = tok.strip()
        if tok.startswith("(") and tok.endswith(")"):
            tail = _expand_formats(tok)[0]
            continue
        rep = 1
        i = 0
        while i < len(tok) and tok[i].isdigit():
            i += 1
        if i:
            rep = int(tok[:i])
            tok = tok[i:]
        if not tok:
            continue
        t = tok[0]
        if t == "b":
            cls, width = int(tok[1]), int(tok[2])
            kind = {1: "buint", 2: "bint", 4: "bfloat"}.get(cls, "buint")
            head.extend([(kind, width)] * rep)
        else:
            width = None
            if "(" in tok:
                w = tok[tok.index("(") + 1:tok.rindex(")")]
                if w.isdigit():
                    width = int(w)
            head.extend([(t, width)] * rep)
    return head, tail


@dataclass
class _FieldDefn:
    tag: str
    head_names: list
    head_fmts: list
    tail_names: list
    tail_fmts: list
    all_repeat: bool   # leading '*': whole field is one repeating group


def _parse_ddr(fields):
    defs = {}
    for tag, data in fields:
        parts = data.split(bytes([UT]))
        if len(parts) < 3:
            defs[tag] = None
            continue
        descr = parts[1].decode("utf-8", "replace")
        fmts = parts[2].decode("ascii", "replace")
        all_repeat = False
        # concatenated fields use 'head\\*tail'; array fields lead with '*'
        if "\\\\*" in descr:
            head_descr, tail_descr = descr.split("\\\\*", 1)
        elif descr.startswith("*"):
            head_descr, tail_descr = "", descr[1:]
            all_repeat = True
        else:
            head_descr, tail_descr = descr, ""
        head_names = [n for n in head_descr.split("!") if n]
        tail_names = [n for n in tail_descr.split("!") if n]
        head_fmts, tail_fmts = _expand_formats(fmts)
        if all_repeat:
            tail_fmts = head_fmts
            head_fmts = []
        if tail_names and tail_fmts is None:
            # repeating names but a flat format list: the whole format
            # list cycles over head+tail
            tail_fmts = head_fmts[len(head_names):] or head_fmts
        defs[tag] = _FieldDefn(tag, head_names, head_fmts,
                               tail_names, tail_fmts or [], all_repeat)
    return defs


def _decode_value(data: bytes, pos: int, kind, width):
    n = len(data)
    if kind in ("buint", "bint"):
        raw = data[pos:pos + width]
        pos += width
        v = int.from_bytes(raw, "little", signed=(kind == "bint"))
        # the reference's GetIntSubfield returns a C int: 4-byte
        # unsigned values wrap (0xFFFFFFFF = unset SMIN/SMAX -> -1)
        if kind == "buint" and width == 4 and v >= 1 << 31:
            v -= 1 << 32
        return v, pos
    if kind == "bfloat":
        raw = data[pos:pos + width]
        pos += width
        if width == 8:
            return struct.unpack("<d", raw.ljust(8, b"\0"))[0], pos
        return struct.unpack("<f", raw.ljust(4, b"\0"))[0], pos
    if width is not None:
        raw = data[pos:pos + width]
        pos += width
    else:
        end = pos
        while end < n and data[end] not in (FT, UT):
            end += 1
        raw = data[pos:end]
        pos = min(end + 1, n)
    s = raw.decode("utf-8", "replace")
    if kind in ("R", "I", "S", "E"):
        s = s.strip()
    return s, pos


@dataclass
class _Field:
    """One field instance: fixed head subfields + repeating groups."""
    tag: str
    head: dict
    reps: list

    def get(self, name, idx=0, default=0):
        if name in self.head and idx == 0:
            return self.head[name]
        if self.reps and name in (self.reps[0] if self.reps else {}):
            if idx < len(self.reps):
                return self.reps[idx].get(name, default)
        # repeated access to a head subfield list (e.g. DSTC)
        if idx < len(self.reps) and name in self.reps[idx]:
            return self.reps[idx][name]
        return default

    @property
    def repeat_count(self):
        return len(self.reps) if self.reps else 1


def _decode_field(defn: _FieldDefn, data: bytes) -> _Field:
    head = {}
    pos = 0
    for name, (kind, width) in zip(defn.head_names, defn.head_fmts):
        v, pos = _decode_value(data, pos, kind, width)
        head[name] = v
    reps = []
    if defn.tail_names:
        n = len(data)
        while pos < n:
            g = {}
            for name, (kind, width) in zip(defn.tail_names, defn.tail_fmts):
                v, pos = _decode_value(data, pos, kind, width)
                g[name] = v
            reps.append(g)
            if not defn.tail_fmts:
                break
    return _Field(defn.tag, head, reps)


@dataclass
class _Record:
    fields: list  # list[_Field]

    def find(self, tag, nth=0):
        k = 0
        for f in self.fields:
            if f.tag == tag:
                if k == nth:
                    return f
                k += 1
        return None

    def find_all(self, tag):
        return [f for f in self.fields if f.tag == tag]

    @property
    def lead_tag(self):
        return self.fields[0].tag if self.fields else None


def _read_records(buf: bytes):
    """Parse the 8211 module: returns (field_defs, [records])."""
    off, n = 0, len(buf)
    defs = None
    records = []
    while off + 24 <= n:
        try:
            rec_len = int(buf[off:off + 5])
            base = int(buf[off + 12:off + 17])
            size_len = int(chr(buf[off + 20]))
            size_pos = int(chr(buf[off + 21]))
            size_tag = int(chr(buf[off + 23]))
        except ValueError:
            break
        if rec_len <= 0 or off + rec_len > n + 1:
            break
        rec = buf[off:off + rec_len]
        entry_sz = size_tag + size_len + size_pos
        dpos = 24
        entries = []
        while dpos + entry_sz <= base - 1 and rec[dpos] != FT:
            tag = rec[dpos:dpos + size_tag].decode("ascii", "replace")
            ln = int(rec[dpos + size_tag:dpos + size_tag + size_len])
            ps = int(rec[dpos + size_tag + size_len:dpos + entry_sz])
            entries.append((tag, ln, ps))
            dpos += entry_sz
        raw_fields = []
        for tag, ln, ps in entries:
            data = rec[base + ps:base + ps + ln]
            if data.endswith(bytes([FT])):
                data = data[:-1]
            raw_fields.append((tag, data))
        if defs is None:
            defs = _parse_ddr(raw_fields)
        else:
            flds = []
            for tag, data in raw_fields:
                d = defs.get(tag)
                if d is None:
                    flds.append(_Field(tag, {"_raw": data}, []))
                else:
                    flds.append(_decode_field(d, data))
            records.append(_Record(flds))
        off += rec_len
    return defs, records


# ---------------------------------------------------------------------------
# attribute flattening (ogrs101readerattributes.cpp semantics)
# ---------------------------------------------------------------------------

@dataclass
class _AttrDef:
    reversed_path: list = field(default_factory=list)  # [(natc, rep), ...]
    val: str = ""
    is_parent: bool = False
    ifield: int = 0
    multiple_fields: bool = False


def _ingest_attr_groups(groups, ifield, multiple_fields, out, warn):
    """Ingest the (NATC, ATIX, PAIX, ATIN, ATVL) groups of one
    ATTR/INAS/FASC field instance."""
    base = len(out)
    occurrence = {}
    for g in groups:
        occurrence[(g.get("NATC", 0), g.get("PAIX", 0))] = \
            occurrence.get((g.get("NATC", 0), g.get("PAIX", 0)), 0) + 1
    for i, g in enumerate(groups):
        if g.get("ATIN", 1) != INSTRUCTION_INSERT:
            warn(f"attribute idx={i}: wrong value {g.get('ATIN')} for "
                 "ATIN subfield")
            out.append(_AttrDef())
            continue
        natc = g.get("NATC", 0)
        atix = g.get("ATIX", 1)
        paix = g.get("PAIX", 0)
        if not (0 <= paix <= i):
            warn(f"attribute idx={i}: wrong value {paix} for PAIX")
            out.append(_AttrDef())
            continue
        multi = occurrence[(natc, paix)] > 1
        path = [(natc, atix if multi else 0)]
        if paix > 0:
            parent = out[base + paix - 1]
            parent.is_parent = True
            path.extend(parent.reversed_path)
        val = g.get("ATVL", "")
        out.append(_AttrDef(path, val if isinstance(val, str) else str(val),
                            False, ifield, multiple_fields))


def _ingest_attributes(record: _Record, attr_tag: str, warn):
    """All attribute defs from all instances of attr_tag in a record."""
    out: list[_AttrDef] = []
    flds = record.find_all(attr_tag)
    multi = len(flds) > 1
    for ifield, f in enumerate(flds):
        if attr_tag == "ATTR":
            _ingest_attr_groups(f.reps, ifield, multi, out, warn)
        else:
            # INAS/FASC: fixed head then repeating attribute groups
            _ingest_attr_groups(f.reps, ifield, multi, out, warn)
    for d in out:
        if not d.is_parent and d.reversed_path:
            # reset leaf repetition so leaf multiplicity becomes a list
            d.reversed_path[0] = (d.reversed_path[0][0], 0)
    return out


def _build_field_name(reversed_path, attr_tag, ifield, multiple_fields,
                      id_tag, attr_codes):
    name = ""
    multi = multiple_fields
    for code, rep in reversed(reversed_path):
        if name:
            name += "."
        name += attr_codes.get(code, f"code_{code}")
        if multi and attr_tag == "ATTR":
            name += f"[{ifield + 1}]"
            multi = False
        if rep > 0:
            name += f"[{rep}]"
    if attr_tag != "ATTR":
        prefix = ""
        if id_tag == "IRID":
            prefix = "association"
        elif id_tag == "FRID":
            prefix = "infoAssociation" if attr_tag == "INAS" \
                else "featureAssociation"
        if prefix:
            if multi:
                prefix += f"[{ifield + 1}]"
            prefix += "_"
        name = prefix + name
    return name


def _sniff_type(val: str):
    """CPLGetValueType equivalent: 'int' | 'real' | 'str'."""
    s = val.strip()
    if not s:
        return "str"
    body = s[1:] if s[0] in "+-" else s
    if body.isdigit():
        return "int"
    try:
        float(s)
        return "real"
    except ValueError:
        return "str"


_TYPE_RANK = {"int": 0, "real": 1, "str": 2}


def _promote(cur, new):
    if cur is None:
        return new
    return cur if _TYPE_RANK[cur] >= _TYPE_RANK[new] else new


def _convert(val: str, typ: str, is_list: bool):
    if typ == "int":
        try:
            v = int(val)
        except ValueError:
            v = None
    elif typ == "real":
        try:
            v = float(val)
        except ValueError:
            v = None
    else:
        v = val
    return v


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------

@dataclass
class S101Layer:
    name: str
    geom_type: str          # 'None','Point','Point25D','MultiPoint',...
    srs_name: str | None
    srs_authority_code: str | None
    features: list          # [{'id':..,'geometry':..,'properties':..}]
    field_order: list = field(default_factory=list)


@dataclass
class S101Dataset:
    metadata: dict
    layers: dict            # name -> S101Layer (insertion-ordered)
    warnings: list

    def layer_names(self):
        return list(self.layers)


class _Reader:
    def __init__(self, buf: bytes, strict=False):
        self.strict = strict
        self.warnings: list[str] = []
        defs, records = _read_records(buf)
        if defs is None or "DSID" not in defs:
            raise S101Error("not an S-101 ISO 8211 file (no DSID field)")
        self.records = records
        self.metadata: dict = {}
        self.attr_codes: dict = {}
        self.info_type_codes: dict = {}
        self.feature_type_codes: dict = {}
        self.info_assoc_codes: dict = {}
        self.feat_assoc_codes: dict = {}
        self.assoc_role_codes: dict = {}
        self.xshift = self.yshift = self.zshift = 0.0
        self.xscale = self.yscale = self.zscale = 1
        self.srs: dict[int, dict] = {}
        # RCID-indexed record maps
        self.idx: dict[str, dict[int, _Record]] = {
            t: {} for t in ("IRID", "PRID", "MRID", "CRID", "CCID",
                            "SRID", "FRID")}

    def warn(self, msg):
        if self.strict:
            raise S101Error(msg)
        self.warnings.append(msg)

    # ----------------------------------------------------- general record
    def read_general_info(self, rec: _Record):
        dsid = rec.find("DSID")
        if dsid is None:
            raise S101Error("no DSID field in first record")
        keymap = [("ENSP", "ENCODING_SPECIFICATION"),
                  ("ENED", "ENCODING_SPECIFICATION_EDITION"),
                  ("PRSP", "PRODUCT_IDENTIFIER"),
                  ("PRED", "PRODUCT_EDITION"),
                  ("PROF", "APPLICATION_PROFILE"),
                  ("DSNM", "DATASET_IDENTIFIER"),
                  ("DSTL", "DATASET_TITLE"),
                  ("DSRD", "DATASET_REFERENCE_DATE"),
                  ("DSLG", "DATASET_LANGUAGE"),
                  ("DSAB", "DATASET_ABSTRACT"),
                  ("DSED", "DATASET_EDITION")]
        for sub, name in keymap:
            v = dsid.head.get(sub)
            if isinstance(v, str) and v:
                self.metadata[name] = v
        prsp = self.metadata.get("PRODUCT_IDENTIFIER", "")
        if not prsp.startswith("INT.IHO.S-101"):
            self.warn(f"not an S-101 product: identifier is '{prsp}'")
        dssi = rec.find("DSSI")
        if dssi is not None:
            h = dssi.head
            self.xshift = float(h.get("DCOX", 0.0))
            self.yshift = float(h.get("DCOY", 0.0))
            self.zshift = float(h.get("DCOZ", 0.0))
            self.xscale = int(h.get("CMFX", 1)) or 1
            self.yscale = int(h.get("CMFY", 1)) or 1
            self.zscale = int(h.get("CMFZ", 1)) or 1
            self.counts = {t: h.get(s, 0) for t, s in
                           (("IRID", "NOIR"), ("PRID", "NOPN"),
                            ("MRID", "NOMN"), ("CRID", "NOCN"),
                            ("CCID", "NOXN"), ("SRID", "NOSN"),
                            ("FRID", "NOFR"))}
        for tag, code_sub, num_sub, dest in (
                ("ATCS", "ATCD", "ANCD", self.attr_codes),
                ("ITCS", "ITCD", "ITNC", self.info_type_codes),
                ("FTCS", "FTCD", "FTNC", self.feature_type_codes),
                ("IACS", "IACD", "IANC", self.info_assoc_codes),
                ("FACS", "FACD", "FANC", self.feat_assoc_codes),
                ("ARCS", "ARCD", "ARNC", self.assoc_role_codes)):
            f = rec.find(tag)
            if f is None:
                continue
            for g in f.reps:
                code = g.get(num_sub)
                name = g.get(code_sub)
                if isinstance(code, int) and isinstance(name, str):
                    dest[code] = name

    # --------------------------------------------------------- CRS record
    def read_csid(self, rec: _Record):
        csid = rec.find("CSID")
        if csid is None:
            self.warn("CSID field not found")
            return False
        crshs = rec.find_all("CRSH")
        vdats = rec.find_all("VDAT")
        # pair each vertical CRSH (index >= 1) with the following VDAT
        # in document order; fixtures emit CRSH,CSAX,VDAT triplets
        horiz_name = "WGS 84"
        if crshs:
            h = crshs[0].head
            crsi = str(h.get("CRSI", "4326")).strip()
            self.srs[h.get("CRIX", 1) or 1] = {
                "name": horiz_name, "auth": crsi or "4326", "axes": 2}
        ivdat = 0
        for f in crshs[1:]:
            h = f.head
            crix = h.get("CRIX", 0)
            crnm = h.get("CRNM", "(null)") or "(null)"
            dtnm = "(null)"
            if ivdat < len(vdats):
                dtnm = vdats[ivdat].head.get("DTNM", "(null)") or "(null)"
                ivdat += 1
            self.srs[crix] = {
                "name": f"{horiz_name} + {crnm} depth",
                "auth": None, "axes": 3, "datum": dtnm}
        return True

    # ------------------------------------------------------------- ingest
    def ingest(self, records):
        for rec in records:
            tag = rec.lead_tag
            if tag not in self.idx:
                self.warn(f"unknown record field name {tag}")
                continue
            rcid = rec.fields[0].head.get("RCID", 0)
            if not isinstance(rcid, int) or rcid <= 0:
                self.warn(f"invalid RCID {rcid} for {tag}")
                continue
            if rcid in self.idx[tag]:
                self.warn(f"several {tag} records have RCID = {rcid}")
            self.idx[tag][rcid] = rec

    # ---------------------------------------------------------- geometry
    def _xy(self, group):
        x = group.get("XCOO", 0) / self.xscale + self.xshift
        y = group.get("YCOO", 0) / self.yscale + self.yshift
        return x, y

    def _z(self, group):
        return group.get("ZCOO", 0) / self.zscale + self.zshift

    def crs_id_for_point(self, rec, tag="PRID",
                         c3="C3IT", c2="C2IT"):
        f3 = rec.find(c3)
        if f3 is not None:
            vcid = f3.head.get("VCID", 0)
            if vcid == HORIZONTAL_CRS_ID or vcid not in self.srs:
                self.warn(f"{tag}: bad VCID {vcid} of {c3} field")
                return None
            return vcid
        if rec.find(c2) is not None:
            return HORIZONTAL_CRS_ID
        self.warn(f"{tag}: no {c2} or {c3} field found")
        return None

    def point_geometry(self, rec):
        f = rec.find("C3IT")
        is3d = f is not None
        if f is None:
            f = rec.find("C2IT")
        if f is None:
            return None
        x, y = self._xy(f.head)
        if not (abs(x) <= 180 and abs(y) <= 90):
            self.warn(f"wrong coordinate value: lon={x:f}, lat={y:f}")
        if is3d:
            return {"type": "Point", "coordinates": [x, y, self._z(f.head)]}
        return {"type": "Point", "coordinates": [x, y]}

    def multipoint_geometry(self, rec):
        f3 = rec.find_all("C3IL")
        is3d = bool(f3)
        flds = f3 or rec.find_all("C2IL")
        if not flds:
            return None
        coords = []
        for f in flds:
            groups = f.reps if f.reps else [f.head]
            for g in groups:
                x, y = self._xy(g)
                if not (abs(x) <= 180 and abs(y) <= 90):
                    self.warn(f"wrong coordinate value: lon={x:f}, "
                              f"lat={y:f}")
                coords.append([x, y, self._z(g)] if is3d else [x, y])
        return {"type": "MultiPoint", "coordinates": coords}

    def curve_geometry(self, rec):
        flds = rec.find_all("C2IL")
        if not flds:
            return None
        coords = []
        for f in flds:
            groups = f.reps if f.reps else [f.head]
            for g in groups:
                x, y = self._xy(g)
                if not (abs(x) <= 180 and abs(y) <= 90):
                    self.warn(f"wrong coordinate value: lon={x:f}, "
                              f"lat={y:f}")
                coords.append([x, y])
        return {"type": "LineString", "coordinates": coords}

    def composite_curve_geometry(self, rec, visited=None):
        if visited is None:
            visited = set()
        rcid = rec.fields[0].head.get("RCID", 0)
        if rcid in visited:
            self.warn(f"circular composite-curve dependency on RCID={rcid}")
            return None
        visited.add(rcid)
        coords: list = []
        for f in rec.find_all("CUCO"):
            for g in f.reps:
                rrnm = g.get("RRNM", 0)
                rrid = g.get("RRID", 0)
                reverse = g.get("ORNT", ORNT_FORWARD) == ORNT_REVERSE
                if rrnm == RCNM_CURVE:
                    sub = self.idx["CRID"].get(rrid)
                    part = self.curve_geometry(sub) if sub else None
                elif rrnm == RCNM_COMPOSITE_CURVE:
                    sub = self.idx["CCID"].get(rrid)
                    part = (self.composite_curve_geometry(sub, visited)
                            if sub else None)
                else:
                    self.warn(f"CUCO: invalid RRNM {rrnm}")
                    return None
                if part is None:
                    self.warn(f"CUCO: (RRNM={rrnm}, RRID={rrid}) does "
                              "not point to a valid curve")
                    return None
                pts = part["coordinates"]
                if reverse:
                    pts = pts[::-1]
                if not coords:
                    coords.extend(pts)
                elif coords[-1] == pts[0]:
                    coords.extend(pts[1:])
                else:
                    self.warn("curve extremity does not match composite "
                              "curve extremity")
                    return None
        return {"type": "LineString", "coordinates": coords}

    def surface_geometry(self, rec):
        if rec.find("RIAS") is None:
            self.warn("no RIAS field")
            return None
        exterior = None
        interiors = []
        for f in rec.find_all("RIAS"):
            for g in f.reps:
                rrnm = g.get("RRNM", 0)
                rrid = g.get("RRID", 0)
                if rrnm == RCNM_CURVE:
                    sub = self.idx["CRID"].get(rrid)
                    part = self.curve_geometry(sub) if sub else None
                elif rrnm == RCNM_COMPOSITE_CURVE:
                    sub = self.idx["CCID"].get(rrid)
                    part = (self.composite_curve_geometry(sub)
                            if sub else None)
                else:
                    self.warn(f"RIAS: invalid RRNM {rrnm}")
                    return None
                if part is None:
                    self.warn(f"RIAS: (RRNM={rrnm}, RRID={rrid}) does "
                              "not point to an existing record")
                    return None
                ring = part["coordinates"]
                if g.get("ORNT", ORNT_FORWARD) == ORNT_REVERSE:
                    ring = ring[::-1]
                if not ring or ring[0] != ring[-1]:
                    self.warn("ring is not closed")
                    return None
                usag = g.get("USAG", 0)
                if usag == 1:
                    if exterior is not None:
                        self.warn("several rings tagged as exterior")
                        return None
                    exterior = ring
                elif usag == 2:
                    interiors.append(ring)
                else:
                    self.warn(f"invalid USAG {usag}")
                    return None
        if exterior is None:
            self.warn("no ring tagged as exterior ring")
            return None
        return {"type": "Polygon",
                "coordinates": [exterior] + interiors}

    # --------------------------------------------------------- attributes
    def infer_fields(self, records, id_tag, attr_tag, fdefn):
        """Update fdefn (name -> {'type','is_list','order'}) from the
        ATTR/INAS/FASC content of the given records. Returns the max
        number of assoc-field instances seen (for [n] suffixing)."""
        found_assoc = False
        max_repeat = 1
        for rec in records:
            if attr_tag != "ATTR":
                flds = rec.find_all(attr_tag)
                max_repeat = max(max_repeat, len(flds))
                if flds:
                    found_assoc = True
            defs = _ingest_attributes(rec, attr_tag, self.warn)
            path_count: dict = {}
            for d in defs:
                if d.is_parent or not d.reversed_path:
                    continue
                key = (tuple(d.reversed_path), d.ifield)
                path_count[key] = path_count.get(key, 0) + 1
                name = _build_field_name(d.reversed_path, attr_tag,
                                         d.ifield, d.multiple_fields,
                                         id_tag, self.attr_codes)
                ent = fdefn.setdefault(
                    name, {"type": None, "is_list": False})
                if path_count[key] > 1:
                    ent["is_list"] = True
                if d.val:
                    ent["type"] = _promote(ent["type"], _sniff_type(d.val))
        return found_assoc, max_repeat

    def fill_attributes(self, rec, id_tag, attr_tag, fdefn, props):
        defs = _ingest_attributes(rec, attr_tag, self.warn)
        for d in defs:
            if d.is_parent or not d.reversed_path:
                continue
            name = _build_field_name(d.reversed_path, attr_tag, d.ifield,
                                     d.multiple_fields, id_tag,
                                     self.attr_codes)
            ent = fdefn.get(name)
            typ = (ent or {}).get("type") or "str"
            is_list = (ent or {}).get("is_list", False)
            v = _convert(d.val, typ, is_list) if d.val else (
                None if not is_list else None)
            if is_list:
                cur = props.get(name)
                if not isinstance(cur, list):
                    cur = []
                    props[name] = cur
                cur.append(v)
            elif d.val:
                props[name] = v

    def fill_assoc_subfields(self, rec, attr_tag, props, multi_assoc):
        is_inas = attr_tag == "INAS"
        flds = rec.find_all(attr_tag)
        for i, f in enumerate(flds):
            sfx = f"[{i + 1}]" if multi_assoc else ""
            rrid = f.head.get("RRID", 0)
            if is_inas:
                props[f"infoAssociationRecordId{sfx}"] = rrid
                niac = f.head.get("NIAC", 0)
                props[f"infoAssociationCode{sfx}"] = \
                    self.info_assoc_codes.get(
                        niac, f"informationAssociationCode{niac}")
                narc = f.head.get("NARC", 0)
                props[f"infoAssociationRoleCode{sfx}"] = \
                    self.assoc_role_codes.get(
                        narc, f"associationRoleCode{narc}")
            else:
                lyr = self.feat_layer_by_rcid.get(rrid)
                if lyr:
                    props[f"featureAssociationRefLayerName{sfx}"] = lyr
                props[f"featureAssociationRefRecordId{sfx}"] = rrid
                nfac = f.head.get("NFAC", 0)
                props[f"featureAssociationCode{sfx}"] = \
                    self.feat_assoc_codes.get(
                        nfac, f"featureAssociationCode{nfac}")
                narc = f.head.get("NARC", 0)
                props[f"featureAssociationRoleCode{sfx}"] = \
                    self.assoc_role_codes.get(
                        narc, f"associationRoleCode{narc}")

    def assoc_field_names(self, attr_tag, max_repeat):
        names = []
        for i in range(max_repeat):
            sfx = f"[{i + 1}]" if max_repeat > 1 else ""
            if attr_tag == "INAS":
                names += [f"infoAssociationRecordId{sfx}",
                          f"infoAssociationCode{sfx}",
                          f"infoAssociationRoleCode{sfx}"]
            else:
                names += [f"featureAssociationRefLayerName{sfx}",
                          f"featureAssociationRefRecordId{sfx}",
                          f"featureAssociationCode{sfx}",
                          f"featureAssociationRoleCode{sfx}"]
        return names

    # -------------------------------------------------------- layer build
    def srs_layer_suffix(self, crs_id, base):
        s = self.srs[crs_id]
        if s["axes"] == 2:
            return f"{base}2D"
        # "WGS 84 + meanHighWaterSprings depth" -> meanHighWaterSprings
        name = s["name"].replace("WGS 84 + ", "").replace(" depth", "")
        return f"{base}3D_{name}"

    def _simple_layer(self, name, geom_type, crs_id, id_tag, records,
                      geom_fn, extra_fill=None, extra_head_fields=()):
        fdefn: dict = {}
        found, max_rep = self.infer_fields(records, id_tag, "INAS", fdefn)
        srs = self.srs.get(crs_id) if crs_id else None
        base_fields = ["recordId", "recordVersion"] + \
            list(extra_head_fields)
        assoc_fields = self.assoc_field_names("INAS", max_rep) \
            if found else []
        order = base_fields + list(fdefn) + assoc_fields
        feats = []
        for fid, rec in enumerate(records, 1):
            head = rec.fields[0].head
            props = {k: None for k in order}
            props["recordId"] = head.get("RCID", 0)
            props["recordVersion"] = head.get("RVER", 0)
            if extra_fill:
                extra_fill(rec, props)
            geom = geom_fn(rec) if geom_fn else None
            self.fill_attributes(rec, id_tag, "INAS", fdefn, props)
            if found:
                self.fill_assoc_subfields(rec, "INAS", props, max_rep > 1)
            feats.append({"id": fid, "geometry": geom,
                          "properties": props})
        return S101Layer(name, geom_type,
                         srs["name"] if srs else None,
                         srs["auth"] if srs else None,
                         feats, order)

    def build_information_type_layer(self, layers):
        records = list(self.idx["IRID"].values())
        if not records:
            return
        fdefn: dict = {}
        self.infer_fields(records, "IRID", "ATTR", fdefn)
        found, max_rep = self.infer_fields(records, "IRID", "INAS", fdefn)
        assoc_fields = self.assoc_field_names("INAS", max_rep) \
            if found else []
        order = ["recordId", "recordVersion", "informationType"] + \
            list(fdefn) + assoc_fields
        feats = []
        for fid, rec in enumerate(records, 1):
            head = rec.fields[0].head
            props = {k: None for k in order}
            props["recordId"] = head.get("RCID", 0)
            props["recordVersion"] = head.get("RVER", 0)
            nitc = head.get("NITC", 0)
            props["informationType"] = self.info_type_codes.get(
                nitc, f"informationTypeCode{nitc}")
            self.fill_attributes(rec, "IRID", "ATTR", fdefn, props)
            # unlike geometry/feature records, the reference's
            # FillFeatureInformationType never fills the fixed INAS
            # subfields -- the assoc columns stay NULL
            self.fill_attributes(rec, "IRID", "INAS", fdefn, props)
            feats.append({"id": fid, "geometry": None,
                          "properties": props})
        layers["informationType"] = S101Layer(
            "informationType", "None", None, None, feats, order)

    def build_point_layers(self, layers, tag, base, c2, c3, geom_fn):
        by_crs: dict[int, list] = {}
        for rec in self.idx[tag].values():
            cid = self.crs_id_for_point(rec, tag, c3, c2)
            if cid is not None:
                by_crs.setdefault(cid, []).append(rec)
        for cid in sorted(by_crs):
            name = self.srs_layer_suffix(cid, base)
            gt = base if cid == HORIZONTAL_CRS_ID else base + "25D"
            layers[name] = self._simple_layer(
                name, gt, cid, tag, by_crs[cid], geom_fn)

    def build(self):
        layers: dict[str, S101Layer] = {}
        self.feat_layer_by_rcid: dict[int, str] = {}
        self.build_information_type_layer(layers)
        self.build_point_layers(layers, "PRID", "Point", "C2IT", "C3IT",
                                self.point_geometry)
        self.build_point_layers(layers, "MRID", "MultiPoint", "C2IL",
                                "C3IL", self.multipoint_geometry)
        if self.idx["CRID"]:
            layers["Curve"] = self._simple_layer(
                "Curve", "LineString", HORIZONTAL_CRS_ID, "CRID",
                list(self.idx["CRID"].values()), self.curve_geometry)
        if self.idx["CCID"]:
            layers["CompositeCurve"] = self._simple_layer(
                "CompositeCurve", "LineString", HORIZONTAL_CRS_ID, "CCID",
                list(self.idx["CCID"].values()),
                self.composite_curve_geometry)
        if self.idx["SRID"]:
            layers["Surface"] = self._simple_layer(
                "Surface", "Polygon", HORIZONTAL_CRS_ID, "SRID",
                list(self.idx["SRID"].values()), self.surface_geometry)
        self.build_feature_type_layers(layers)
        return layers

    # ------------------------------------------------------ feature types
    def _feature_key(self, rec):
        """(feature-type code, normalized geometry RCNM, crs id,
        multi_spas, promoted) for one FRID record."""
        ftc = rec.fields[0].head.get("NFTC", 0)
        spas = rec.find_all("SPAS")
        gtype = NO_GEOM
        count = 0
        hetero = False
        for f in spas:
            for i, g in enumerate(f.reps):
                rrnm = g.get("RRNM", 0)
                if rrnm == RCNM_COMPOSITE_CURVE:
                    rrnm = RCNM_CURVE
                if count == 0:
                    gtype = rrnm
                elif rrnm != gtype:
                    hetero = True
                count += 1
        if hetero:
            self.warn(f"feature {ftc}: heterogeneous spatial associations")
            return None
        multi = count > 1
        crs_id = None
        if gtype == RCNM_POINT:
            rrid = spas[0].reps[0].get("RRID", 0)
            prec = self.idx["PRID"].get(rrid)
            crs_id = (self.crs_id_for_point(prec)
                      if prec else HORIZONTAL_CRS_ID)
            if prec is None:
                self.warn(f"FRID: Point of id {rrid} does not exist")
        elif gtype == RCNM_MULTIPOINT:
            rrid = spas[0].reps[0].get("RRID", 0)
            mrec = self.idx["MRID"].get(rrid)
            crs_id = (self.crs_id_for_point(mrec, "MRID", "C3IL", "C2IL")
                      if mrec else HORIZONTAL_CRS_ID)
            if mrec is None:
                self.warn(f"FRID: MultiPoint of id {rrid} does not exist")
        elif gtype != NO_GEOM:
            crs_id = HORIZONTAL_CRS_ID
        if crs_id is None and gtype in (RCNM_POINT, RCNM_MULTIPOINT):
            return None
        promoted = gtype == RCNM_POINT and multi
        if promoted:
            gtype = RCNM_MULTIPOINT
        return (ftc, gtype, crs_id, multi, promoted)

    def build_feature_type_layers(self, layers):
        records = list(self.idx["FRID"].values())
        groups: dict = {}
        for rec in records:
            key = self._feature_key(rec)
            if key is None:
                continue
            ftc, gtype, crs_id, multi, promoted = key
            k = (ftc, gtype, crs_id)
            e = groups.setdefault(k, {"recs": [], "multi": False,
                                      "promoted": False, "max_mask": 0})
            e["recs"].append(rec)
            if promoted:
                e["promoted"] = True
            elif multi:
                e["multi"] = True
            nmask = sum(len(f.reps) for f in rec.find_all("MASK"))
            e["max_mask"] = max(e["max_mask"], nmask)

        for (ftc, gtype, crs_id), e in groups.items():
            code = self.feature_type_codes.get(ftc)
            if code is None:
                self.warn(f"features pointing at unknown feature type "
                          f"code {ftc}")
                code = f"unknownFeatureType{ftc}"
            name = code
            multi = e["multi"]
            is2d = crs_id == HORIZONTAL_CRS_ID
            geom_type = "None"
            has_orient = False
            if gtype == NO_GEOM:
                name += "_NoGeom"
            elif gtype == RCNM_POINT:
                name += "_" + self.srs_layer_suffix(crs_id, "Point")
                geom_type = "Point" if is2d else "Point25D"
            elif gtype == RCNM_MULTIPOINT:
                if multi:
                    name += "_CollectionOfMultiPoint"
                    geom_type = "GeometryCollection"
                else:
                    name += "_" + self.srs_layer_suffix(crs_id,
                                                        "MultiPoint")
                    geom_type = ("MultiPoint" if is2d
                                 else "MultiPoint25D")
            elif gtype == RCNM_CURVE:
                name += "_MultiLine" if multi else "_Line"
                geom_type = "MultiLineString" if multi else "LineString"
                has_orient = True
            elif gtype == RCNM_SURFACE:
                name += "_MultiPolygon" if multi else "_Polygon"
                geom_type = "MultiPolygon" if multi else "Polygon"
            else:
                name += f"_UnknownGeomType{gtype}"

            for rec in e["recs"]:
                rcid = rec.fields[0].head.get("RCID", 0)
                self.feat_layer_by_rcid[rcid] = name

            fdefn: dict = {}
            self.infer_fields(e["recs"], "FRID", "ATTR", fdefn)
            found_inas, rep_inas = self.infer_fields(
                e["recs"], "FRID", "INAS", fdefn)
            found_fasc, rep_fasc = self.infer_fields(
                e["recs"], "FRID", "FASC", fdefn)
            is_list = multi or e["promoted"]
            order = ["recordId", "recordVersion", "producingAgency",
                     "featureIdentificationNumber",
                     "featureIdentificationSubdivision"]
            if gtype != NO_GEOM:
                order += ["geometryLayerName", "geometryRecordId"]
                if has_orient:
                    order.append("geometryOrientation")
                order += ["scaleMinimum", "scaleMaximum"]
            order += list(fdefn)
            if found_inas:
                order += self.assoc_field_names("INAS", rep_inas)
            if found_fasc:
                order += self.assoc_field_names("FASC", rep_fasc)
            if e["max_mask"] >= 1:
                order += ["maskLayerName", "maskRecordId",
                          "maskIndicator"]
            srs = self.srs.get(crs_id) if crs_id else None
            feats = []
            for fid, rec in enumerate(e["recs"], 1):
                props = {k: None for k in order}
                head = rec.fields[0].head
                props["recordId"] = head.get("RCID", 0)
                props["recordVersion"] = head.get("RVER", 0)
                foid = rec.find("FOID")
                if foid is not None:
                    props["producingAgency"] = foid.head.get("AGEN")
                    props["featureIdentificationNumber"] = \
                        foid.head.get("FIDN")
                    props["featureIdentificationSubdivision"] = \
                        foid.head.get("FIDS")
                else:
                    self.warn("feature type record: no FOID field")
                geom = self.fill_feature_geometry(
                    rec, gtype, geom_type, is_list, props)
                self.fill_feature_mask(rec, e["max_mask"], props)
                self.fill_attributes(rec, "FRID", "ATTR", fdefn, props)
                self.fill_attributes(rec, "FRID", "INAS", fdefn, props)
                self.fill_attributes(rec, "FRID", "FASC", fdefn, props)
                if found_inas:
                    self.fill_assoc_subfields(rec, "INAS", props,
                                              rep_inas > 1)
                if found_fasc:
                    self.fill_assoc_subfields(rec, "FASC", props,
                                              rep_fasc > 1)
                feats.append({"id": fid, "geometry": geom,
                              "properties": props})
            layers[name] = S101Layer(
                name, geom_type, srs["name"] if srs else None,
                srs["auth"] if srs else None, feats, order)

    def fill_feature_geometry(self, rec, gtype, geom_type, is_list,
                              props):
        spas = rec.find_all("SPAS")
        if not spas:
            return None
        layer_names, orients, rrids, smins, smaxs = [], [], [], [], []
        parts = []
        for f in spas:
            for g in f.reps:
                rrnm = g.get("RRNM", 0)
                rrid = g.get("RRID", 0)
                ornt = g.get("ORNT", ORNT_NULL)
                if g.get("SAUI", 1) != INSTRUCTION_INSERT:
                    self.warn(f"SPAS: SAUI value {g.get('SAUI')} is "
                              "invalid")
                geom = None
                if rrnm == RCNM_POINT:
                    prec = self.idx["PRID"].get(rrid)
                    if prec is None:
                        self.warn(f"SPAS: Point of ID={rrid} does not "
                                  "exist")
                    else:
                        geom = self.point_geometry(prec)
                    layer_names.append(self.srs_layer_suffix(
                        self.crs_id_for_point(prec) if prec else
                        HORIZONTAL_CRS_ID, "Point"))
                elif rrnm == RCNM_MULTIPOINT:
                    mrec = self.idx["MRID"].get(rrid)
                    if mrec is None:
                        self.warn(f"SPAS: MultiPoint of ID={rrid} does "
                                  "not exist")
                    else:
                        geom = self.multipoint_geometry(mrec)
                    layer_names.append(self.srs_layer_suffix(
                        self.crs_id_for_point(mrec, "MRID", "C3IL", "C2IL")
                        if mrec else HORIZONTAL_CRS_ID, "MultiPoint"))
                elif rrnm in (RCNM_CURVE, RCNM_COMPOSITE_CURVE):
                    if rrnm == RCNM_CURVE:
                        crec = self.idx["CRID"].get(rrid)
                        geom = self.curve_geometry(crec) if crec else None
                        layer_names.append("Curve")
                    else:
                        crec = self.idx["CCID"].get(rrid)
                        geom = (self.composite_curve_geometry(crec)
                                if crec else None)
                        layer_names.append("CompositeCurve")
                    if crec is None:
                        self.warn(f"SPAS: curve of ID={rrid} does not "
                                  "exist")
                    if geom is not None and ornt == ORNT_REVERSE:
                        geom = {"type": "LineString",
                                "coordinates":
                                    geom["coordinates"][::-1]}
                    orients.append("forward" if ornt == ORNT_FORWARD
                                   else "reverse")
                elif rrnm == RCNM_SURFACE:
                    srec = self.idx["SRID"].get(rrid)
                    geom = self.surface_geometry(srec) if srec else None
                    if srec is None:
                        self.warn(f"SPAS: Surface of ID={rrid} does not "
                                  "exist")
                    layer_names.append("Surface")
                else:
                    self.warn(f"SPAS: Invalid RRNM = {rrnm}")
                    continue
                rrids.append(rrid)
                smins.append(g.get("SMIN", 0))
                smaxs.append(g.get("SMAX", 0))
                parts.append(geom)

        if not layer_names:
            return None
        if is_list:
            props["geometryLayerName"] = layer_names
            props["geometryRecordId"] = rrids
            if orients:
                props["geometryOrientation"] = orients
            if any(v > 0 for v in smins):
                props["scaleMinimum"] = smins
            if any(v > 0 for v in smaxs):
                props["scaleMaximum"] = smaxs
        else:
            props["geometryLayerName"] = layer_names[0]
            props["geometryRecordId"] = rrids[0]
            if orients:
                props["geometryOrientation"] = orients[0]
            if smins and smins[0] > 0:
                props["scaleMinimum"] = smins[0]
            if smaxs and smaxs[0] > 0:
                props["scaleMaximum"] = smaxs[0]

        parts = [p for p in parts]
        if len(parts) == 1 and not is_list:
            return parts[0]
        # multi-part assembly per the reference's ReadGeometry paths
        if geom_type == "GeometryCollection":
            return {"type": "GeometryCollection",
                    "geometries": [p for p in parts if p is not None]}
        if geom_type in ("MultiPoint", "MultiPoint25D"):
            if all(p is None or p["type"] == "Point" for p in parts):
                return {"type": "MultiPoint",
                        "coordinates": [p["coordinates"] for p in parts
                                        if p is not None]}
            return parts[0] if parts else None
        if geom_type == "MultiLineString":
            return {"type": "MultiLineString",
                    "coordinates": [p["coordinates"] for p in parts
                                    if p is not None]}
        if geom_type == "MultiPolygon":
            return {"type": "MultiPolygon",
                    "coordinates": [p["coordinates"] for p in parts
                                    if p is not None]}
        return parts[0] if parts else None

    def fill_feature_mask(self, rec, max_mask, props):
        if max_mask == 0:
            return
        names, rrids, indicators = [], [], []
        for f in rec.find_all("MASK"):
            for g in f.reps:
                if g.get("MUIN", 1) != INSTRUCTION_INSERT:
                    self.warn(f"MASK: MUIN value {g.get('MUIN')} is "
                              "invalid")
                mind = g.get("MIND", 0)
                indicators.append(
                    {1: "truncatedByDataCoverageLimit",
                     2: "suppressPortrayal"}.get(mind, f"unknown{mind}"))
                rrids.append(g.get("RRID", 0))
                rrnm = g.get("RRNM", 0)
                if rrnm == RCNM_CURVE:
                    names.append("Curve")
                elif rrnm == RCNM_COMPOSITE_CURVE:
                    names.append("CompositeCurve")
                else:
                    self.warn(f"MASK: Invalid RRNM {rrnm}")
                    names.append("")
        if not names:
            return
        if max_mask > 1:
            props["maskLayerName"] = names
            props["maskRecordId"] = rrids
            props["maskIndicator"] = indicators
        else:
            props["maskLayerName"] = names[0]
            props["maskRecordId"] = rrids[0]
            props["maskIndicator"] = indicators[0]


def read_s101(path: str, strict: bool = False) -> S101Dataset:
    buf = open(path, "rb").read()
    r = _Reader(buf, strict=strict)
    if not r.records:
        raise S101Error("no records")
    r.read_general_info(r.records[0])
    rest = r.records[1:]
    if rest and rest[0].find("CSID") is not None:
        r.read_csid(rest[0])
        rest = rest[1:]
    else:
        r.warn("no Dataset Coordinate Reference System record")
    r.ingest(rest)
    layers = r.build()
    return S101Dataset(r.metadata, layers, r.warnings)


# ---------------------------------------------------------------------------
# pyarrow integration for the Ray vector pipelines
# ---------------------------------------------------------------------------

def _geojson_to_wkb(g):
    from ..core import wkb as W
    if g is None:
        return None, None
    t = g["type"]
    if t == "Point":
        c = g["coordinates"]
        geom = W.point(c[0], c[1])
        z = [c[2]] if len(c) > 2 else None
    elif t == "MultiPoint":
        cc = g["coordinates"]
        geom = W.multipoint([(c[0], c[1]) for c in cc])
        z = [c[2] for c in cc] if cc and len(cc[0]) > 2 else None
    elif t == "LineString":
        geom = W.linestring([(c[0], c[1]) for c in g["coordinates"]])
        z = None
    elif t == "MultiLineString":
        geom = W.Geometry(W.MULTILINESTRING, parts=[
            W.linestring([(c[0], c[1]) for c in part])
            for part in g["coordinates"]])
        z = None
    elif t == "Polygon":
        rings = g["coordinates"]
        geom = W.polygon(rings[0], rings[1:])
        z = None
    elif t == "MultiPolygon":
        geom = W.multipolygon([
            W.polygon(rings[0], rings[1:]) for rings in g["coordinates"]])
        z = None
    elif t == "GeometryCollection":
        geom = W.collection([_geojson_to_wkb(p)[0] is not None and
                             _loads_part(p) for p in g["geometries"]])
        z = None
    else:
        return None, None
    return geom, z


def _loads_part(p):
    from ..core import wkb as W
    g, _ = _geojson_to_wkb(p)
    return g if g is not None else W.Geometry(W.GEOMETRYCOLLECTION)


def read_s101_table(path: str, layer: str | None = None):
    """Read one S-101 layer as a pyarrow Table (wkb + flattened
    properties; list-typed attributes become list columns)."""
    import pyarrow as pa
    from ..core import wkb as W

    ds = read_s101(path)
    if layer is None:
        # largest feature-type layer by default
        layer = max(ds.layers, key=lambda k: len(ds.layers[k].features)) \
            if ds.layers else None
        if layer is None:
            return pa.table({"fid": pa.array([], pa.int64())})
    lyr = ds.layers[layer]
    cols: dict[str, list] = {k: [] for k in lyr.field_order}
    wkbs = []
    for feat in lyr.features:
        for k in lyr.field_order:
            cols[k].append(feat["properties"].get(k))
        geom, _z = _geojson_to_wkb(feat["geometry"])
        wkbs.append(W.dumps(geom) if geom is not None else None)
    tbl: dict = {"fid": pa.array(
        [f["id"] for f in lyr.features], pa.int64())}
    for k, vals in cols.items():
        tbl[k] = pa.array(vals)
    t = pa.table(tbl)
    t = t.append_column("wkb", pa.array(wkbs, pa.binary()))
    meta = {b"crs": (lyr.srs_authority_code or "").encode()}
    return t.replace_schema_metadata(meta)
