"""TIGER/Line (US Census) CompleteChain reader.

A TIGER county module is a set of fixed-width record files
``TGRxxxxx.RT?``; the CompleteChain layer
(ogr/ogrsf_frmts/tiger/tigercompletechain.cpp) joins Record Type 1
(one 228-character record per chain: attribute fields at the
published column ranges, from-node lon/lat at columns 191-200 /
201-209 and to-node at 210-219 / 220-228, 10^-6-degree integers)
with Record Type 2 shape points (TLID at columns 6-15, up to ten
(lon, lat) vertex pairs per record at 19+19i, records with the same
TLID consecutive, a zero longitude ending the vertex list).  Field
column ranges follow the driver's rt1 table (tigercompletechain.cpp
:64-107); lines may end in LF or CRLF and are padded to 228.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

from ..core import wkb as W

__all__ = ["read_tiger", "read_tiger_complete_chain"]

# (name, 1-based begin, 1-based end, kind) — tigercompletechain.cpp
# rt1_fields; 'N' integer, 'A' string
_RT1_FIELDS = [
    ("TLID", 6, 15, "N"), ("SIDE1", 16, 16, "N"),
    ("SOURCE", 17, 17, "A"), ("FEDIRP", 18, 19, "A"),
    ("FENAME", 20, 49, "A"), ("FETYPE", 50, 53, "A"),
    ("FEDIRS", 54, 55, "A"), ("CFCC", 56, 58, "A"),
    ("FRADDL", 59, 69, "A"), ("TOADDL", 70, 80, "A"),
    ("FRADDR", 81, 91, "A"), ("TOADDR", 92, 102, "A"),
    ("FRIADDL", 103, 103, "N"), ("TOIADDL", 104, 104, "N"),
    ("FRIADDR", 105, 105, "N"), ("TOIADDR", 106, 106, "N"),
    ("ZIPL", 107, 111, "N"), ("ZIPR", 112, 116, "N"),
    ("FAIRL", 117, 121, "N"), ("FAIRR", 122, 126, "N"),
    ("TRUSTL", 127, 127, "A"), ("TRUSTR", 128, 128, "A"),
    ("CENSUS1", 129, 129, "A"), ("CENSUS2", 130, 130, "A"),
    ("STATEL", 131, 132, "N"), ("STATER", 133, 134, "N"),
    ("COUNTYL", 135, 137, "N"), ("COUNTYR", 138, 140, "N"),
    ("FMCDL", 141, 145, "N"), ("FMCDR", 146, 150, "N"),
    ("FSMCDL", 151, 155, "N"), ("FSMCDR", 156, 160, "N"),
    ("FPLL", 161, 165, "N"), ("FPLR", 166, 170, "N"),
    ("CTBNAL", 171, 176, "N"), ("CTBNAR", 177, 182, "N"),
    ("BLKL", 183, 186, "A"), ("BLKR", 187, 190, "A"),
]


def _records(path: str, width: int):
    with open(path, "rb") as fh:
        data = fh.read()
    for line in data.splitlines():
        text = line.decode("ascii", "replace")
        if not text.strip():
            continue
        yield text.ljust(width)


def _field(rec: str, beg: int, end: int) -> str:
    return rec[beg - 1:end].strip()


def _int(rec: str, beg: int, end: int):
    s = _field(rec, beg, end)
    try:
        return int(s)
    except ValueError:
        return None


def _shape_points(rt2_path: str):
    """TLID → intermediate vertex list from the RT2 file."""
    out: dict[int, list] = {}
    if not os.path.exists(rt2_path):
        return out
    for rec in _records(rt2_path, 208):
        tlid = _int(rec, 6, 15)
        if tlid is None:
            continue
        pts = out.setdefault(tlid, [])
        for i in range(10):
            start = 19 + 19 * i
            lon = _int(rec, start, start + 9)
            lat = _int(rec, start + 10, start + 18)
            if not lon:  # zero/blank longitude ends the list
                break
            pts.append((lon / 1e6, lat / 1e6))
    return out


def _find_rt1(path: str) -> str:
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.RT1"))
                       + glob.glob(os.path.join(path, "*.rt1")))
        if not cands:
            raise ValueError(f"Tiger: no .RT1 module in {path}")
        return cands[0]
    return path


def read_tiger_complete_chain(path: str) -> pa.Table:
    """Read a TIGER module (an .RT1 file or its directory) →
    CompleteChain layer as an Arrow table with WKB line geometry."""
    rt1 = _find_rt1(path)
    module = os.path.splitext(os.path.basename(rt1))[0]
    base = os.path.splitext(rt1)[0]
    rt2 = base + (".rt2" if rt1.endswith(".rt1") else ".RT2")
    shapes = _shape_points(rt2)

    cols: dict[str, list] = {"MODULE": []}
    for name, *_ in _RT1_FIELDS:
        cols[name] = []
    wkbs = []
    for rec in _records(rt1, 228):
        if rec[0] != "1":
            continue
        cols["MODULE"].append(module)
        for name, beg, end, kind in _RT1_FIELDS:
            cols[name].append(_int(rec, beg, end) if kind == "N"
                              else _field(rec, beg, end))
        tlid = _int(rec, 6, 15) or 0
        fr = (_int(rec, 191, 200) or 0, _int(rec, 201, 209) or 0)
        to = (_int(rec, 210, 219) or 0, _int(rec, 220, 228) or 0)
        pts = [(fr[0] / 1e6, fr[1] / 1e6)]
        pts += shapes.get(tlid, [])
        pts.append((to[0] / 1e6, to[1] / 1e6))
        wkbs.append(W.dumps(W.linestring(pts)))

    arrays = {}
    for name, vals in cols.items():
        kind = "A" if name == "MODULE" else \
            next(k for n, b, e, k in _RT1_FIELDS if n == name)
        arrays[name] = pa.array(
            vals, pa.int64() if kind == "N" else pa.string())
    arrays["wkb_geometry"] = pa.array(wkbs, pa.binary())
    return pa.table(arrays)


def read_tiger(path: str, layer: str = "CompleteChain") -> pa.Table:
    if layer != "CompleteChain":
        raise ValueError(f"Tiger: layer {layer!r} not supported "
                         "(CompleteChain only)")
    return read_tiger_complete_chain(path)
