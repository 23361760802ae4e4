"""CSV vector driver — schema-on-read with WKT geometry or x/y point
columns (reference behavior: ogr/ogrsf_frmts/csv/ with GEOM_POSSIBLE_
NAMES / X_POSSIBLE_NAMES semantics)."""

from __future__ import annotations

import csv
import io

import pyarrow as pa

from ..core import wkb as W
from ..core import wkt as WT

_GEOM_NAMES = ("wkt", "geometry", "geom", "the_geom")
_X_NAMES = ("x", "lon", "longitude", "easting")
_Y_NAMES = ("y", "lat", "latitude", "northing")


def _infer(v: str):
    if v == "":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def read_csv(path_or_text: str, *, geom_col: str | None = None,
             x_col: str | None = None, y_col: str | None = None) -> pa.Table:
    """CSV file path (or literal text containing a newline) → Arrow
    table with fid, wkb, envelope cols + typed attribute columns.
    Geometry comes from a WKT column (auto-detected name) or x/y
    columns; attribute types are inferred per column (int → float →
    string, schema-on-read)."""
    if "\n" in path_or_text:
        f = io.StringIO(path_or_text)
    else:
        f = open(path_or_text, newline="", encoding="utf-8-sig")
    with f:
        rdr = csv.reader(f)
        try:
            header = next(rdr)
        except StopIteration:
            raise ValueError("empty CSV")
        if not any(h.strip() for h in header):
            raise ValueError("empty CSV header")
        lower = [h.strip().lower() for h in header]
        if geom_col is None:
            for cand in _GEOM_NAMES:
                if cand in lower:
                    geom_col = header[lower.index(cand)]
                    break
        if geom_col is None and x_col is None:
            for cx in _X_NAMES:
                if cx in lower:
                    x_col = header[lower.index(cx)]
                    break
            for cy in _Y_NAMES:
                if cy in lower:
                    y_col = header[lower.index(cy)]
                    break
        gi = header.index(geom_col) if geom_col else None
        xi = header.index(x_col) if x_col else None
        yi = header.index(y_col) if y_col else None
        attr_idx = [k for k in range(len(header)) if k != gi]
        cols: dict[str, list] = {"fid": [], "wkb": [], "minx": [],
                                 "miny": [], "maxx": [], "maxy": []}
        reserved = set(cols)
        keys = {}
        for k in attr_idx:
            nm = header[k].strip()
            if nm.lower() in reserved:
                nm = f"attr_{nm}"
            while nm in cols:            # duplicate header names
                nm = nm + "_"
            keys[k] = nm
            cols[keys[k]] = []
        fid = 0
        for row in rdr:
            if not row:
                continue
            g = None
            if gi is not None and gi < len(row) and row[gi].strip():
                try:
                    g = WT.loads_wkt(row[gi])
                except ValueError:
                    g = None             # unparsable WKT → null geom
            elif xi is not None and yi is not None:
                try:
                    g = W.point(float(row[xi]), float(row[yi]))
                except (ValueError, IndexError):
                    g = None
            cols["fid"].append(fid)
            fid += 1
            if g is None:
                cols["wkb"].append(None)
                for c in ("minx", "miny", "maxx", "maxy"):
                    cols[c].append(None)
            else:
                env = g.envelope()
                cols["wkb"].append(W.dumps(g))
                cols["minx"].append(float(env[0]))
                cols["miny"].append(float(env[1]))
                cols["maxx"].append(float(env[2]))
                cols["maxy"].append(float(env[3]))
            for k in attr_idx:
                cols[keys[k]].append(_infer(row[k].strip())
                                     if k < len(row) else None)
        # OGR-style per-column type promotion: int -> real -> string
        for k in attr_idx:
            vals = cols[keys[k]]
            kinds = {type(v) for v in vals if v is not None}
            if str in kinds and len(kinds) > 1:
                cols[keys[k]] = [None if v is None else str(v)
                                 for v in vals]
            elif kinds == {int, float}:
                cols[keys[k]] = [None if v is None else float(v)
                                 for v in vals]
        return pa.Table.from_pydict(cols)


def write_csv(table: pa.Table, path: str, *, wkb_col: str = "wkb") -> None:
    """Arrow table with a WKB column → CSV with a WKT geometry column."""
    skip = {wkb_col, "minx", "miny", "maxx", "maxy"}
    attr = [c for c in table.column_names if c not in skip]
    with open(path, "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(attr + ["WKT"])
        wkbs = table[wkb_col].to_pylist() if wkb_col in table.column_names \
            else [None] * table.num_rows
        for i in range(table.num_rows):
            row = [table[c][i].as_py() for c in attr]
            g = wkbs[i]
            row.append(WT.dumps_wkt(W.loads(g)) if g is not None else "")
            wtr.writerow(row)


def read_csv_dataset(path: str, **kw):
    import ray.data as rd
    return rd.from_arrow(read_csv(path, **kw))
