"""CF-1.8 simple geometries — vector layers inside netCDF files.

Reference: frmts/netcdf/netcdfsg.cpp + netcdflayersg.cpp (the netCDF
driver's OGR side). A *geometry container* variable carries
``geometry_type`` (point/line/polygon), ``node_coordinates``
("x y [z]" variable names, axis roles resolved from each variable's
``axis``/``standard_name`` attribute so flipped or arbitrary
orderings work), ``node_count`` (per-feature node totals),
``part_node_count`` (per-part node counts) and ``interior_ring``
(0/1 hole flags per part). Geometry-type promotion matches the
reference: points without node_count are POINT, with node_count
MULTIPOINT; lines with part_node_count are MULTILINESTRING; polygons
with part_node_count are MULTIPOLYGON (interior_ring folds hole
parts into the preceding polygon, serpenski fixtures).

Feature fields are the variables whose ``geometry`` attribute names
the container (1-D numeric over the instance dimension, or 2-D char
-> string). ``grid_mapping`` is surfaced as a dict of the CRS
variable's attributes.

``read_netcdf_sg`` returns {layer: {"geom_type", "features":
[{"wkt", fields...}], "crs"}}; ``read_netcdf_sg_table`` flattens one
layer into a pyarrow Table with a WKT column for the Ray vector
pipelines. Parity: autotest/gdrivers/netcdf.py SG read tests
(point/multipoint/line/multiline/polygon/multipolygon 2D+3D,
serpenski interior rings, flipped/arbitrary axis order,
multiple_containers, Yahara_alb fields, cf1.8_states fields).
"""

from __future__ import annotations

import numpy as np

from ..codecs.netcdf import _read_var, parse_netcdf

__all__ = ["read_netcdf_sg", "read_netcdf_sg_table"]


def _fmt(v: float) -> str:
    return "%.15g" % v


def _coord(p) -> str:
    """OGR's OGRMakeWktCoordinate rule: when exactly one of x/y has a
    decimal point, the integral one is padded with '.0' ('0.5 0.0');
    z never participates in the padding."""
    x = _fmt(p[0])
    y = _fmt(p[1])
    xd = "." in x or "e" in x
    yd = "." in y or "e" in y
    if xd and not yd:
        y += ".0"
    elif yd and not xd:
        x += ".0"
    out = x + " " + y
    for c in p[2:]:
        out += " " + _fmt(c)
    return out


def _ring_wkt(pts) -> str:
    return "(" + ",".join(_coord(p) for p in pts) + ")"


class _SgFile:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.hdr = parse_netcdf(buf)
        self.byname = {v["name"]: v for v in self.hdr["vars"]}

    def var(self, name):
        return _read_var(self.buf, self.hdr, self.byname[name])

    def containers(self):
        return [v for v in self.hdr["vars"]
                if "geometry_type" in v["atts"]]


def _axis_role(v) -> str:
    ax = str(v["atts"].get("axis", "")).strip().upper()
    if ax in ("X", "Y", "Z"):
        return ax
    sn = str(v["atts"].get("standard_name", "")).strip().lower()
    if sn == "longitude":
        return "X"
    if sn == "latitude":
        return "Y"
    if sn in ("altitude", "height"):
        return "Z"
    return ""


def read_netcdf_sg(path: str) -> dict:
    f = _SgFile(open(path, "rb").read())
    layers = {}
    for cont in f.containers():
        name = cont["name"]
        atts = cont["atts"]
        gtype = str(atts.get("geometry_type", "")).strip().lower()
        node_coord_names = str(atts.get("node_coordinates", "")).split()
        if not node_coord_names or gtype not in ("point", "line",
                                                 "polygon"):
            continue
        coord_vars = [f.byname[n] for n in node_coord_names
                      if n in f.byname]
        # resolve axis roles; fall back to given order x y [z]
        roles = [_axis_role(v) for v in coord_vars]
        order = {}
        for role, v in zip(roles, coord_vars):
            if role:
                order[role] = v
        if "X" not in order or "Y" not in order:
            order = {"X": coord_vars[0], "Y": coord_vars[1]}
            if len(coord_vars) > 2:
                order["Z"] = coord_vars[2]
        xs = f.var(order["X"]["name"]).astype(np.float64)
        ys = f.var(order["Y"]["name"]).astype(np.float64)
        zs = (f.var(order["Z"]["name"]).astype(np.float64)
              if "Z" in order else None)
        dims = len(node_coord_names) if "Z" in order else 2
        pts = np.column_stack([xs, ys] + ([zs] if zs is not None
                                          else []))

        node_count = None
        if "node_count" in atts:
            nc_name = str(atts["node_count"]).strip()
            if nc_name in f.byname:
                node_count = f.var(nc_name).astype(np.int64)
        part_node_count = None
        if "part_node_count" in atts:
            pn = str(atts["part_node_count"]).strip()
            if pn in f.byname:
                part_node_count = f.var(pn).astype(np.int64)
        interior_ring = None
        if "interior_ring" in atts:
            ir = str(atts["interior_ring"]).strip()
            if ir in f.byname:
                interior_ring = f.var(ir).astype(np.int64)

        # instance dimension: node_count's dim, else the coord dim
        if node_count is not None:
            n_feat = len(node_count)
            inst_dim = f.byname[str(atts["node_count"]).strip()
                                ]["dims"][0][0]
        else:
            n_feat = len(xs)
            inst_dim = order["X"]["dims"][0][0]

        # geometries
        wkts = []
        z = dims == 3
        if gtype == "point" and node_count is None:
            geom_type = "Point" + ("25D" if z else "")
            for i in range(n_feat):
                wkts.append("POINT (" + _coord(pts[i]) + ")")
        elif gtype == "point":
            geom_type = "MultiPoint" + ("25D" if z else "")
            off = 0
            for cnt in node_count:
                sub = pts[off:off + cnt]
                off += cnt
                wkts.append("MULTIPOINT (" + ",".join(
                    "(" + _coord(p) + ")" for p in sub) + ")")
        elif gtype == "line":
            if part_node_count is None:
                geom_type = "LineString" + ("25D" if z else "")
                off = 0
                for cnt in node_count:
                    wkts.append("LINESTRING " +
                                _ring_wkt(pts[off:off + cnt]))
                    off += cnt
            else:
                geom_type = "MultiLineString" + ("25D" if z else "")
                off = 0
                ip = 0
                for cnt in node_count:
                    parts = []
                    used = 0
                    while used < cnt and ip < len(part_node_count):
                        pc = part_node_count[ip]
                        parts.append(pts[off + used:off + used + pc])
                        used += pc
                        ip += 1
                    off += cnt
                    wkts.append("MULTILINESTRING (" + ",".join(
                        _ring_wkt(p) for p in parts) + ")")
        else:  # polygon
            if part_node_count is None:
                geom_type = "Polygon" + ("25D" if z else "")
                off = 0
                for cnt in node_count:
                    ring = pts[off:off + cnt]
                    off += cnt
                    if not np.array_equal(ring[0], ring[-1]):
                        ring = np.vstack([ring, ring[:1]])
                    wkts.append("POLYGON (" + _ring_wkt(ring) + ")")
            else:
                geom_type = "MultiPolygon" + ("25D" if z else "")
                off = 0
                ip = 0
                for cnt in node_count:
                    polys = []  # list of list-of-rings
                    used = 0
                    while used < cnt and ip < len(part_node_count):
                        pc = part_node_count[ip]
                        ring = pts[off + used:off + used + pc]
                        if not np.array_equal(ring[0], ring[-1]):
                            ring = np.vstack([ring, ring[:1]])
                        hole = (interior_ring is not None
                                and interior_ring[ip] != 0)
                        if hole and polys:
                            polys[-1].append(ring)
                        else:
                            polys.append([ring])
                        used += pc
                        ip += 1
                    off += cnt
                    wkts.append("MULTIPOLYGON (" + ",".join(
                        "(" + ",".join(_ring_wkt(r) for r in rings)
                        + ")" for rings in polys) + ")")

        # fields: variables bound to this container over the instance
        # dimension (skip the coordinate arrays themselves)
        coord_set = {v["name"] for v in coord_vars}
        fields = {}
        for v in f.hdr["vars"]:
            if str(v["atts"].get("geometry", "")).strip() != name:
                continue
            if v["name"] in coord_set or not v["dims"]:
                continue
            if v["dims"][0][0] != inst_dim:
                continue
            arr = _read_var(f.buf, f.hdr, v)
            if arr.dtype.kind == "S" or (arr.ndim == 2 and
                                         arr.dtype.itemsize == 1):
                vals = ["".join(row.astype("U1")).rstrip("\x00").rstrip()
                        for row in arr.view("S1").astype("U1")]
            elif arr.ndim == 1:
                vals = arr.tolist()
            else:
                continue
            if len(vals) == len(wkts):
                fields[v["name"]] = vals

        # CRS from grid_mapping (on the container or any bound var)
        crs = None
        gm = atts.get("grid_mapping")
        if gm is None:
            for v in f.hdr["vars"]:
                if str(v["atts"].get("geometry", "")).strip() == name \
                        and "grid_mapping" in v["atts"]:
                    gm = v["atts"]["grid_mapping"]
                    break
        if gm is not None and str(gm).strip() in f.byname:
            crs = dict(f.byname[str(gm).strip()]["atts"])

        feats = []
        for i, wkt in enumerate(wkts):
            feat = {"wkt": wkt}
            for k, vals in fields.items():
                feat[k] = vals[i]
            feats.append(feat)
        layers[name] = {"geom_type": geom_type, "features": feats,
                        "crs": crs}
    return layers


def read_netcdf_sg_table(path: str, layer: str | None = None):
    """One SG layer -> pyarrow Table (wkt + field columns)."""
    import pyarrow as pa
    layers = read_netcdf_sg(path)
    if layer is None:
        layer = max(layers, key=lambda k: len(layers[k]["features"]))
    lyr = layers[layer]
    feats = lyr["features"]
    cols = {"fid": pa.array(range(1, len(feats) + 1), pa.int64())}
    keys = [k for k in (feats[0] if feats else {})]
    for k in keys:
        cols[k] = pa.array([ft.get(k) for ft in feats])
    return pa.table(cols)
