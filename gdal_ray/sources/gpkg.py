"""GeoPackage feature reader — stdlib sqlite3, pure Python.

Independently implements the published OGC GeoPackage 1.x encoding
(reference behavior: ogr/ogrsf_frmts/gpkg/): feature tables discovered
via gpkg_contents/gpkg_geometry_columns, geometry columns carry a GPB
(GeoPackage Binary) header — magic 'GP', version, flags (envelope
size, endianness, empty bit) — followed by ISO WKB, which the engine's
codec parses directly."""

from __future__ import annotations

import sqlite3
import struct

import pyarrow as pa

from ..core import wkb as W

_ENV_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _parse_gpb(blob: bytes):
    """GPB blob → Geometry | None (empty geometry bit honored)."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackage binary geometry")
    flags = blob[3]
    # bit 5 = extended-type flag, bit 4 = empty flag (spec §2.1.3 /
    # ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp:368 byFlags & 0x10)
    if flags & 0b00100000:
        raise ValueError("extended (non-standard) GPB geometry type")
    if flags & 0b00010000:           # empty-geometry flag
        return None
    env_code = (flags >> 1) & 0b111
    if env_code not in _ENV_SIZE:
        raise ValueError(f"invalid GPB envelope code {env_code}")
    off = 8 + _ENV_SIZE[env_code]
    return W.loads(blob[off:])


def list_feature_tables(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features'").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_gpkg(path: str, table: str | None = None) -> pa.Table:
    """GeoPackage feature table → Arrow table (fid, wkb, envelope cols,
    attributes)."""
    con = sqlite3.connect(path)
    try:
        if table is None:
            tables = [r[0] for r in con.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'features'")]
            if not tables:
                raise ValueError(f"no feature tables in {path}")
            table = tables[0]
        geom_col = None
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (table,)).fetchone()
        if row:
            geom_col = row[0]
        cur = con.execute(f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        cols: dict[str, list] = {"fid": [], "wkb": [], "minx": [],
                                 "miny": [], "maxx": [], "maxy": []}
        attr_names = [n for n in names if n != geom_col]
        for n in attr_names:
            key = n if n not in cols else f"attr_{n}"
            cols[key] = []
        fid_auto = 0
        for rec in cur:
            rowd = dict(zip(names, rec))
            g = None
            if geom_col is not None and rowd.get(geom_col) is not None:
                g = _parse_gpb(rowd[geom_col])
            cols["fid"].append(fid_auto)
            fid_auto += 1
            if g is None:
                cols["wkb"].append(None)
                for k in ("minx", "miny", "maxx", "maxy"):
                    cols[k].append(None)
            else:
                env = g.envelope()
                cols["wkb"].append(W.dumps(g))
                cols["minx"].append(float(env[0]))
                cols["miny"].append(float(env[1]))
                cols["maxx"].append(float(env[2]))
                cols["maxy"].append(float(env[3]))
            for n in attr_names:
                key = n if n in cols and n not in (
                    "fid", "wkb", "minx", "miny", "maxx", "maxy") \
                    else f"attr_{n}"
                if key not in cols:
                    key = n
                cols.setdefault(key, []).append(rowd.get(n))
        return pa.Table.from_pydict(cols)
    finally:
        con.close()


def read_gpkg_dataset(path: str, table: str | None = None):
    import ray.data as rd
    return rd.from_arrow(read_gpkg(path, table))


def write_gpkg(table: pa.Table, path: str, *, layer: str = "layer",
               srs_id: int = 3857, wkb_col: str = "wkb") -> None:
    """Arrow table with a WKB column → minimal spec-compliant GeoPackage
    (gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns +
    feature table with GPB-wrapped geometry)."""
    import os
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")   # 'GPKG'
        con.execute("PRAGMA user_version = 10300")          # 1.3
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER,
            definition TEXT NOT NULL, description TEXT)""")
        for sid, nm in ((-1, "Undefined cartesian"), (0, "Undefined geo"),
                        (srs_id, f"EPSG:{srs_id}")):
            con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES "
                        "(?, ?, 'EPSG', ?, 'undefined', NULL)",
                        (nm, sid, max(sid, 0)))
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
            max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
        con.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
        skip = {wkb_col, "minx", "miny", "maxx", "maxy"}
        attrs = [c for c in table.column_names if c not in skip and c != "fid"]

        def sql_type(col):
            import pyarrow as _pa
            t = table.schema.field(col).type
            if _pa.types.is_integer(t):
                return "INTEGER"
            if _pa.types.is_floating(t):
                return "REAL"
            return "TEXT"

        cols_sql = ", ".join(f'"{c}" {sql_type(c)}' for c in attrs)
        con.execute(f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY, '
                    f'geom BLOB{", " + cols_sql if cols_sql else ""})')
        con.execute("INSERT INTO gpkg_contents VALUES "
                    "(?, 'features', ?, '', NULL, NULL, NULL, NULL, NULL, ?)",
                    (layer, layer, srs_id))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, 'geom', 'GEOMETRY', ?, 0, 0)", (layer, srs_id))
        fids = table["fid"].to_pylist() if "fid" in table.column_names \
            else list(range(table.num_rows))
        wkbs = table[wkb_col].to_pylist()
        hdr = b"GP\x00" + bytes([0b00000001]) + struct.pack("<i", srs_id)
        ph = ", ".join(["?"] * (2 + len(attrs)))
        for i in range(table.num_rows):
            blob = (hdr + wkbs[i]) if wkbs[i] is not None else None
            vals = [fids[i], blob] + [table[c][i].as_py() for c in attrs]
            con.execute(f'INSERT INTO "{layer}" VALUES ({ph})', vals)
        con.commit()
    finally:
        con.close()
