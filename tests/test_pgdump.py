"""PGDump SQL writer vs the reference's literal statement stream.

The expected needles are extracted at test time from
autotest/ogr/ogr_pgdump.py (tests 1-2) rather than re-typed, so the
comparison is verbatim against the reference's own expectations."""
import re

import pyarrow as pa

from gdal_ray.sources.pgdump import wkb_to_ewkb_hex, write_pgdump
from gdal_ray.sources.shapefile import read_shapefile

POLY = "/root/reference/autotest/ogr/data/poly.shp"
AUTOTEST = "/root/reference/autotest/ogr/ogr_pgdump.py"


def _needles(test_name: str) -> list[str]:
    """All check_and_remove triple-quoted literals of one autotest
    function, unescaped, in order."""
    src = open(AUTOTEST).read()
    block = src.split(f"def {test_name}(")[1].split("\ndef ")[0]
    lits = re.findall(r'check_and_remove\(\s*"""(.*?)"""', block, re.S)
    return [lit.encode().decode("unicode_escape") for lit in lits]


def _tpoly_table():
    t = read_shapefile(POLY)
    return pa.table({
        "wkb": t["wkb"],
        "AREA": t["AREA"],
        "EAS_ID": pa.array(t["EAS_ID"].to_pylist(), pa.int32()),
        "PRFEDEA": t["PRFEDEA"],
        "SHORTNAME": pa.array([None] * t.num_rows, pa.string()),
    })


def test_pgdump_insert_dim3(tmp_path):
    """autotest test_ogr_pgdump_1: INSERT mode, DIM=3,
    POSTGIS_VERSION=1.5 — every expected needle, in order."""
    out = tmp_path / "tpoly.sql"
    write_pgdump(_tpoly_table(), str(out), layer="tpoly", dim=3,
                 postgis_version=1.5, widths={"SHORTNAME": 8})
    sql = out.read_bytes().decode()
    for needle in _needles("test_ogr_pgdump_1"):
        assert needle in sql, needle[:120]
        sql = sql[sql.find(needle) + len(needle):]


def test_pgdump_copy_srid_quoted(tmp_path):
    """autotest test_ogr_pgdump_2: COPY mode, CRLF, quoted
    identifiers, SRID=4326, custom schema + geometry column."""
    out = tmp_path / "tpoly.sql"
    write_pgdump(_tpoly_table(), str(out), layer='xx"yyy',
                 schema='ano"ther_schema', geom_name='the_"geom',
                 srid=4326, geom_type="POLYGON", use_copy=True,
                 lineformat="CRLF", widths={"SHORTNAME": 8})
    sql = out.read_bytes().decode()
    needles = _needles("test_ogr_pgdump_2")
    for needle in needles:
        assert needle in sql, needle[:120]
        sql = sql[sql.find(needle) + len(needle):]
        if needle == "\\.":
            # the autotest asserts no semicolon after \. — CRLF next
            assert sql.startswith("\r\n"), repr(sql[:8])


def test_pgdump_no_geom_layer(tmp_path):
    """wkbNone-style layers: no AddGeometryColumn, no index; empty
    string stays empty, not \\N (autotest test_ogr_pgdump_3)."""
    t = pa.table({"EMPTYCHAR": pa.array(["", None], pa.string()),
                  "EAS_ID": pa.array([168, 179], pa.int32())})
    out = tmp_path / "t.sql"
    write_pgdump(t, str(out), layer="tpoly", schema="another_schema",
                 use_copy=True)
    sql = out.read_bytes().decode()
    assert "AddGeometryColumn" not in sql
    assert "CREATE INDEX" not in sql
    assert 'CREATE SCHEMA "another_schema";' in sql
    assert "\t168\n" in sql
    assert "\\N\t179" in sql


def test_ewkb_nested_multi():
    """Z-promotion + SRID flag per EWKB rules on nested parts (SRID
    only on the outer header, Z flag on every header)."""
    from gdal_ray.core import wkb as W
    g = W.multipolygon([W.polygon([(0, 0), (1, 0), (1, 1), (0, 0)])])
    h = wkb_to_ewkb_hex(W.dumps(g), srid=4326, dim=3)
    assert h.startswith("01" + "060000A0" + "E6100000")
    assert "0103000080" in h
