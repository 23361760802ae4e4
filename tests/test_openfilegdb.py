"""Esri FileGDB reader (sources/openfilegdb.py) — expectations from
the reference's own ogr_openfilegdb.py: layer list + per-layer WKTs
(lines 28-130), 'none' layer attribute values incl. UTF-8/GUID/XML/
binary/datetime (line 230-246), 'hole' layer field-desc holes
(line 273-300, 1028-1050), big_layer counts 86+3*85 (line 927)."""

import os
import shutil
import subprocess
import zipfile

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.openfilegdb import (list_gdb_layers,
                                          read_gdb_layer)

GOLDEN = ("/root/reference/autotest/ogr/data/openfilegdb/"
          "polygon_golden.gdb")
ZIPPED = ("/root/reference/autotest/ogr/data/filegdb/"
          "testopenfilegdb.gdb.zip")


@pytest.fixture(scope="module")
def gdb(tmp_path_factory):
    d = tmp_path_factory.mktemp("gdb")
    with zipfile.ZipFile(ZIPPED) as z:
        z.extractall(d)
    return str(d / "testopenfilegdb.gdb")


def _wkt(g):
    def coords(c):
        return ",".join(f"{x:g} {y:g}"
                        for x, y in np.round(np.asarray(c), 6))
    t = g.type_name
    if t == "Point":
        return f"POINT ({coords(g.coords)})"
    if t == "LineString":
        return f"LINESTRING ({coords(g.coords)})"
    if t == "Polygon":
        return "POLYGON (" + ",".join(
            f"({coords(r)})" for r in g.rings) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ",".join(
            coords(p.coords) for p in g.parts) + ")"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ",".join(
            f"({coords(p.coords)})" for p in g.parts) + ")"
    if t == "MultiPolygon":
        return "MULTIPOLYGON (" + ",".join(
            "(" + ",".join(f"({coords(r)})" for r in p.rings) + ")"
            for p in g.parts) + ")"
    return t


class TestGeometries:
    EXPECTED = {
        "point": "POINT (1 2)",
        "multipoint": "MULTIPOINT (1 2,3 4)",
        # the reference promotes line->multiline, polygon->multipolygon
        # on read (ogr_openfilegdb.py:455 uses data[3] when present)
        "linestring": "MULTILINESTRING ((1 2,3 4))",
        "multilinestring": "MULTILINESTRING ((1 2,3 4))",
        "multilinestring_multipart":
            "MULTILINESTRING ((1 2,3 4),(5 6,7 8))",
        "polygon": "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0)))",
        "multipolygon":
            "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0),"
            "(0.25 0.25,0.75 0.25,0.75 0.75,0.25 0.75,0.25 0.25)),"
            "((2 0,2 1,3 1,3 0,2 0)))",
    }

    def test_layer_list(self, gdb):
        layers = list_gdb_layers(gdb)
        for name in self.EXPECTED:
            assert name in layers
        assert not any(n.startswith("GDB_") for n in layers)

    @pytest.mark.parametrize("layer", sorted(EXPECTED))
    def test_wkt(self, gdb, layer):
        t = read_gdb_layer(gdb, layer)
        assert t.num_rows == 5
        w = [x for x in t.column("wkb").to_pylist() if x]
        assert _wkt(W.loads(w[0])) == self.EXPECTED[layer]

    def test_polygon_golden(self):
        t = read_gdb_layer(GOLDEN, "OGRGeoJSON")
        assert t.num_rows == 1
        g = W.loads(t.column("wkb").to_pylist()[0])
        assert g.type_name == "MultiPolygon"
        assert g.envelope() == (0.0, 0.0, 1.0, 1.0)
        assert t.column("foo").to_pylist() == ["bar"]


class TestAttributes:
    def test_none_layer_all_types(self, gdb):
        t = read_gdb_layer(gdb, "none")
        d = t.to_pydict()
        assert d["id"] == [1, 2, 3, 4, 5, None]
        assert d["str"][0] == "foo_é"
        assert d["smallint"][0] == -13 and d["int"][0] == 123
        assert d["float"][0] == 1.5 and d["real"][0] == 4.56
        assert d["adate"][0] == "2013-12-26 12:34:56"
        assert d["guid"][0] == \
            "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
        assert d["xml"][0] == "<foo></foo>"
        assert d["binary"][0] == b"\x00\xff\x7f"
        assert d["binary2"][0] == b"\x124V"
        assert d["nullint"] == [None] * 6

    def test_hole_layer_field_desc_holes(self, gdb):
        t = read_gdb_layer(gdb, "hole")
        assert t.column("str").to_pylist() == [
            "fid2", "fid3", "fid4", "fid5", "fid6", "fid7", "fid8",
            "fid9", "fid10", "fid11", None, "fid13"]
        assert t.column("int0").to_pylist() == [
            None, None, 4, 5, 6, 7, 8, 9, 10, 11, None, None]

    def test_big_layer_block_map(self, gdb):
        t = read_gdb_layer(gdb, "big_layer")
        assert t.num_rows == 86 + 3 * 85  # ogr_openfilegdb.py:927
        vals = t.column("real").to_pylist()
        assert vals.count(0.0) == 86
        assert all(vals.count(float(v)) == 85 for v in (1, 2, 3))

    def test_dispatcher(self):
        from gdal_ray.sources.drivers import read_vector
        t = read_vector(GOLDEN)
        assert t.num_rows == 1
