"""MiraMon structured-vector reader (sources/miramon.py) — reference
autotest ogr_miramon_vector.py goldens: SimplePoints attributes and
logical fields, SimpleArcs vertex-exact linestrings with
N_VERTEXS/LONG_ARC/NODE_INI/NODE_FI and the cp850 'FÈÊ' attribute,
SimplePolygons ring assembly from PAL arc refs (universe polygon
skipped) with exact PERIMETRE/AREA."""

import numpy as np
import pytest

from gdal_ray.core.wkb import loads
from gdal_ray.sources.drivers import read_vector
from gdal_ray.sources.miramon import read_miramon

D = "/root/reference/autotest/ogr/data/miramon"


class TestPoints:
    def test_simple_points(self):
        t = read_miramon(f"{D}/Points/SimplePoints/SimplePointsFile.pnt")
        assert t.num_rows == 3
        assert t["ATT1"].to_pylist() == ["A", "C", ""]
        assert t["ATTRIBUTE_2"].to_pylist() == ["B", "D", ""]
        assert t["LOGICALY"].to_pylist() == [1, 1, 1]
        assert t["LOGICALN"].to_pylist() == [0, 0, 0]
        assert t["ID_GRAFIC"].to_pylist() == [0, 1, 2]


class TestArcs:
    def test_simple_arcs(self):
        t = read_miramon(f"{D}/Arcs/SimpleArcs/SimpleArcFile.arc")
        assert t.num_rows == 4
        g = loads(t["wkb"][0].as_py())
        assert g.type_name == "LineString"
        assert g.coords[0] == pytest.approx(
            (351.333967649907, 610.58039961936))
        assert len(g.coords) == 5
        assert t["N_VERTEXS"].to_pylist() == [5, 7, 2, 6]
        assert t["LONG_ARC"][0].as_py() == pytest.approx(
            1226.052754666, abs=1e-5)
        assert t["NODE_INI"].to_pylist() == [0, 2, 4, 6]
        assert t["NODE_FI"].to_pylist() == [1, 3, 5, 7]
        assert t["ATT2"][3].as_py() == "FÈÊ"       # cp850 charset


class TestPolygons:
    def test_simple_polygons(self):
        t = read_miramon(
            f"{D}/Polygons/SimplePolygons/SimplePolFile.pol")
        assert t.num_rows == 3                      # universe skipped
        g = loads(t["wkb"][0].as_py())
        assert g.type_name == "Polygon"
        ring = g.rings[0]
        assert tuple(ring[0]) == pytest.approx(
            (335.318744053333, 769.731684110321))
        assert tuple(ring[1]) == pytest.approx(
            (552.525214081877, 856.814462416696))
        assert len(ring) == 6
        assert t["ID_GRAFIC"].to_pylist() == [1, 2, 3]
        assert t["PERIMETRE"][0].as_py() == pytest.approx(
            1289.866489495, abs=1e-5)
        assert t["AREA"][0].as_py() == pytest.approx(
            112471.221989, abs=1e-5)
        assert t["N_ARCS"][0].as_py() == 1
        assert t["ATT1"].to_pylist()[:2] == ["A", "C"]

    def test_routing(self):
        t = read_vector(
            f"{D}/Polygons/SimplePolygons/SimplePolFile.pol")
        assert t.num_rows == 3
