"""Japanese FGD GML profile tests — parity with
autotest/ogr/ogr_gml_fgd_read.py (lat-lon axis swap, JGD2011/2024
SRS, timePosition date flattening, Ring-of-curveMembers polygons)."""

import os

import pytest

from gdal_ray.core import wkb
from gdal_ray.core.wkt import dumps_wkt
from gdal_ray.sources.gml import read_fgd_gml, read_gml_table

DATA = "/root/reference/autotest/ogr/data/gml_jpfgd"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")


def test_fgd_elevpt():
    t = read_fgd_gml(os.path.join(DATA, "ElevPt.xml"))
    assert t.num_rows == 1
    assert t.schema.metadata[b"crs"] == b"EPSG:6668"      # JGD2011
    g = wkb.loads(t["wkb"][0].as_py())
    assert dumps_wkt(g) == "POINT (133.123456789 34.123456789)"
    assert t["devDate"][0].as_py() == "2015-01-07"


def test_fgd_blda_polygon():
    t = read_fgd_gml(os.path.join(DATA, "BldA.xml"))
    g = wkb.loads(t["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    ring = g.rings[0]
    assert ring[0][0] == pytest.approx(139.718509733734, abs=1e-12)
    assert ring[0][1] == pytest.approx(35.6952171397133, abs=1e-12)
    assert len(ring) == 5
    assert t["devDate"][0].as_py() == "2017-03-07"


def test_fgd_jgd2024():
    t = read_fgd_gml(os.path.join(DATA, "ElevPt_JGD2024.xml"))
    assert t.schema.metadata[b"crs"] == b"JGD2024"
    g = wkb.loads(t["wkb"][0].as_py())
    assert dumps_wkt(g) == "POINT (133.123456789 34.123456789)"


def test_fgd_via_gml_table():
    t = read_gml_table(os.path.join(DATA, "ElevPt.xml"))
    assert t.num_rows == 1
    assert t["layer"][0].as_py() == "ElevPt"
