"""SOSI reader tests — parity with autotest/ogr/ogr_sosi.py
(test_ogr_sosi_2/3/4 feature counts and duplicate-field semantics)."""

import os

import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.sosi import read_sosi

FIX = "/root/reference/autotest/ogr/data/sosi/test_duplicate_fields.sos"

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="reference absent")


def test_sosi_layer_counts():
    layers = read_sosi(FIX)
    # reference layer order: lines first, polygons second
    assert list(layers) == ["lines", "polygons"]
    assert layers["lines"].num_rows == 17
    assert layers["polygons"].num_rows == 1


def test_sosi_duplicate_field_first_wins():
    p = read_sosi(FIX)["polygons"]
    assert p["reinbeitebrukerID"][0].as_py() == "YD"


def test_sosi_append_fields_map():
    p = read_sosi(FIX, append_fields={"BEITEBRUKERID": ",",
                                      "OPPHAV": ","})["polygons"]
    assert p["reinbeitebrukerID"][0].as_py() == "YD,YG"
    p = read_sosi(FIX, append_fields={"BEITEBRUKERID": ";",
                                      "OPPHAV": ";"})["polygons"]
    assert p["reinbeitebrukerID"][0].as_py() == "YD;YG"


def test_sosi_flate_ring_assembly():
    p = read_sosi(FIX)["polygons"]
    g = wkb.loads(p["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    ring = g.rings[0]
    assert len(ring) > 10
    assert tuple(ring[0]) == tuple(ring[-1])        # closed


def test_sosi_coordinates_scaled():
    lines = read_sosi(FIX)["lines"]
    g = wkb.loads(lines["wkb"][0].as_py())
    # first KURVE first vertex: N 783117305 E 83001968 at ENHET 0.01
    x, y = g.coords[0]
    assert x == pytest.approx(830019.68)
    assert y == pytest.approx(7831173.05)


def test_sosi_driver_registry():
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(FIX)
    assert t.num_rows == 17
