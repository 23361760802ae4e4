"""TopoJSON reader tests — exact parity with the reference's
autotest/ogr/ogr_topojson.py expected feature lists (layer naming,
arc delta-decoding + transform, negative-arc reversal, arc joins,
degenerate-input EMPTY behavior, properties promotion)."""

import os

import pytest

from gdal_ray.sources.topojson import read_topojson

DATA = "/root/reference/autotest/ogr/data/topojson"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")

# the full expected list from test_ogr_topojson_objects_is_array
EXPECTED = [
    ("foo", None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT (100 1010)"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, "0", "LINESTRING EMPTY"),
    (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None, "POLYGON ((110 1100,110 1000,100 1000,100 1100,"
     "110 1100),(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON (((110 1100,110 1000,100 1000,100 1100,"
     "110 1100)),((101 1010,109 1010,109 1090,101 1090,101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000),(101 1010,101 1090,109 1090,109 1010,"
     "101 1010))"),
]


def test_topojson_objects_is_array():
    layers = read_topojson(os.path.join(DATA, "topojson1.topojson"))
    assert list(layers) == ["a_layer", "TopoJSON"]
    a = layers["a_layer"]
    assert a.num_rows == 1
    assert a["wkt"][0].as_py() == "LINESTRING (100 1000,110 1000,110 1100)"
    m = layers["TopoJSON"]
    assert m.column_names[:2] == ["id", "name"]
    got = list(zip((v.as_py() for v in m["id"]),
                   (v.as_py() for v in m["name"]),
                   (v.as_py() for v in m["wkt"])))
    assert got == EXPECTED


def test_topojson_objects_is_dict():
    layers = read_topojson(os.path.join(DATA, "topojson2.topojson"))
    a = layers["a_layer"]
    assert a["id"][0].as_py() == "foo"
    assert a["name"][0].as_py() == "line"
    assert a["wkt"][0].as_py() == "LINESTRING (100 1000,110 1000,110 1100)"
    m = layers["TopoJSON"]
    assert m["wkt"][0].as_py() == "LINESTRING (100 1000,110 1000,110 1100)"


def test_topojson_no_transform():
    layers = read_topojson(os.path.join(DATA, "topojson3.topojson"))
    for name in ("a_layer", "TopoJSON"):
        assert layers[name]["wkt"][0].as_py() == \
            "LINESTRING (0 0,10 0,0 10,10 0,0 0)"
        assert layers[name].schema.metadata in (None, {})


def test_topojson_crs():
    layers = read_topojson(os.path.join(DATA,
                                        "topojson_with_crs.topojson"))
    for t in layers.values():
        assert t.schema.metadata[b"crs"] == b"EPSG:4326"


def test_topojson_driver_registry():
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(os.path.join(DATA, "topojson1.topojson"))
    assert t.num_rows == 1          # first layer = a_layer


def test_topojson_wkb_roundtrip():
    from gdal_ray.core import wkb
    layers = read_topojson(os.path.join(DATA, "topojson1.topojson"))
    m = layers["TopoJSON"]
    n_geom = sum(1 for v in m["wkb"] if v.as_py() is not None)
    assert n_geom == 10             # the non-EMPTY geometries
    g = wkb.loads(m["wkb"][14].as_py())
    assert g.geom_type == wkb.LINESTRING
