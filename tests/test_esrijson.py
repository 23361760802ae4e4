"""ESRIJSON reader tests — geometry WKT and field typing parity with
the reference's autotest/ogr/ogr_esrijson.py expectations."""

import os

import pyarrow as pa
import pytest

from gdal_ray.sources.esrijson import read_esrijson

DATA = "/root/reference/autotest/ogr/data/esrijson"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")

GEOM_EXPECTED = {
    "esripoint.json": "POINT (2 49)",
    "esrilinestring.json": "LINESTRING (2 49,3 50)",
    "esripolygonempty.json": "POLYGON EMPTY",
    "esrimultipoint.json": "MULTIPOINT (2 49,3 50)",
    "esrizpoint.json": "POINT (2 49 1)",
    "esrizlinestring.json": "LINESTRING (2 49 1,3 50 2)",
    "esrizmultipoint.json": "MULTIPOINT (2 49 1,3 50 2)",
    "esrizpolygon.json": "POLYGON ((2 49 1,2 50 2,3 50 3,3 49 4,2 49 1))",
    "esrihasmnozmultipoint.json": "MULTIPOINT M ((2 49 1),(3 50 2))",
    "esriinvalidhaszmultipoint.json": "MULTIPOINT (2 49,3 50)",
    "esrizmmultipoint.json": "MULTIPOINT ZM ((2 49 1 100),(3 50 2 100))",
    "esripolygon.json":
        "MULTIPOLYGON (((2 49,2 50,3 50,3 49,2 49),"
        "(2.1 49.1,2.1 49.9,2.9 49.9,2.9 49.1,2.1 49.1)),"
        "((-2 49,-2 50,-3 50,-3 49,-2 49)))",
}


@pytest.mark.parametrize("name,wkt", sorted(GEOM_EXPECTED.items()))
def test_esrijson_geometry(name, wkt):
    t = read_esrijson(os.path.join(DATA, name))
    assert t["wkt"][0].as_py() == wkt


def test_esrijson_point_fields():
    t = read_esrijson(os.path.join(DATA, "esripoint.json"))
    row = {c: t[c][0].as_py() for c in t.column_names if c != "wkb"}
    assert row["fid"] == 1
    assert row["fooSmallInt"] == 2
    assert row["fooInt"] == 1234567890
    assert row["fooSingle"] == 1.5
    assert row["fooDouble"] == 3.4
    assert row["fooString"] == "56"
    assert row["fooDate"] == "2021/12/31 00:00:00+00"
    assert row["fooDateOnly"] == "2025/09/20"
    assert row["fooTimeOnly"] == "12:34:56"
    assert row["fooBigInteger"] == 1234567890123456
    assert row["fooGlobalID"] == "{FD04C39C-69C6-4DCC-88D6-7E3E673DD0CB}"
    assert row["fooGUID"] == "{3BFE6840-A9E6-432A-AD34-B2067C8A276F}"
    # esri type → arrow type mapping
    assert t.schema.field("fooSmallInt").type == pa.int16()
    assert t.schema.field("fooSingle").type == pa.float32()
    assert t.schema.field("fooBigInteger").type == pa.int64()
    assert t.schema.field("objectid").metadata[b"alias"] == b"Object ID"
    assert t.schema.metadata[b"crs"] == b"EPSG:4326"
    assert t.schema.metadata[b"layer"] == b"esripoint"


def test_esrijson_multilinestring_inline():
    t = read_esrijson(
        '{"geometryType": "esriGeometryPolyline", "fields": [],'
        '"features": [{"geometry": {"paths" : ['
        '[ [2,49],[2.1,49.1] ], [ [3,50],[3.1,50.1] ]]}}]}')
    assert t["wkt"][0].as_py() == \
        "MULTILINESTRING ((2 49,2.1 49.1),(3 50,3.1 50.1))"


def test_esrijson_inferred_fields():
    # GetLatLon.json has no fields array — schema inferred from the
    # first feature's attributes (landdescription string)
    t = read_esrijson(os.path.join(DATA, "GetLatLon.json"))
    assert t["landdescription"][0].as_py() == "WA330160N0260E0SN070"
    assert t["wkt"][0].as_py().startswith("POLYGON ((")


def test_esrijson_starting_with_features():
    t = read_esrijson(
        os.path.join(DATA, "esrijsonstartingwithfeaturesgeometry.json"))
    assert t.num_rows == 1


def test_esrijson_json_routing(tmp_path):
    from gdal_ray.sources.drivers import read_vector
    import shutil
    p = tmp_path / "pt.json"
    shutil.copy(os.path.join(DATA, "esripoint.json"), p)
    t = read_vector(str(p))
    assert t["wkt"][0].as_py() == "POINT (2 49)"
