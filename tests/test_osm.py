"""OSM reader (sources/osm.py) — behavior goldens from
autotest/ogr/ogr_osm.py test_ogr_osm_1 (run against both test.pbf and
test.osm): layer contents, tag->field mapping, z_order formula,
multipolygon assembly incl. old-style tag inheritance, skipped
degenerate ways/relations."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.osm import read_osm_layers

D = "/root/reference/autotest/ogr/data/osm"


@pytest.fixture(params=["test.pbf", "test.osm"])
def layers(request):
    return read_osm_layers(f"{D}/{request.param}")


class TestOsm:
    def test_points(self, layers):
        t = layers["points"]
        assert len(t) == 1
        r = t.to_pylist()[0]
        assert r["osm_id"] == "3"
        assert r["name"] == "Some interesting point"
        assert r["other_tags"] == '"foo"=>"bar","bar"=>"baz"'
        g = W.loads(r["wkb"])
        assert tuple(g.coords[0]) == (3.0, 49.5)

    def test_lines(self, layers):
        t = layers["lines"]
        rows = t.to_pylist()
        assert [r["osm_id"] for r in rows] == ["1", "6"]
        assert rows[0]["highway"] == "motorway"
        assert rows[0]["z_order"] == 9
        assert rows[0]["other_tags"] == '"foo"=>"bar"'
        g = W.loads(rows[0]["wkb"])
        assert [tuple(c) for c in g.coords] == [(2.0, 49.0), (3.0, 50.0)]
        # way 6 has one nonexistent node dropped
        g6 = W.loads(rows[1]["wkb"])
        assert [tuple(c) for c in g6.coords] == \
            [(2.0, 49.0), (3.0, 49.0), (3.0, 50.0), (2.0, 50.0),
             (2.0, 49.0)]

    def test_multipolygons(self, layers):
        rows = layers["multipolygons"].to_pylist()
        assert [(r["osm_id"], r["osm_way_id"]) for r in rows] == \
            [("1", None), ("5", None), (None, "8")]
        assert rows[0]["type"] == "multipolygon"
        assert rows[0]["natural"] == "forest"
        # old-style relation 5 inherits the outer way's tags
        assert rows[1]["natural"] == "wood"
        assert rows[2]["name"] == "standalone_polygon"
        g = W.loads(rows[0]["wkb"])
        assert g.type_name == "MultiPolygon"
        assert len(g.parts) == 1
        assert len(g.parts[0].rings) == 2  # outer + inner hole
        outer = g.parts[0].rings[0]
        assert outer[:, 0].min() == 2.0 and outer[:, 0].max() == 3.0
        inner = g.parts[0].rings[1]
        assert inner[:, 0].min() == pytest.approx(2.1)

    def test_multilinestrings(self, layers):
        rows = layers["multilinestrings"].to_pylist()
        assert len(rows) == 1
        assert rows[0]["osm_id"] == "3"
        assert rows[0]["type"] == "route"
        g = W.loads(rows[0]["wkb"])
        assert g.type_name == "MultiLineString"
        assert [tuple(c) for c in g.parts[0].coords] == \
            [(2.0, 49.0), (3.0, 50.0)]

    def test_other_relations(self, layers):
        rows = layers["other_relations"].to_pylist()
        assert len(rows) == 1
        assert rows[0]["osm_id"] == "4"
        assert rows[0]["type"] == "other_type"
        g = W.loads(rows[0]["wkb"])
        assert g.type_name == "GeometryCollection"
        assert g.parts[0].type_name == "Point"
        assert g.parts[1].type_name == "LineString"


class TestOsmVariants:
    def test_uncompressed_pbf(self):
        for name in ("test_uncompressed_dense_false.pbf",
                     "test_uncompressed_dense_true_nometadata.pbf"):
            L = read_osm_layers(f"{D}/{name}")
            assert len(L["points"]) == 1
            assert L["points"]["osm_id"][0].as_py() == "3"

    def test_base64_pbf(self):
        L = read_osm_layers(f"{D}/base-64.osm.pbf")
        total = sum(len(t) for t in L.values())
        assert total > 0

    def test_dispatch(self):
        from gdal_ray.sources.drivers import read_vector
        t = read_vector(f"{D}/test.pbf")
        assert t["osm_id"][0].as_py() == "3"
        t2 = read_vector(f"{D}/test.osm")
        assert t2["osm_id"][0].as_py() == "3"
