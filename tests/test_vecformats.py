"""GMT / JSON-FG / GeoRSS / JML vector readers — behavior goldens from
autotest/ogr/{ogr_gmt,ogr_jsonfg,ogr_georss,ogr_jml}.py."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W

D = "/root/reference/autotest/ogr/data"


def g_of(t, i):
    return W.loads(t["wkb"][i].as_py())


class TestGmt:
    def test_multilinestring(self):
        from gdal_ray.sources.gmtvec import read_gmt_table
        t = read_gmt_table(f"{D}/gmt/test_multi.gmt")
        assert len(t) == 2
        assert t["name"].to_pylist() == ["feature 1", "feature 2"]
        assert t["id"].to_pylist() == [1, 2]
        g = g_of(t, 0)
        assert g.type_name == "MultiLineString"
        assert [tuple(c) for c in g.parts[0].coords] == \
            [(175.0, -45.0), (176.0, -45.0)]
        assert [tuple(c) for c in g.parts[1].coords] == \
            [(180.0, -45.3), (179.0, -45.4)]
        g2 = g_of(t, 1)
        assert g2.parts[1].coords[0][0] == pytest.approx(180.1)
        assert t.schema.metadata[b"crs"] == b"EPSG:4326"

    def test_write_roundtrip(self, tmp_path):
        from gdal_ray.sources.gmtvec import read_gmt_table, write_gmt
        t = read_gmt_table(f"{D}/gmt/test_multi.gmt")
        out = str(tmp_path / "out.gmt")
        assert write_gmt(t, out) == 2
        t2 = read_gmt_table(out)
        assert t2["name"].to_pylist() == t["name"].to_pylist()
        assert t2["id"].to_pylist() == t["id"].to_pylist()
        for i in range(2):
            a, b = g_of(t, i), g_of(t2, i)
            assert a.type_name == b.type_name
            for pa_, pb in zip(a.parts, b.parts):
                assert np.allclose(pa_.coords, pb.coords)

    def test_write_polygon_holes(self, tmp_path):
        import pyarrow as pa
        from gdal_ray.sources.gmtvec import read_gmt_table, write_gmt
        g = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                      holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]])
        t = pa.table({"fid": pa.array([0], pa.int64()),
                      "name": pa.array(["p"], pa.string()),
                      "wkb": pa.array([W.dumps(g)], pa.binary())})
        out = str(tmp_path / "poly.gmt")
        write_gmt(t, out)
        t2 = read_gmt_table(out)
        g2 = g_of(t2, 0)
        assert g2.type_name == "Polygon"
        assert len(g2.rings) == 2


class TestJsonFg:
    def test_place_wins_over_geometry(self):
        from gdal_ray.sources.jsonfg import read_jsonfg_table
        t = read_jsonfg_table(f"{D}/jsonfg/crs_32631_fc_and_feat.json")
        assert len(t) == 1
        assert t.schema.metadata[b"crs"] == b"EPSG:32631"
        g = g_of(t, 0)
        assert tuple(g.coords[0]) == (500000.0, 4500000.0)

    def test_geometry_fallback(self):
        from gdal_ray.sources.jsonfg import read_jsonfg_table
        t = read_jsonfg_table(
            f"{D}/jsonfg/crs_32631_fc_geometry_null.json")
        assert len(t) >= 1

    def test_curve_types(self):
        # the WKB layer linearizes curves on load (GDAL's linear
        # fallback): a CircularString roundtrips as a densified
        # LineString through the arc's control points
        from gdal_ray.sources.jsonfg import read_jsonfg_table
        t = read_jsonfg_table(f"{D}/jsonfg/CircularString.json")
        g = g_of(t, 0)
        assert g.geom_type == W.LINESTRING
        assert len(g.coords) > 3  # densified arc, not the 3 controls
        assert tuple(g.coords[0]) == (2.5, 49.5)
        assert tuple(g.coords[-1]) == (4.5, 49.5)
        t = read_jsonfg_table(f"{D}/jsonfg/CompoundCurve.json")
        assert g_of(t, 0).geom_type == W.LINESTRING

    def test_coordrefsys_forms(self):
        from gdal_ray.sources.jsonfg import parse_coordrefsys
        assert parse_coordrefsys("[EPSG:32631]") == "EPSG:32631"
        assert parse_coordrefsys(
            "http://www.opengis.net/def/crs/EPSG/0/32631") == "EPSG:32631"
        assert parse_coordrefsys(
            {"type": "Reference", "href": "[EPSG:32631]"}) == "EPSG:32631"


class TestGeoRss:
    def test_simple(self):
        from gdal_ray.sources.georss import read_georss_table
        t = read_georss_table(f"{D}/georss/test_georss_simple.xml")
        assert len(t) == 4
        assert t["title"].to_pylist() == \
            ["A point", "A line", "A polygon", "A box"]
        assert t["pubDate"][0].as_py() == "2008/12/07 20:13:00+02"
        assert t["category"][0].as_py() == "First category"
        assert t["category_domain"][0].as_py() == "first_domain"
        assert t["category2"][0].as_py() == "Second category"
        assert t["category2_domain"][0].as_py() == "second_domain"
        g = g_of(t, 0)
        assert tuple(g.coords[0]) == (2.0, 49.0)
        g1 = g_of(t, 1)
        assert [tuple(c) for c in g1.coords] == \
            [(2.0, 48.0), (2.1, 48.1), (2.2, 48.0)]
        g2 = g_of(t, 2)
        assert g2.type_name == "Polygon"
        assert [tuple(c) for c in g2.rings[0]] == \
            [(2.0, 50.0), (2.1, 50.1), (2.2, 48.1), (2.1, 46.1),
             (2.0, 50.0)]
        g3 = g_of(t, 3)  # box -> polygon
        assert [tuple(c) for c in g3.rings[0]] == \
            [(2.0, 49.0), (2.0, 49.5), (2.2, 49.5), (2.2, 49.0),
             (2.0, 49.0)]

    def test_gml_variant(self):
        from gdal_ray.sources.georss import read_georss_table
        t = read_georss_table(f"{D}/georss/test_georss_gml.xml")
        assert len(t) == 4
        g = g_of(t, 0)
        assert tuple(g.coords[0]) == (2.0, 49.0)

    def test_atom(self):
        from gdal_ray.sources.georss import read_georss_table
        t = read_georss_table(f"{D}/georss/atom_rfc_sample.xml")
        assert len(t) >= 1
        assert "title" in t.column_names

    def test_write_roundtrip(self, tmp_path):
        from gdal_ray.sources.georss import (read_georss_table,
                                             write_georss)
        t = read_georss_table(f"{D}/georss/test_georss_simple.xml")
        out = str(tmp_path / "out.xml")
        write_georss(t, out)
        t2 = read_georss_table(out)
        assert t2["title"].to_pylist() == t["title"].to_pylist()
        assert tuple(g_of(t2, 0).coords[0]) == (2.0, 49.0)
        assert [tuple(c) for c in g_of(t2, 2).rings[0]] == \
            [tuple(c) for c in g_of(t, 2).rings[0]]


class TestJml:
    def test_read(self):
        from gdal_ray.sources.jml import read_jml_table
        t = read_jml_table(f"{D}/jml/test.jml")
        want_fields = ["first_property", "another_property", "objectAttr",
                       "attr2", "attr3", "int", "double", "date",
                       "datetime", "R_G_B", "not_ignored"]
        assert [c for c in t.column_names
                if c not in ("fid", "wkb", "minx", "miny", "maxx",
                             "maxy")] == want_fields
        r = t.to_pylist()[0]
        assert r["first_property"] == "even"
        assert r["another_property"] == "rouault"
        assert r["objectAttr"] == "foo"
        assert r["attr2"] == "bar"
        assert r["attr3"] == "baz"
        assert r["int"] == 123
        assert r["double"] == 1.23
        assert r["date"] == "2014/10/18 00:00:00"
        assert r["datetime"] == "2014/10/18 21:36:45"
        assert r["R_G_B"] == "0000FF"
        g = g_of(t, 0)
        assert g.type_name == "Polygon"
        r2 = t.to_pylist()[1]
        assert r2["datetime"] == "2014/10/18 21:36:45+02"
        assert r2["R_G_B"] == "FF00FF"
        g2 = g_of(t, 1)
        assert tuple(g2.coords[0]) == (-1.0, -1.0)

    def test_one_point(self):
        from gdal_ray.sources.jml import read_jml_table
        t = read_jml_table(f"{D}/jml/one_point_srid_4326.jml")
        assert len(t) == 1


class TestDispatch:
    def test_gmt_jml_pbf_pmtiles_registered(self):
        from gdal_ray.sources.drivers import read_vector
        assert len(read_vector(f"{D}/gmt/test_multi.gmt")) == 2
        assert len(read_vector(f"{D}/jml/test.jml")) >= 2
