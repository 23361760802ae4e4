"""GPX + GML vector drivers — golden parity with the reference's own
fixtures (autotest/ogr/ogr_gpx.py, ogr_gml.py)."""

import os
import tempfile

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.gml import read_gml_table
from gdal_ray.sources.gpx import LAYERS, read_gpx_table, write_gpx

GPX = "/root/reference/autotest/ogr/data/gpx/test.gpx"
GML = "/root/reference/autotest/ogr/data/gml/"


class TestGpx:
    def test_five_layers_feature_counts(self):
        # ogr_gpx.py:39-240: 2 waypoints, 2 routes (one empty),
        # 3 tracks (two empty), 3 route_points, 4 track_points
        counts = {lyr: read_gpx_table(GPX, lyr).num_rows for lyr in LAYERS}
        assert counts == {"waypoints": 2, "routes": 2, "tracks": 3,
                          "route_points": 3, "track_points": 4}

    def test_waypoint_fields(self):
        t = read_gpx_table(GPX, "waypoints")
        assert t["ele"].to_pylist() == [2.0, None]       # ogr_gpx.py:47
        assert t["name"].to_pylist() == ["waypoint name", None]
        assert t["link1_href"].to_pylist() == ["href", None]
        assert t["link2_type"].to_pylist() == ["type2", None]
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.POINT
        assert tuple(g.coords[0]) == (1.0, 0.0)          # lon, lat

    def test_route_geometry_and_empty(self):
        t = read_gpx_table(GPX, "routes")
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.LINESTRING and len(g.coords) == 3
        assert tuple(g.coords[0]) == (6.0, 5.0)
        empty = W.loads(t["wkb"][1].as_py())
        assert empty.geom_type == W.LINESTRING and len(empty.coords) == 0
        assert t["name"].to_pylist() == ["route name", "empty route"]

    def test_track_multilinestring(self):
        t = read_gpx_table(GPX, "tracks")
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.MULTILINESTRING and len(g.parts) == 2
        assert [len(p.coords) for p in g.parts] == [2, 2]

    def test_track_points_parent_ids(self):
        t = read_gpx_table(GPX, "track_points")
        assert t["track_fid"].to_pylist() == [0, 0, 0, 0]
        assert t["track_seg_id"].to_pylist() == [0, 0, 1, 1]
        assert t["track_seg_point_id"].to_pylist() == [0, 1, 0, 1]

    def test_roundtrip(self):
        d = tempfile.mkdtemp(prefix="gpx_", dir="/tmp")
        for layer in ("waypoints", "routes", "tracks"):
            src = read_gpx_table(GPX, layer)
            p = os.path.join(d, f"{layer}.gpx")
            write_gpx(src, p)
            back = read_gpx_table(p, layer)
            assert back.num_rows == src.num_rows
            assert back["name"].to_pylist() == src["name"].to_pylist()
            for a, b in zip(src["wkb"].to_pylist(),
                            back["wkb"].to_pylist()):
                ga, gb = W.loads(a), W.loads(b)
                assert ga.geom_type == gb.geom_type
                pa_, pb_ = W._all_coords(ga), W._all_coords(gb)
                assert np.allclose(pa_, pb_)

    def test_polygon_rejected(self):
        import pyarrow as pa
        t = pa.table({"wkb": pa.array(
            [W.dumps(W.box(0, 0, 1, 1))], pa.binary())})
        with pytest.raises(ValueError, match="cannot store"):
            write_gpx(t, "/tmp/bad.gpx")

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(GPX).num_rows == 2     # waypoints default


class TestGml:
    def test_ionic_wfs_polygon(self):
        # ogr_gml.py:93-116: one GEM feature, Name=Aartselaar,
        # 39-point polygon starting at (44038, 511549)
        t = read_gml_table(GML + "ionic_wfs.gml")
        assert t.num_rows == 1
        assert t["Name"].to_pylist() == ["Aartselaar"]
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.POLYGON
        assert len(g.rings[0]) == 39
        assert tuple(g.rings[0][0]) == (44038.0, 511549.0)

    def test_archsites_wfs11(self):
        # GML3 featureMembers + gml:pos
        t = read_gml_table(GML + "archsites.gml")
        assert t.num_rows == 1
        assert t["str1"].to_pylist() == ["Signature Rock"]
        assert t["cat"].to_pylist() == [1]            # int-sniffed
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.POINT
        assert tuple(g.coords[0]) == (593493.0, 4914730.0)
        assert t["gml_id"].to_pylist() == ["archsites.3951"]

    def test_rnf_gml2_coordinates_attrs(self):
        # cs="," ts=" " decimal="." coordinate grammar
        t = read_gml_table(GML + "rnf_eg.gml")
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.LINESTRING and len(g.coords) == 8
        assert t["name"].to_pylist() == ["Trans-Canada - RTE 1"]
        assert t["ngd_id"].to_pylist() == [817792]

    def test_bom_and_crlf(self):
        # UTF-8 BOM + CRLF + application-schema member name
        t = read_gml_table(GML + "bom.gml")
        assert t.num_rows == 3
        assert set(t["layer"].to_pylist()) == {"CartographicText"}

    def test_citygml_multisurface(self):
        t = read_gml_table(GML + "citygml.gml")
        assert t.num_rows == 1
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.MULTIPOLYGON

    def test_multipolygon_choice(self):
        t = read_gml_table(GML + "choicepolygonmultipolygon.gml")
        kinds = [W.loads(b.as_py()).type_name for b in t["wkb"]]
        assert kinds == ["Polygon", "MultiPolygon"]

    def test_layer_filter(self):
        t = read_gml_table(GML + "ionic_wfs.gml", layer="NOPE")
        assert t.num_rows == 0

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(GML + "ionic_wfs.gml").num_rows == 1


class TestGmlRobustness:
    def test_inverted_coordinate_separators(self):
        # ogr_gml_55: spaces inside tuples, commas between — the
        # reference tolerates the swap
        t = read_gml_table(GML + "ogr_gml_55.gml")
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.POLYGON and len(g.rings[0]) == 5
        assert t["myAttr"].to_pylist() == [12]

    def test_fuzzed_xml_fails_fast(self):
        # billionlaugh + huge_* + ossfuzz fixtures: ValueError, never a
        # hang or a raw parser exception
        import glob
        import pytest as _pytest
        for f in ("billionlaugh.gml", "huge_attribute_start.gml",
                  "huge_geom_end.gml", "ossfuzz_487160964.gml"):
            with _pytest.raises(ValueError):
                read_gml_table(GML + f)

    def test_full_fixture_sweep_no_crashes(self):
        import glob
        ok = err = 0
        for p in sorted(glob.glob(GML + "*.gml"))[:60]:
            try:
                read_gml_table(p)
                ok += 1
            except ValueError:
                err += 1
        assert ok >= 45 and err <= 10


class TestGmlWriter:
    def test_roundtrip_all_shape_classes(self, tmp_path):
        """write_gml → read_gml_table is lossless for every
        polygons_table shape class (holes, multiparts) and carries
        the attribute columns (ogr2ogr -f GML symmetry)."""
        import numpy as np
        from gdal_ray.core import wkb as W
        from gdal_ray.core.geom import area
        from gdal_ray.sources.gml import read_gml_table, write_gml
        from gdal_ray.sources.vector import polygons_table

        t = polygons_table(25)
        p = str(tmp_path / "rt.gml")
        assert write_gml(t, p) == 25
        back = read_gml_table(p)
        assert back.num_rows == 25
        for i in range(25):
            a0 = area(W.loads(t["wkb"][i].as_py()))
            a1 = area(W.loads(back["wkb"][i].as_py()))
            assert a0 == a1, i               # repr() coords: exact
        assert back["category"].to_pylist() == t["category"].to_pylist()
        assert back["name"].to_pylist() == t["name"].to_pylist()

    def test_point_line_multi(self, tmp_path):
        import numpy as np
        import pyarrow as pa
        from gdal_ray.core import wkb as W
        from gdal_ray.sources.gml import read_gml_table, write_gml

        geoms = [W.point(1.5, -2.25),
                 W.linestring([(0, 0), (10, 5), (20, 0)]),
                 W.multipoint([(1, 2), (3, 4)]),
                 W.Geometry(W.MULTILINESTRING,
                            parts=[W.linestring([(0, 0), (1, 1)]),
                                   W.linestring([(2, 2), (3, 3)])])]
        t = pa.table({"wkb": pa.array([W.dumps(g) for g in geoms],
                                      pa.binary()),
                      "k": pa.array(range(4), pa.int64())})
        p = str(tmp_path / "mix.gml")
        write_gml(t, p)
        back = read_gml_table(p)
        for i, g in enumerate(geoms):
            got = W.loads(back["wkb"][i].as_py())
            assert got.geom_type == g.geom_type
            np.testing.assert_array_equal(np.asarray(got.envelope()),
                                          np.asarray(g.envelope()))

    def test_xml_escaping(self, tmp_path):
        import pyarrow as pa
        from gdal_ray.core import wkb as W
        from gdal_ray.sources.gml import read_gml_table, write_gml
        t = pa.table({"wkb": pa.array([W.dumps(W.point(0, 0))]),
                      "label": pa.array(["a<b>&c"], pa.string())})
        p = str(tmp_path / "esc.gml")
        write_gml(t, p)
        assert read_gml_table(p)["label"][0].as_py() == "a<b>&c"
