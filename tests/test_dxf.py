"""DXF driver — WKT parity with the reference's own expectations
(autotest/ogr/ogr_dxf.py) on its fixture files."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.dxf import read_dxf_table

D = "/root/reference/autotest/ogr/data/dxf/"


def _geom(t, i):
    return W.loads(t["wkb"][i].as_py())


class TestAssorted:
    def test_entity_order_and_anchors(self):
        t = read_dxf_table(D + "assorted.dxf")
        # ogr_dxf.py:75-83 first feature is the ellipse on layer "0"
        assert t["SubClasses"][0].as_py() == "AcDbEntity:AcDbEllipse"
        assert t["Layer"][0].as_py() == "0"
        # ogr_dxf.py:160 POINT (83.5 160.0)
        g = _geom(t, 2)
        assert g.geom_type == W.POINT
        assert tuple(g.coords[0]) == (83.5, 160.0)
        # ogr_dxf.py:177 LINESTRING (97.0 159.5, 108.5 132.25)
        g = _geom(t, 3)
        assert g.geom_type == W.LINESTRING
        assert np.array_equal(g.coords, [[97.0, 159.5], [108.5, 132.25]])
        # ogr_dxf.py:196 MTEXT anchor POINT (84 126)
        g = _geom(t, 4)
        assert g.geom_type == W.POINT
        assert tuple(g.coords[0]) == (84.0, 126.0)
        # GDAL reports 22 features because it renders the three
        # DIMENSION entities on the fly (no pre-built *D block in this
        # file); the entity subset here yields the 14 concrete ones
        assert t.num_rows == 14

    def test_field_schema(self):
        t = read_dxf_table(D + "assorted.dxf")
        for f in ("Layer", "SubClasses", "Linetype", "EntityHandle",
                  "Text", "PaperSpace"):
            assert f in t.column_names   # ogr_dxf.py:58 six fields


class TestEntitiesOnly:
    def test_points_exact(self):
        # a DXF with no header/tables sections (ogr_dxf.py:410-421)
        t = read_dxf_table(D + "entities_only.dxf")
        assert tuple(_geom(t, 0).coords[0]) == (672500.0, 242000.0)
        assert tuple(_geom(t, 1).coords[0]) == (672750.0, 242000.0)


class TestEntityKinds:
    def test_circle_closed_linestring(self):
        t = read_dxf_table(D + "circle.dxf")
        g = _geom(t, 0)
        assert g.geom_type == W.LINESTRING
        assert np.allclose(g.coords[0], g.coords[-1])
        # all points equidistant from the bbox center
        c = (g.coords.min(axis=0) + g.coords.max(axis=0)) / 2
        r = np.hypot(*(g.coords - c).T)
        assert np.allclose(r, r[0], rtol=1e-6)

    def test_solid_polygon(self):
        t = read_dxf_table(D + "solid.dxf")
        g = _geom(t, 0)
        assert g.geom_type == W.POLYGON
        assert len(g.rings[0]) == 5          # 4 corners closed

    def test_spline(self):
        t = read_dxf_table(D + "spline_qcad.dxf")
        g = _geom(t, 0)
        assert g.geom_type == W.LINESTRING and len(g.coords) >= 20

    def test_bulge_polyline(self):
        t = read_dxf_table(D + "closed_polyline_with_bulge.dxf")
        g = _geom(t, 0)
        assert g.geom_type == W.POLYGON
        assert len(g.rings[0]) > 10          # bulges discretized

    def test_insert_expansion(self):
        t = read_dxf_table(D + "insert_only.dxf")
        assert t.num_rows >= 4               # block content expanded

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(D + "entities_only.dxf").num_rows == 2


class TestDxfWriter:
    def test_roundtrip_all_shape_classes(self, tmp_path):
        """write_dxf (HATCH boundary paths) → read → containment ring
        reassembly reproduces every polygons_table shape class
        exactly; category rides the Layer code."""
        from gdal_ray.core import wkb as W
        from gdal_ray.core.geom import area
        from gdal_ray.sources.dxf import read_dxf_table, write_dxf
        from gdal_ray.sources.vector import polygons_table

        t = polygons_table(25)
        p = str(tmp_path / "rt.dxf")
        assert write_dxf(t, p, layer_col="category") == 25
        back = read_dxf_table(p)
        assert back.num_rows == 25
        for i in range(25):
            a0 = area(W.loads(t["wkb"][i].as_py()))
            a1 = area(W.loads(back["wkb"][i].as_py()))
            assert a0 == a1, i
        assert back["Layer"].to_pylist() == t["category"].to_pylist()

    def test_points_and_lines(self, tmp_path):
        import numpy as np
        import pyarrow as pa
        from gdal_ray.core import wkb as W
        from gdal_ray.sources.dxf import read_dxf_table, write_dxf

        geoms = [W.point(4.5, 7.125),
                 W.linestring([(0, 0), (3, 4), (10, -2)])]
        t = pa.table({"wkb": pa.array([W.dumps(g) for g in geoms])})
        p = str(tmp_path / "pl.dxf")
        write_dxf(t, p)
        back = read_dxf_table(p)
        g0 = W.loads(back["wkb"][0].as_py())
        assert (g0.coords[0, 0], g0.coords[0, 1]) == (4.5, 7.125)
        g1 = W.loads(back["wkb"][1].as_py())
        np.testing.assert_array_equal(g1.coords,
                                      [(0, 0), (3, 4), (10, -2)])

    def test_unsupported_type_raises(self, tmp_path):
        import pyarrow as pa
        import pytest
        from gdal_ray.core import wkb as W
        from gdal_ray.sources.dxf import write_dxf
        t = pa.table({"wkb": pa.array(
            [W.dumps(W.multipoint([(0, 0), (1, 1)]))])})
        with pytest.raises(ValueError, match="unsupported geometry"):
            write_dxf(t, str(tmp_path / "x.dxf"))
