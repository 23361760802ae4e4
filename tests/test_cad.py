"""CAD (DWG R2000) driver — parity with the reference's ogr_cad.py
autotest fixtures (autotest/ogr/data/cad)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.cad import (DwgFile, list_dwg_layers,
                                  read_dwg_table)

D = "/root/reference/autotest/ogr/data/cad/"


class TestEllipse:
    def test_single_layer_single_feature(self):
        # test_ogr_cad_2
        assert list_dwg_layers(D + "ellipse_r2000.dwg") == ["0"]
        t = read_dwg_table(D + "ellipse_r2000.dwg")
        assert t.num_rows == 1
        assert t["cadgeom_type"][0].as_py() == "CADEllipse"
        assert t["thickness"][0].as_py() == 0
        assert t["extentity_data"][0].as_py() is None
        g = W.loads(t["wkb"][0].as_py())
        assert g.geom_type == W.LINESTRING
        assert len(g.coords) > 2


class TestTripleCircles:
    # test_ogr_cad_3: 3 layers, 1 circle each, thickness 1.2/0.8/1.8
    def test_layers(self):
        assert list_dwg_layers(D + "triple_circles_r2000.dwg") == \
            ["0", "1", "2"]

    @pytest.mark.parametrize("layer,thickness",
                             [("0", 1.2), ("1", 0.8), ("2", 1.8)])
    def test_each_layer(self, layer, thickness):
        t = read_dwg_table(D + "triple_circles_r2000.dwg", layer=layer)
        assert t.num_rows == 1
        assert t["cadgeom_type"][0].as_py() == "CADCircle"
        assert t["thickness"][0].as_py() == pytest.approx(thickness)
        # stored WKB is a CircularString (wkbCircularString = 8);
        # W.loads linearizes it on read by design
        raw = t["wkb"][0].as_py()
        assert raw[1:5] == (8).to_bytes(4, "little")


class TestSimpleGeoms:
    def test_point2d(self):
        # test_ogr_cad_4: POINT (50 50 0)
        t = read_dwg_table(D + "point2d_r2000.dwg")
        assert t.num_rows == 1
        g = W.loads(t["wkb"][0].as_py())
        assert g.type_name == "Point"
        assert tuple(g.coords[0]) == (50.0, 50.0)

    def test_line(self):
        # test_ogr_cad_5: LINESTRING (50 50 0,100 100 0)
        t = read_dwg_table(D + "line_r2000.dwg")
        g = W.loads(t["wkb"][0].as_py())
        assert np.array_equal(g.coords, [[50, 50], [100, 100]])


class TestText:
    # test_ogr_cad_6/7/8: text, mtext, attdef anchors + label text
    def test_text_mtext_attdef(self):
        t = read_dwg_table(D + "text_mtext_attdef_r2000.dwg")
        assert t.num_rows == 3
        types = t["cadgeom_type"].to_pylist()
        assert types == ["CADText", "CADMText", "CADAttdef"]
        texts = t["text"].to_pylist()
        assert texts == ["Русские буквы", "English letters", "TESTTAG"]
        anchors = [W.loads(b.as_py()).coords[0]
                   for b in t["wkb"]]
        assert anchors[0] == pytest.approx((0.7413, 1.7794), abs=1e-4)
        assert anchors[1] == pytest.approx((2.8139, 5.7963), abs=1e-4)
        assert anchors[2] == pytest.approx(
            (4.98953601938918, 2.62670161690571), abs=1e-12)

    def test_colors_white(self):
        t = read_dwg_table(D + "text_mtext_attdef_r2000.dwg")
        assert set(t["color"].to_pylist()) == {"#FFFFFFFF"}


class TestVersionGate:
    def test_unsupported_version_raises(self):
        # test_ogr_cad_9
        with pytest.raises(ValueError, match="does not support this "
                                             "version"):
            DwgFile(D + "AC1018_signature.dwg")

    def test_attribs_is_r2013_and_refused(self):
        # attribs.dwg is AC1027 (R2013) — outside the R2000 subset the
        # reference's libopencad decodes too
        with pytest.raises(ValueError, match="AC1027"):
            read_dwg_table(D + "attribs.dwg")

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(D + "line_r2000.dwg").num_rows == 1
