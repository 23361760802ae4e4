"""PDF vector layers — parity with the reference's ogr_pdf.py fixture
expectations plus writer/reader roundtrip with typed attributes."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.pdfvec import (read_pdf_layers,
                                     read_pdf_vector_table,
                                     write_pdf_vector)

D = "/root/reference/autotest/ogr/data/pdf/"


class TestFixtures:
    def test_drawing_8_features(self):
        # test_ogr_pdf_5 (OGR_PDF_READ_NON_STRUCTURED=YES)
        L = read_pdf_layers(D + "drawing.pdf", non_structured=True)
        assert sum(t.num_rows for t in L.values()) == 8

    def test_recursive_resources_unnamed_layer(self):
        # test_ogr_pdf_recursive_resources_and_oc_name_and_empty_ocg_name
        L = read_pdf_layers(
            D + "recursive_resources_and_oc_name_and_empty_ocg_name.pdf")
        assert list(L) == ["unnamed"]
        assert L["unnamed"].num_rows == 4

    def test_bezier_polygon_with_hole(self):
        # test_ogr_pdf_bezier_curve_and_polygon_holes: feature 2 is a
        # polygon with one hole; coordinates follow the reference's
        # 10-step bezier sampling exactly
        t = read_pdf_vector_table(
            D + "bezier_curve_and_polygon_holes.pdf",
            non_structured=True)
        g = W.loads(t["wkb"][2].as_py())
        assert g.type_name == "Polygon"
        assert len(g.rings) == 2
        assert g.rings[0][0] == pytest.approx(
            (8444.60213541667, 6332.05489588889), abs=1e-9)
        assert g.rings[0][1] == pytest.approx(
            (8444.71174575, 6331.98745444444), abs=1e-9)
        # hole ring is present and inside the shell envelope
        sh = np.asarray(g.rings[0])
        hl = np.asarray(g.rings[1])
        assert hl[:, 0].min() >= sh[:, 0].min()
        assert hl[:, 0].max() <= sh[:, 0].max()


class TestRoundtrip:
    def _layer(self):
        geoms = [
            W.point(2, 49),
            W.linestring([(2, 48), (3, 50)]),
            W.polygon([(2, 48), (2, 49), (3, 49), (3, 48), (2, 48)]),
            W.polygon([(2, 48), (2, 49), (3, 49), (3, 48), (2, 48)],
                      [[(2.25, 48.25), (2.25, 48.75), (2.75, 48.75),
                        (2.75, 48.25), (2.25, 48.25)]]),
        ]
        envs = np.array([g.envelope() for g in geoms])
        return pa.table({
            "fid": pa.array(range(4), pa.int64()),
            "strfield": ["super tex !", "str", None, None],
            "intfield": pa.array([None, 1, None, None], pa.int64()),
            "realfield": pa.array([None, 2.34, None, None],
                                  pa.float64()),
            "wkb": pa.array([W.dumps(g) for g in geoms], pa.binary()),
            "minx": envs[:, 0], "miny": envs[:, 1],
            "maxx": envs[:, 2], "maxy": envs[:, 3]})

    def test_geometry_and_attributes(self, tmp_path):
        # mirrors test_ogr_pdf_1's feature set
        p = str(tmp_path / "vec.pdf")
        write_pdf_vector({"first_layer": self._layer()}, p,
                         epsg=4326, crs="EPSG:4326")
        L = read_pdf_layers(p)
        assert list(L) == ["first_layer"]
        t = L["first_layer"]
        assert t.num_rows == 4
        assert t["strfield"].to_pylist() == \
            ["super tex !", "str", None, None]
        assert t["intfield"].to_pylist() == [None, 1, None, None]
        assert t["intfield"].type == "int64"
        assert t["realfield"].to_pylist() == [None, 2.34, None, None]
        assert t["realfield"].type == "double"
        types = [W.loads(b.as_py()).type_name for b in t["wkb"]]
        assert types == ["Point", "LineString", "Polygon", "Polygon"]
        for i in range(4):
            got = W.loads(t["wkb"][i].as_py()).envelope()
            exp = W.loads(self._layer()["wkb"][i].as_py()).envelope()
            assert got == pytest.approx(exp, abs=1e-6)

    def test_polygon_hole_survives(self, tmp_path):
        p = str(tmp_path / "vec2.pdf")
        write_pdf_vector({"lyr": self._layer()}, p, epsg=4326,
                         crs="EPSG:4326")
        t = read_pdf_layers(p)["lyr"]
        g = W.loads(t["wkb"][3].as_py())
        assert g.type_name == "Polygon"
        assert len(g.rings) == 2

    def test_multiple_layers(self, tmp_path):
        p = str(tmp_path / "vec3.pdf")
        a = self._layer()
        write_pdf_vector({"A": a, "B": a}, p, epsg=4326,
                         crs="EPSG:4326")
        L = read_pdf_layers(p)
        assert sorted(L) == ["A", "B"]
        assert L["A"].num_rows == L["B"].num_rows == 4
