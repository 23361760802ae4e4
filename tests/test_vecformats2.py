"""DGN v7 + AVCE00 readers — behavior goldens from
autotest/ogr/{ogr_dgn,ogr_avc}.py."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.avce00 import read_e00_layers
from gdal_ray.sources.dgn import read_dgn_table

D = "/root/reference/autotest/ogr/data"


class TestDgn:
    def test_smalltest(self):
        t = read_dgn_table(f"{D}/dgn/smalltest.dgn")
        rows = t.to_pylist()
        # feature 1: text element
        assert rows[0]["Type"] == 17 and rows[0]["Level"] == 1
        assert rows[0]["Text"] == "Demo Text"
        g = W.loads(rows[0]["wkb"])
        assert tuple(np.round(g.coords[0], 8)) == (0.7365, 4.2198)
        # feature 2: circle -> stroked linestring
        assert rows[1]["Type"] == 15 and rows[1]["Level"] == 2
        g = W.loads(rows[1]["wkb"])
        assert g.type_name == "LineString"
        assert len(g.coords) >= 15
        e = g.envelope()
        assert 0.328593 <= e[0] <= 0.328594
        assert 9.68780 <= e[2] <= 9.68781
        assert -0.09611 <= e[1] <= -0.09610
        assert 9.26310 <= e[3] <= 9.26311
        # feature 3: filled shape
        assert rows[2]["Type"] == 6 and rows[2]["Level"] == 2
        assert rows[2]["ColorIndex"] == 83
        g = W.loads(rows[2]["wkb"])
        want = [(4.5355, 3.317), (4.3832, 2.6517), (4.9441, 2.5235),
                (4.832, 3.3331), (4.5355, 3.317)]
        assert np.allclose(g.rings[0], want, atol=1e-8)

    def test_dispatch(self):
        from gdal_ray.sources.drivers import read_vector
        t = read_vector(f"{D}/dgn/smalltest.dgn")
        assert t["Text"][0].as_py() == "Demo Text"


class TestAvcE00:
    def test_arc_layer(self):
        L = read_e00_layers(f"{D}/avc/test.e00")
        arc = L["ARC"]
        assert arc["UserID"].to_pylist() == [1, 2, 3, 4, 5, 6, 7]
        g = W.loads(arc["wkb"][0].as_py())
        want = [(340099.875, 4100200.0), (340400.0625, 4100399.5),
                (340900.125, 4100200.0), (340700.03125, 4100199.5)]
        assert np.allclose(g.coords, want, atol=0.01)
        assert arc.schema.metadata and b"UTM" in arc.schema.metadata[b"crs"]

    def test_points_with_pat_join(self):
        L = read_e00_layers(f"{D}/avc/testpoint.e00")
        lab = L["LAB"]
        assert len(lab) == 80
        fields = [c for c in lab.column_names
                  if c not in ("fid", "wkb", "minx", "miny", "maxx",
                               "maxy")]
        assert len(fields) == 7
        last = lab.to_pylist()[-1]
        assert last["ValueId"] == 80
        assert last["WELLS-ID"] == 80

    def test_polygons(self):
        L = read_e00_layers(f"{D}/avc/testpoly.e00")
        pal = L["PAL"]
        assert len(pal) == 3
        last = pal.to_pylist()[-1]
        assert last["ArcIds"] == [-4, -5]
        assert last["AREA"] == pytest.approx(9939.059, abs=1e-3)
        g = W.loads(last["wkb"])
        assert g.type_name == "Polygon"

    def test_compressed_rejected(self):
        with pytest.raises(ValueError):
            read_e00_layers(f"{D}/avc/compressed.e00")


class TestVdvIdf:
    def test_idf_layers(self):
        from gdal_ray.sources.vdv import read_vdv_layers
        L = read_vdv_layers(f"{D}/vdv/test.idf")
        n = L["Node"].to_pylist()[0]
        assert n["NODE_ID"] == 1 and n["foo"] == "U"
        assert tuple(W.loads(n["wkb"]).coords[0]) == (2.0, 49.0)
        g = W.loads(L["Link"]["wkb"][0].as_py())
        assert [tuple(c) for c in g.coords] == \
            [(2.0, 49.0), (2.5, 49.5), (2.7, 49.7), (3.0, 50.0)]
        g = W.loads(L["LinkCoordinate"]["wkb"][0].as_py())
        assert tuple(g.coords[0]) == (2.5, 49.5)
        assert L["Other"]["FOO"][0].as_py() == 1

    def test_idf_3d(self):
        from gdal_ray.sources.vdv import read_vdv_layers
        L = read_vdv_layers(f"{D}/vdv/test_3d.idf")
        assert len(L["Node"]) >= 1

    def test_dispatch(self):
        from gdal_ray.sources.drivers import read_vector
        t = read_vector(f"{D}/vdv/test.idf")
        assert t["NODE_ID"][0].as_py() == 1
