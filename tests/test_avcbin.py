"""Arc/Info Binary Coverage driver — parity with the reference's
ogr_avc.py expectations, plus binary-vs-E00 twin equivalence (both
readers share the layer assembly, so the same coverage in both
encodings must produce identical tables)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.avcbin import read_avcbin_layers
from gdal_ray.sources.avce00 import read_e00_layers

D = "/root/reference/autotest/ogr/data/avc/"


def _ring_set(g):
    r = np.asarray(g.rings[0])[:-1]
    # rotation-invariant canonical form
    i = int(np.lexsort((r[:, 1], r[:, 0]))[0])
    return np.vstack([r[i:], r[:i]])


class TestArcLayer:
    def test_testavc_content(self):
        # test_ogr_avc_2 / check_content
        L = read_avcbin_layers(D + "testavc/testavc")
        arc = L["ARC"]
        assert arc["UserID"].to_pylist() == [1, 2, 3, 4, 5, 6, 7]
        g = W.loads(arc["wkb"][0].as_py())
        exp = np.array([[340099.875, 4100200.0], [340400.0625, 4100399.5],
                        [340900.125, 4100200.0],
                        [340700.03125, 4100199.5]])
        assert np.allclose(g.coords, exp, atol=0.01)
        assert arc.schema.metadata and b"crs" in arc.schema.metadata


class TestPointCoverage:
    # test_ogr_avc_4: 80 label points, PAT join, binary + E00 twins
    def test_binary(self):
        L = read_avcbin_layers(D + "testpointavc/testpointavc")
        lab = L["LAB"]
        assert lab.num_rows == 80
        assert lab["ValueId"][-1].as_py() == 80
        assert lab["TESTPOINTAVC-ID"][-1].as_py() == 80

    def test_e00_twin(self):
        L = read_e00_layers(D + "testpoint.e00")
        lab = L["LAB"]
        assert lab.num_rows == 80
        assert lab["ValueId"][-1].as_py() == 80
        assert lab["WELLS-ID"][-1].as_py() == 80

    def test_twin_geometry_equivalence(self):
        a = read_avcbin_layers(D + "testpointavc/testpointavc")["LAB"]
        b = read_e00_layers(D + "testpoint.e00")["LAB"]
        pa_ = [W.loads(x.as_py()).coords[0] for x in a["wkb"]]
        pb_ = [W.loads(x.as_py()).coords[0] for x in b["wkb"]]
        assert np.allclose(pa_, pb_, rtol=1e-6)


class TestPolyCoverage:
    # test_ogr_avc_5: PAL layer, 3 polygons, ArcIds + AREA + ring
    @pytest.mark.parametrize("loader,src", [
        (read_avcbin_layers, "testpolyavc/testpolyavc"),
        (read_e00_layers, "testpoly.e00")])
    def test_pal(self, loader, src):
        pal = loader(D + src)["PAL"]
        assert pal.num_rows == 3
        assert pal["ArcIds"][-1].as_py() == [-4, -5]
        assert pal["AREA"][-1].as_py() == pytest.approx(9939.059,
                                                        abs=1e-3)
        g = W.loads(pal["wkb"][-1].as_py())
        exp = W.loads(read_e00_layers(D + "testpoly.e00")["PAL"]
                      ["wkb"][-1].as_py())
        assert np.allclose(_ring_set(g), _ring_set(exp), atol=0.01)

    def test_expected_ring_vertices(self):
        pal = read_avcbin_layers(D + "testpolyavc/testpolyavc")["PAL"]
        g = W.loads(pal["wkb"][-1].as_py())
        exp = np.array([[340700.03125, 4100199.5], [340500.0, 4100199.75],
                        [340599.96875, 4100100.25]])
        got = _ring_set(g)
        expc = np.array(sorted(exp.tolist()))
        gotc = np.array(sorted(got.tolist()))
        assert np.allclose(gotc, expc, atol=1e-5)


class TestCompressedE00:
    def test_compressed_refused(self):
        # test_ogr_avc_3
        with pytest.raises(ValueError):
            read_e00_layers(D + "compressed.e00")
