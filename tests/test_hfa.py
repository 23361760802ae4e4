"""Erdas Imagine HFA reader (codecs/hfa.py) — reference-fixture
goldens from the reference's own autotest (gdrivers/hfa.py):
int.img 6691, float.img 23529, spill.img 1631 + overview 340,
small1bit overview 4247 (bit2grayscale .rrd), i8u_c_i.img compressed
block decode verified per-value against the STATISTICS_HISTOBINVALUES
golden, plus geotransform / nodata / stats metadata checks."""

import numpy as np

from gdal_ray.codecs.hfa import decode_hfa, open_hfa, read_hfa_overviews
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/hfa"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestBandRead:
    def test_int_img(self):
        px, gt, nd, meta = decode_hfa(f"{D}/int.img")
        assert px.shape == (201, 201) and px.dtype == np.int32
        assert cs(px) == 6691  # autotest hfa.py test_hfa_int_read
        assert gt == (135362.5, 100.0, 0.0, 7122712.5, 0.0, -100.0)

    def test_float_img(self):
        px, gt, nd, meta = decode_hfa(f"{D}/float.img")
        assert px.dtype == np.float32
        assert cs(px) == 23529  # test_hfa_float_read
        # test_hfa_float_stats_1 golden statistics block
        assert abs(meta["statistics_minimum"] - 40.91858291626) < 1e-6
        assert abs(meta["statistics_maximum"] - 41.134323120117) < 1e-5

    def test_spill_external_ige(self):
        px, gt, nd, meta = decode_hfa(f"{D}/spill.img")
        assert cs(px) == 1631  # test_hfa_rde_overviews band golden

    def test_spill_rrd_overview(self):
        ovs = read_hfa_overviews(f"{D}/spill.img")
        assert [cs(o.pixels) for o in ovs] == [340]

    def test_small1bit_band_and_overview(self):
        px, gt, nd, meta = decode_hfa(f"{D}/small1bit.img")
        assert px.shape == (300, 300)
        assert set(np.unique(px)) <= {0, 1}
        ovs = read_hfa_overviews(f"{D}/small1bit.img")
        assert [cs(o.pixels) for o in ovs] == [4247]  # bit2grayscale

    def test_compressed_histogram_exact(self):
        # test_hfa_unique_values_hist: per-value pixel counts of the
        # RLE-compressed band must match the stored histogram exactly
        px, _, _, _ = decode_hfa(f"{D}/i8u_c_i.img")
        expected = "12603|1|0|0|45|1|0|0|0|0|656|177|0|0|5026|1062|0|0|2|0|0|0|0|0|0|0|0|0|0|0|0|0|75|1|0|0|207|158|0|0|8|34|0|0|0|0|538|57|0|10|214|20|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|1|31|0|0|9|625|67|0|0|118|738|117|3004|1499|491|187|1272|513|1|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|16|3|0|0|283|123|5|1931|835|357|332|944|451|80|40|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|12|5|0|0|535|1029|118|0|33|246|342|0|0|10|8|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|169|439|0|0|6|990|329|0|0|120|295|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|164|42|0|0|570|966|0|0|18|152|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|45|106|0|0|16|16517|"  # noqa: E501
        exp = np.array([int(x) for x in expected.rstrip("|").split("|")])
        got = np.bincount(px.ravel().astype(np.uint8), minlength=256)
        assert np.array_equal(exp, got)

    def test_87test_nodata(self):
        px, gt, nd, meta = decode_hfa(f"{D}/87test.img")
        assert nd == 0.0
        assert gt is not None and abs(gt[1] - 1252344.27142) < 1e-3


class TestTree:
    def test_entry_tree_and_fields(self):
        h = open_hfa(f"{D}/spill.img")
        names = [c.name for c in h.root.children()]
        assert "Layer_1" in names
        lyr = h.layers()[0]
        assert lyr.get("width") == 10 and lyr.get("height") == 15
        ext = lyr.child("ExternalRasterDMS")
        assert ext.get("fileName.string") == "spill.ige"

    def test_dispatcher_magic_routing(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/int.img")
        assert cs(px) == 6691 and meta.get("driver") == "HFA"

    def test_overview_via_read_raster(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/spill.img", overview=0)
        assert cs(px) == 340
