"""Geospatial PDF driver — parity with the reference's pdf.py autotest
fixtures (autotest/gdrivers/data/pdf): ISO 32000 /VP georeferencing,
OGC Best Practice /LGIDict, multi-page subdataset reads, own-writer
roundtrip. Unlike the reference (which needs poppler/pdfium to get at
the pixels) the image XObjects are decoded directly, so pixel
checksums run everywhere."""

import numpy as np
import pytest

from gdal_ray.codecs.pdf import read_pdf, write_pdf
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/pdf/"


def _cs(px):
    return checksum(px if px.ndim == 2 else px[..., 0])


class TestISO32000:
    def test_byte_fixture(self):
        px, gt, nd, meta = read_pdf(D + "test_iso32000.pdf")
        assert px.shape == (20, 20)
        assert _cs(px) == 4672
        assert gt == pytest.approx((2.0, 0.05, 0.0, 49.0, 0.0, -0.05),
                                   abs=1e-12)
        assert meta["crs"] == "EPSG:4326"

    def test_two_pages(self):
        # byte.pdf + rgbsmall.pdf merged (PDF:n: subdataset analog)
        p = D + "byte_and_rgbsmall_2pages.pdf"
        px1, gt1, _, m1 = read_pdf(p, page=1)
        assert px1.shape == (20, 20)
        assert _cs(px1) == 4672
        assert m1["crs"] == "EPSG:26711"
        assert gt1 == pytest.approx((440720, 60, 0, 3751320, 0, -60),
                                    abs=0.1)
        px2, gt2, _, m2 = read_pdf(p, page=2)
        assert px2.shape == (50, 50, 3)
        # reference rgbsmall.tif band checksums
        assert [checksum(px2[..., i]) for i in range(3)] == \
            [21212, 21053, 21349]

    def test_ogc_bp_fixture(self):
        px, gt, nd, meta = read_pdf(D + "test_ogc_bp.pdf")
        assert _cs(px) == 4672
        assert gt == pytest.approx((2.0, 0.05, 0.0, 49.0, 0.0, -0.05),
                                   abs=1e-12)


class TestAdobeStyle:
    def test_geotransform_at_dpi200(self):
        # test_pdf_1: GDAL_PDF_DPI=200; non-pdfium expected values
        px, gt, nd, meta = read_pdf(D + "adobe_style_geospatial.pdf",
                                    dpi=200)
        assert px.shape[:2] == (2200, 1700)
        exp = (333274.61654367246, 31.764802242655662, 0.0,
               4940391.7593506984, 0.0, -31.794745501708238)
        assert gt == pytest.approx(exp, abs=1e-6)
        assert "UTM_Zone_20N" in meta["crs"]

    def test_neatline(self):
        _, _, _, meta = read_pdf(D + "adobe_style_geospatial.pdf",
                                 dpi=200)
        neat = np.asarray(meta["neatline"])
        exp = np.array([
            (338304.150125828920864, 4896673.639421294443309),
            (338304.177293475600891, 4933414.799376524984837),
            (382774.271384406310972, 4933414.546264361590147),
            (382774.767329963855445, 4896674.273581005632877),
            (338304.150125828920864, 4896673.639421294443309)])
        assert neat.shape == exp.shape
        assert np.allclose(neat, exp, atol=1e-3)


class TestDegenerate:
    @pytest.mark.parametrize("name", ["missing_stream.pdf",
                                      "missing_resources.pdf",
                                      "missing_contents.pdf"])
    def test_broken_fixtures_do_not_crash(self, name):
        try:
            px, gt, nd, meta = read_pdf(D + name)
            assert px.ndim in (2, 3)
        except (ValueError, KeyError, TypeError, IndexError):
            pass                         # a clean refusal is also fine


class TestRoundtrip:
    def test_byte_roundtrip(self, tmp_path):
        from gdal_ray.codecs.gtiff import decode_gtiff
        g = decode_gtiff(
            open("/root/reference/autotest/gcore/data/byte.tif",
                 "rb").read())
        px = np.asarray(g.pixels)
        if px.ndim == 3:
            px = px[..., 0]
        p = str(tmp_path / "byte.pdf")
        write_pdf(px, g.geotransform, p, crs="EPSG:26711", epsg=26711)
        px2, gt2, nd, meta = read_pdf(p)
        assert _cs(px2) == 4672
        assert gt2 == pytest.approx(g.geotransform, abs=1e-6)
        assert meta["crs"] == "EPSG:26711"

    def test_rgb_roundtrip(self, tmp_path):
        from gdal_ray.codecs.gtiff import decode_gtiff
        g = decode_gtiff(
            open("/root/reference/autotest/gcore/data/rgbsmall.tif",
                 "rb").read())
        px = np.asarray(g.pixels)
        p = str(tmp_path / "rgb.pdf")
        write_pdf(px, g.geotransform, p, crs="EPSG:4326", epsg=4326)
        px2, gt2, nd, meta = read_pdf(p)
        assert [checksum(px2[..., i]) for i in range(3)] == \
            [21212, 21053, 21349]
        assert gt2 == pytest.approx(g.geotransform, rel=1e-9)

    def test_projected_vp_roundtrip(self, tmp_path):
        # GPTS written in lat/lon, read back through the tmerc kernel
        px = (np.arange(400, dtype=np.uint8).reshape(20, 20))
        gt = (500000.0, 30.0, 0.0, 4650000.0, 0.0, -30.0)
        p = str(tmp_path / "utm.pdf")
        write_pdf(px, gt, p, crs="EPSG:32620", epsg=32620)
        px2, gt2, nd, meta = read_pdf(p)
        assert np.array_equal(px2, px)
        assert gt2 == pytest.approx(gt, abs=1e-4)

    def test_raster_dispatch(self, tmp_path):
        from gdal_ray.sources.raster import read_raster
        px = np.full((8, 8), 7, np.uint8)
        p = str(tmp_path / "t.pdf")
        write_pdf(px, (0, 1, 0, 8, 0, -1), p, crs="EPSG:4326",
                  epsg=4326)
        out, gt, nd, meta = read_raster(p)
        assert np.array_equal(out, px)
