"""NITF reader (codecs/nitf.py) + CCITT fax (codecs/fax.py) —
reference-autotest goldens (gdrivers/nitf.py): rgb.ntf band 3 cs
21349 + adjusted-IGEOLO geotransform (test_nitf_6), 1-bit RGB/LUT
images cs 170 (test_nitf_11/15/16), C1 bilevel U_1050A cs 65024
(test_nitf_19), RSET overview cs 1297 (test_nitf_47)."""

import numpy as np

from gdal_ray.codecs.nitf import decode_nitf, read_nitf_info
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/nitf"


def cs(a):
    return int(checksum(np.asarray(a)))


def load(name, segment=0):
    with open(f"{D}/{name}", "rb") as fh:
        return decode_nitf(fh.read(), segment=segment)


class TestUncompressed:
    def test_rgb_checksum_and_gt(self):
        px, gt, nd, meta = load("rgb.ntf")
        assert px.shape == (50, 50, 3)
        assert cs(px[:, :, 2]) == 21349  # test_nitf_6 band 3
        exp = (-44.842029478458, 0.003503401360, 0,
               -22.930748299319, 0, -0.003503401360)
        assert all(abs(a - b) < 1e-9 for a, b in zip(gt, exp))
        assert meta["crs"] == "EPSG:4326"

    def test_1bit_lut_images(self):
        for name in ("i_3034c.ntf", "i_3034f.ntf", "ns3034d.nsf"):
            px, gt, nd, meta = load(name)
            assert px.shape == (18, 35)
            assert cs(px) == 170, name
        px, _, _, meta = load("i_3034c.ntf")
        assert meta["color_table"] is not None

    def test_rset_band2(self):
        # test_nitf_47: overview 1 = sibling .r2 file, band 2 cs 1297
        px, *_ = load("rset.ntf.r2")
        assert px.shape == (12, 12, 3)
        assert cs(px[:, :, 1]) == 1297

    def test_version_20(self):
        buf = open(f"{D}/U_1050A.NTF", "rb").read()
        ver, segs = read_nitf_info(buf)
        assert ver.startswith("NITF02.0")
        assert segs[0].rows == 1024 and segs[0].cols == 1024


class TestCompressed:
    def test_c1_bilevel_fax(self):
        px, *_ = load("U_1050A.NTF")  # test_nitf_19 C1 G3-2D
        assert px.shape == (1024, 1024)
        assert cs(px) == 65024

    def test_c3_jpeg_segment(self):
        px, _, _, meta = load("two_images_jpeg.ntf", segment=1)
        assert meta["IC"] == "C3" and px.shape == (20, 20)
        assert cs(px) > 0

    def test_c8_jp2_segment(self):
        px, _, _, meta = load("two_images_jp2.ntf", segment=1)
        assert meta["IC"] == "C8" and px.shape == (20, 20)
        px2, _, _, m2 = load("test_jp2_ecw33.ntf")
        assert px2.shape == (100, 200, 3)


class TestFaxCodec:
    def test_g4_roundtrip_shape(self):
        # T.6 decode of a trivially hand-coded all-white page:
        # each row = V0 against the all-white reference
        from gdal_ray.codecs.fax import decode_g4
        bits = "1" * 8  # 8 rows of V0
        data = bytes([int(bits[i:i + 8], 2)
                      for i in range(0, len(bits), 8)])
        px = decode_g4(data, 16, 8)
        assert px.shape == (8, 16) and not px.any()

    def test_dispatcher(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/rgb.ntf")
        assert meta["driver"] == "NITF" and cs(px[:, :, 2]) == 21349


class TestTiffBilevel:
    """1-bit TIFF paths unlocked by the fax codec (gtiff.py expand):
    reference goldens slim_g4.tif 3322 (tiff_read.py test_tiff_g4_split),
    oddsize1bit.tif 5918 (tiff_write.py:425), 1bit_2bands (200, 824)
    (tiff_read.py test_tiff_read_1bit_2bands)."""

    def test_g4_tiff(self):
        from gdal_ray.codecs.gtiff import decode_gtiff
        g = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/slim_g4.tif",
            "rb").read())
        assert g.pixels.shape == (7200, 1000)
        assert cs(g.pixels) == 3322

    def test_uncompressed_1bit(self):
        from gdal_ray.codecs.gtiff import decode_gtiff
        g = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/oddsize1bit.tif",
            "rb").read())
        assert cs(g.pixels) == 5918
        g2 = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/1bit_2bands.tif",
            "rb").read())
        assert [cs(g2.pixels[:, :, i]) for i in range(2)] == [200, 824]
