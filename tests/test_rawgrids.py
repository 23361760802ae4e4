"""Simple grid formats (codecs/rawgrids.py) — reference-fixture
goldens straight from the reference's own autotest expectations:
gtx.py (hydroc1 64183 + gt), lan.py (fakelan/fakelan4bit 10),
ers.py (srtm 64074 + stats, ers_dem 56588 + gt), saga.py (108),
idrisi.py (byte 5044, real 5275), gxf.py (small 90, small2 65042),
fits.py (byte_merc georef)."""

import numpy as np
import pytest

from gdal_ray.codecs import rawgrids as R
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


class TestGtx:
    def test_hydroc1(self):
        px, gt, nd, meta = R.decode_gtx(
            open(f"{D}/gtx/hydroc1.gtx", "rb").read())
        assert cs(px) == 64183
        want = (276.725, 0.05, 0.0, 42.775, 0.0, -0.05)
        assert all(abs(a - b) < 1e-9 for a, b in zip(gt, want))
        assert nd == pytest.approx(-88.8888)


class TestLan:
    def test_fakelan_8bit(self):
        px, gt, nd, meta = R.decode_lan(
            open(f"{D}/lan/fakelan.lan", "rb").read())
        assert cs(px) == 10

    def test_fakelan_4bit(self):
        px, gt, nd, meta = R.decode_lan(
            open(f"{D}/lan/fakelan4bit.lan", "rb").read())
        assert cs(px) == 10
        assert meta["pixel_type"] == 1


class TestErs:
    def test_srtm(self):
        """Comment/quote handling plus MSBFirst int16 payload; the
        stats block matches the reference's expected metadata."""
        px, gt, nd, meta = R.decode_ers(f"{D}/ers/srtm.ers")
        assert cs(px) == 64074
        assert meta["stats"]["MeanValue"].strip("{} ") == "-4020.25"
        assert nd == 9999.0

    def test_ers_dem_headeroffset(self):
        px, gt, nd, meta = R.decode_ers(f"{D}/ers/ers_dem.ers")
        assert cs(px) == 56588
        want = (143.59625, 0.025, 0.0, -39.38125, 0.0, -0.025)
        assert all(abs(a - b) < 1e-8 for a, b in zip(gt, want))
        assert meta["datum"] == "GDA94"

    def test_case_insensitive_data_file(self):
        px, *_ = R.decode_ers(f"{D}/ers/8s.ers")
        assert px.dtype == np.int8


class TestSaga:
    def test_4byte_float(self):
        px, gt, nd, meta = R.decode_saga(f"{D}/saga/4byteFloat.sdat")
        assert cs(px) == 108
        assert nd == -99999.0
        # bottom-up flip + half-cell shift
        assert gt[0] == pytest.approx(333.3 - 5.0)
        assert gt[3] == pytest.approx(555.5 + 9 * 10 + 5.0)


class TestIdrisi:
    def test_byte(self):
        px, gt, nd, meta = R.decode_rst(f"{D}/rst/byte.rst")
        assert cs(px) == 5044
        assert px.shape == (21, 21)

    def test_real(self):
        px, gt, nd, meta = R.decode_rst(f"{D}/rst/real.rst")
        assert cs(px) == 5275
        assert px.dtype == np.float32


class TestGxf:
    def test_small_uncompressed(self):
        px, gt, nd, meta = R.decode_gxf(
            open(f"{D}/gxf/small.gxf", "rb").read())
        assert cs(px) == 90
        assert px.shape == (3, 4)
        # first raw row is the bottom row (LL-right sense)
        assert px[2, 1] == 10.0

    def test_small2_base90_compressed(self):
        """#GTYPE 3 base-90 stream with '!'-dummy and '\"'-repeat
        escapes plus #TRANSFORM scaling."""
        px, gt, nd, meta = R.decode_gxf(
            open(f"{D}/gxf/small2.gxf", "rb").read())
        assert cs(px) == 65042
        assert px.shape == (8, 10)
        assert "Ohio" in meta["projection"]


class TestFits:
    def test_byte_merc_georef(self):
        """fitsdataset.cpp WCS math: CD matrix x deg2rad*A_RADIUS,
        CRVAL2 unused (reference test_fits_read_georef_merc gt)."""
        px, gt, nd, meta = R.decode_fits(
            open(f"{D}/fits/byte_merc.fits", "rb").read())
        want = (-13095897.481058259, 72.23522015778646, 0.0,
                3991653.2130816197, 0.0, -72.23522015778646)
        assert all(abs(a - b) < 1e-3 for a, b in zip(gt, want))
        assert px.shape == (20, 20)
        assert nd == -9999.0
        # provenance: the flipped presentation (GDAL reads FITS rows
        # bottom-up) restores byte.tif exactly
        from gdal_ray.codecs.gtiff import decode_gtiff
        g = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/byte.tif", "rb").read())
        b = g.pixels[0] if g.pixels.ndim == 3 else g.pixels
        assert (px[::-1] == b).all()

    def test_offset_scale(self):
        px, gt, nd, meta = R.decode_fits(open(
            f"{D}/fits/offset_scale_no_georef.fits", "rb").read())
        assert meta["offset"] == pytest.approx(-0.0039525691699605)
        assert meta["scale"] == pytest.approx(1.00395256917)

    def test_not_fits(self):
        with pytest.raises(ValueError, match="FITS"):
            R.decode_fits(b"nope" * 800)


class TestRouting:
    @pytest.mark.parametrize("path,want_cs", [
        (f"{D}/gtx/hydroc1.gtx", 64183),
        (f"{D}/lan/fakelan.lan", 10),
        (f"{D}/ers/srtm.ers", 64074),
        (f"{D}/saga/4byteFloat.sdat", 108),
        (f"{D}/rst/byte.rst", 5044),
        (f"{D}/gxf/small.gxf", 90),
        (f"{D}/fits/byte_merc.fits", 4855),
    ])
    def test_read_raster_routes(self, path, want_cs):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(path)
        assert cs(px) == want_cs


class TestLoslas:
    def test_wyhpgn(self):
        """loslas.py test_loslas_1: gt + band statistics."""
        px, gt, nd, meta = R.decode_loslas(
            open(f"{D}/loslas/wyhpgn.los", "rb").read(), "los")
        want = (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25)
        assert all(abs(a - b) < 1e-9 for a, b in zip(gt, want))
        assert float(px.min()) == pytest.approx(-0.027868999)
        assert float(px.max()) == pytest.approx(0.033906999)
        assert float(px.mean()) == pytest.approx(0.009716129862575248)
        assert "west" not in (meta["band_description"] or "")


class TestByn:
    def test_cgg2013(self):
        px, gt, nd, meta = R.decode_byn(
            open(f"{D}/byn/cgg2013ai08_reduced.byn", "rb").read())
        assert cs(px) == 64764
        assert px.dtype.kind == "i" and px.dtype.itemsize == 4
        assert nd == pytest.approx(9999000.0)   # 9999 * factor


class TestNgsgeoid:
    @pytest.mark.parametrize("name", ["g2009u01_le_truncated.bin",
                                      "g2009u01_be_truncated.bin"])
    def test_both_endiannesses(self, name):
        px, gt, nd, meta = R.decode_ngsgeoid(
            open(f"{D}/ngsgeoid/{name}", "rb").read())
        assert cs(px) == 65534


class TestIsg:
    def test_basic(self):
        px, gt, nd, meta = R.decode_isg(
            open(f"{D}/isg/test.isg", "rb").read())
        assert cs(px) == 159
        assert gt == (120.0, 0.25, 0.0, 41.0, 0.0, -0.25)
        assert nd == -9999.0
        assert meta["model"] == "EXAMPLE"


class TestGrassAscii:
    def test_basic(self):
        px, gt, nd, meta = R.decode_grassascii(
            open(f"{D}/grassasciigrid/grassascii.txt", "rb").read())
        assert cs(px) == 212
        assert gt[0] == -100.0 and gt[3] == 250.0


class TestJdem:
    def test_fakejdem(self):
        px, gt, nd, meta = R.decode_jdem(
            open(f"{D}/jdem/fakejdem.mem", "rb").read())
        assert cs(px) == 15


class TestGsc:
    def test_fakegsc(self):
        px, gt, nd, meta = R.decode_gsc(
            open(f"{D}/gsc/fakegsc.gsc", "rb").read())
        assert cs(px) == 0


class TestRraster:
    def test_byte(self):
        px, gt, nd, meta = R.decode_rraster(
            f"{D}/rraster/byte_rraster.grd")
        assert cs(px) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert "utm" in meta["crs"]

    def test_multiband(self):
        px, gt, nd, meta = R.decode_rraster(
            f"{D}/rraster/rgba_rraster.grd")
        assert px.ndim == 3 and px.shape[0] == 4
