"""AAIGrid + DTED drivers — golden parity with the reference's own
fixtures (autotest/gdrivers/aaigrid.py, dted.py)."""

import numpy as np
import pytest

from gdal_ray.codecs.aaigrid import decode_aaigrid, encode_aaigrid
from gdal_ray.codecs.dted import decode_dted
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"


class TestAAIGrid:
    def test_byte_grd_golden(self):
        # byte.tif's content as AAIGrid (aaigrid.py:136 → 4672)
        px, gt, nd = decode_aaigrid(open(D + "aaigrid/byte.tif.grd").read())
        assert px.dtype == np.int32 and px.shape == (20, 20)
        assert checksum(px) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def test_pixel_per_line_golden(self):
        px, _, _ = decode_aaigrid(
            open(D + "aaigrid/pixel_per_line.asc").read())
        assert checksum(px) == 1123          # aaigrid.py:44

    def test_case_insensitive_keys(self):
        px, _, _ = decode_aaigrid(
            open(D + "aaigrid/case_sensitive.ASC").read())
        assert checksum(px) == 1123          # aaigrid.py:163

    def test_nodata_variants(self):
        px, _, nd = decode_aaigrid(open(D + "aaigrid/nodata_float.asc").read())
        assert px.dtype == np.float64 and nd == -99999.0
        px2, _, nd2 = decode_aaigrid(open(D + "aaigrid/nodata_int.asc").read())
        assert px2.dtype == np.int32 and nd2 == -99999.0

    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        a = rng.integers(-500, 4000, (13, 9)).astype(np.int32)
        gt = (100.0, 30.0, 0.0, 5000.0, 0.0, -30.0)
        px, gt2, nd = decode_aaigrid(encode_aaigrid(a, gt, nodata=-9999))
        assert np.array_equal(px, a) and gt2 == gt and nd == -9999.0
        f = rng.random((4, 6)) * 100
        px2, _, _ = decode_aaigrid(encode_aaigrid(f, (0, 1, 0, 4, 0, -1)))
        assert np.allclose(px2, f)           # repr() floats roundtrip

    def test_rejects_south_up(self):
        with pytest.raises(ValueError, match="north-up"):
            encode_aaigrid(np.zeros((2, 2)), (0, 1, 0, 0, 0, 1))


class TestDted:
    def test_n43_golden(self):
        e, gt, nd = decode_dted(open(D + "n43.dt0", "rb").read())
        assert e.dtype == np.int16 and e.shape == (121, 121)
        assert checksum(e) == 49187          # dted.py:31
        # dted.py:39-55 geotransform
        assert gt[0] == pytest.approx(-80.004166666666663, abs=1e-6)
        assert gt[1] == pytest.approx(1 / 120, abs=1e-9)
        assert gt[3] == pytest.approx(44.00416666666667, abs=1e-6)
        assert gt[5] == pytest.approx(-1 / 120, abs=1e-9)
        assert nd == -32767.0

    def test_bad_input(self):
        with pytest.raises(ValueError):
            decode_dted(b"NOTDTED" + b"\x00" * 100)


class TestSrtmHgt:
    def test_dted_cross_parity(self):
        # the reference's own srtmhgt test flow: n43.dt0's samples
        # wrapped as n43w080.hgt must checksum identically (srtmhgt.py
        # builds its Level-1 fixture from this same DTED file)
        from gdal_ray.codecs.srtmhgt import decode_hgt, encode_hgt
        e, gt_d, _ = decode_dted(open(D + "n43.dt0", "rb").read())
        buf = encode_hgt(e)
        back, gt, nd = decode_hgt(buf, "N43W080.hgt")
        assert np.array_equal(back, e)
        assert checksum(back) == 49187
        assert nd == -32768.0
        # 121-sample grid -> 1/120 cell, half-cell offset, same grid
        # as the DTED fixture
        assert gt == pytest.approx(gt_d, abs=1e-12)

    def test_filename_parsing(self):
        from gdal_ray.codecs.srtmhgt import hgt_origin_from_name
        assert hgt_origin_from_name("/x/S14E027.hgt") == (27.0, -14.0)
        assert hgt_origin_from_name("n43w080.hgt") == (-80.0, 43.0)
        with pytest.raises(ValueError):
            hgt_origin_from_name("whatever.hgt")

    def test_bad_size(self):
        from gdal_ray.codecs.srtmhgt import decode_hgt
        with pytest.raises(ValueError, match="square"):
            decode_hgt(b"\x00" * 10, "N00E000.hgt")


def test_dted_inverted_coords_and_hdr_prefix():
    # pre-Amendment-1 products invert the UHL lon/lat fields
    # (detected by hemisphere letters, reference test_dted_11's
    # geotransform), and some files carry a HDR record before the
    # UHL (#2951) with truncated columns left as nodata
    from gdal_ray.codecs.dted import decode_dted
    A = "/root/reference/autotest/gdrivers/data/dted/"
    px, gt, nd = decode_dted(open(A + "n43_coord_inverted.dt0",
                                  "rb").read())
    exp = (-80.004166666666663, 1 / 120.0, 0.0,
           44.00416666666667, 0.0, -1 / 120.0)
    assert all(abs(a - b) < 1e-6 for a, b in zip(gt, exp))
    px, gt, nd = decode_dted(open(A + "w118n033_trunc.dt1",
                                  "rb").read())
    assert px.shape == (1201, 1201)
