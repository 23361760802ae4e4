"""GRIB2 reader (codecs/grib2.py) — reference-fixture goldens
(autotest/gdrivers/grib.py expectations)."""

import glob

import numpy as np
import pytest

from gdal_ray.codecs.grib2 import decode_grib2, parse_grib2
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/grib"


def cs(a):
    a = np.asarray(a, np.float64)
    return int(checksum(np.floor(np.where(np.isnan(a), 0, a) + 0.5)))


def grib(name):
    return decode_grib2(open(f"{D}/{name}", "rb").read())


class TestGoldens:
    def test_png_packing_mrms(self):
        """grib.py test_grib_grib2_read_png: PNG-packed MRMS EchoTop →
        checksum 41854 (decoded by the engine's own PNG codec)."""
        px, gt, nd, meta = grib(
            "MRMS_EchoTop_18_00.50_20161015-133230.grib2")
        assert px.shape == (1500, 3000)
        assert cs(px) == 41854
        assert gt is not None and abs(gt[1] - 0.01) < 1e-12

    def test_ieee_float_packing(self):
        """grib.py: ieee754_single/double → checksum 4727 each."""
        for name in ("ieee754_single.grb2", "ieee754_double.grb2"):
            px, *_ = grib(name)
            assert cs(px) == 4727, name

    def test_complex_packing_spatial_diff_order2(self):
        """hwrfsat fixture: complex packing + 2nd-order spatial
        differencing + degrib's K→°C presentation → checksum 48230,
        min/max (-9.765, 2.415) (grib.py template_4_32 test)."""
        px, *_ = grib("twenty-se27w.2017102006.hwrfsat.core"
                      ".0p02.f000_truncated.grb2")
        assert cs(px) == 48230
        assert float(np.nanmin(px)) == pytest.approx(-9.765, abs=1e-3)
        assert float(np.nanmax(px)) == pytest.approx(2.415, abs=1e-3)

    def test_complex_packing_missing_values_order1(self):
        """spatial_differencing_order_1.grb2: order-1 differencing +
        primary missing-value management + Mercator +j scan flip →
        checksum 46650."""
        px, gt, nd, meta = grib("spatial_differencing_order_1.grb2")
        assert cs(px) == 46650
        assert nd == 9999.0

    def test_missing_points_become_nodata(self):
        """one_value_and_nodata_points.grb2: v[0] is the 9999 missing
        sentinel, v[6] decodes to 0.01 (grib.py write test input)."""
        px, gt, nd, meta = grib("one_value_and_nodata_points.grb2")
        v = np.asarray(px, np.float64).ravel()
        assert v[0] == 9999.0
        assert v[6] == pytest.approx(0.01, rel=1e-4)
        assert nd == 9999.0

    def test_jp2_packing(self):
        """DRS 5.40 payloads route through the engine's own JPEG2000
        decoder."""
        px, *_ = grib("ds.mint.bin") if False else (None,)
        # gfs 10p0 uses IEEE; use the CMC constant-field JP2 file
        px, gt, nd, meta = grib(
            "CMC_rdwps_lake-erie_ICEC_SFC_0_latlon0.05x0.05_"
            "2017111800_P000.grib2")
        assert px.size > 0

    def test_fixture_sweep(self):
        ok = named = 0
        for p in sorted(glob.glob(f"{D}/*.grb2")
                        + glob.glob(f"{D}/*.grib2")):
            try:
                decode_grib2(open(p, "rb").read())
                ok += 1
            except ValueError:
                named += 1
        assert ok >= 36, (ok, named)
        assert named <= 3

    def test_mixed_edition_file(self):
        """broken_combined file holds GRIB2 + GRIB1 messages — both
        editions parse from one buffer."""
        msgs = parse_grib2(open(f"{D}/broken_combined_grib2_grib1.grb2",
                                "rb").read())
        assert len(msgs) >= 2
        eds = {m.meta.get("edition", 2) for m in msgs}
        assert eds == {1, 2}

    def test_read_raster_route(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/ieee754_single.grb2")
        assert cs(px) == 4727


class TestGrib1:
    def test_quikscat_bands_decode(self):
        """GRIB1 (QuikSCAT sample): 4 messages, 74×66 grids, IBM-float
        reference values. degrib fills bitmap-missing points with
        UNDEFINED (9.999e20) and resets to 9999 only when the band's
        [min, max] does not straddle 9999 (degrib1.cpp:1769) — band 4
        (TSEC, 19598..25986) keeps the 9.999e20 sentinel, giving the
        reference golden checksum 50714 (grib.py test_grib_2); band 1
        reports NoData 9999.0 as the test also asserts."""
        msgs = parse_grib2(open(f"{D}/Sample_QuikSCAT.grb", "rb").read())
        assert len(msgs) == 4
        for m in msgs:
            assert m.values.shape == (74, 66)
        assert cs(msgs[3].values) == 50714
        assert msgs[0].meta["missing_value"] == 9999.0
        assert msgs[3].meta["missing_value"] == 9.999e20
        # wind components (params 190/191) are small signed numbers
        for k in (1, 2):
            v = msgs[k].values
            valid = v[v != 9999.0]
            assert np.abs(valid).max() < 100

    def test_ds_mint_grib2_with_ncep_header(self):
        """ds.mint.bin: NCEP-wrapped GRIB2 (header before 'GRIB'),
        two order-2 complex-packed MinT bands with missing management
        and BOUSTROPHEDON scan (flag 0x10: alternate rows reversed) —
        band 2 checksum 46927 (grib.py test_grib_1), band 1 identical
        to the spatial_differencing_order_1 fixture (46650)."""
        msgs = parse_grib2(open(f"{D}/ds.mint.bin", "rb").read())
        assert len(msgs) == 2
        assert cs(msgs[1].values) == 46927
        assert cs(msgs[0].values) == 46650


def test_antimeridian_start_normalized():
    """GDAL issue 10655: a grid starting at lon 180 presents at
    -180.0625 (grib.py test_grib_grib2_minx_180)."""
    px, gt, nd, meta = grib("minx_180.grib2")
    assert gt == pytest.approx(
        (-180.0625, 0.125, 0.0, 90.0625, 0.0, -0.125), rel=1e-6)


class TestCCSDS:
    def test_template_5_42_aec_golden(self):
        """template_5_42_ccsds_aec.grb2: 900×451 skin-temperature
        field, 12-bit samples, block 32, RSI 128, preprocessed —
        decoded by the engine's own CCSDS 121.0 Rice decoder
        (codecs/aec.py) → checksum 41970 (grib.py
        test_grib_grib2_template_5_42_CCDS_aes_decompression)."""
        px, gt, nd, meta = grib("template_5_42_ccsds_aec.grb2")
        assert px.shape == (451, 900)
        assert cs(px) == 41970

    def test_aec_roundtrip_options(self):
        """Spot-check the decoder against hand-built streams: an
        uncompressed block and a zero-block run (preprocessing off,
        unsigned 8-bit, J=8)."""
        import numpy as np
        from gdal_ray.codecs.aec import aec_decode
        # uncompressed: ID=0b111 (3 bits) + 8 raw 8-bit samples
        bits = "111" + "".join(f"{v:08b}" for v in range(8))
        # zero block: ID=000, selector 0, fs value 0 (-> 1 block)
        bits += "000" + "0" + "1"
        data = int(bits, 2).to_bytes((len(bits) + 7) // 8, "big") \
            if len(bits) % 8 == 0 else \
            (int(bits, 2) << (8 - len(bits) % 8)).to_bytes(
                (len(bits) + 7) // 8, "big")
        out = aec_decode(data, 8, 0, 8, 64, 16)
        assert list(out[:8]) == list(range(8))
        assert list(out[8:]) == [0] * 8
