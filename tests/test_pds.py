"""PDS3 reader parity with the reference's own
autotest/gdrivers/pds.py checksums, geotransforms, nodata and the
Cassini oblique-cylindrical proj string (same gt tolerance formula
as gdaltest: (|gt0|+|gt3|)/10000)."""

import numpy as np
import pytest

from gdal_ray.codecs.pds import decode_pds
from gdal_ray.codecs.pvl import parse_pvl
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/pds/"
SHIFT = (-0.5, -0.5)    # the tests' PDS_*ProjOffset_Shift config


def _gt_close(got, want):
    eps = (abs(want[0]) + abs(want[3])) / 10000.0
    return all(abs(g - w) <= max(eps, 1e-9) for g, w in zip(got, want))


def test_pds_mc02():
    px, gt, nd, meta = decode_pds(D + "mc02_truncated.img",
                                  proj_offset_shift=SHIFT)
    assert checksum(px) == 47151
    assert _gt_close(gt, (-10668384.903788567, 926.1152744293213, 0,
                          3852176.483988762, 0, -926.1152744293213))
    assert "eqc" in meta["crs"] and "+R=3396000" in meta["crs"]


def test_pds_fl73n003():
    px, gt, nd, meta = decode_pds(D + "fl73n003_truncated.img",
                                  proj_offset_shift=SHIFT)
    assert checksum(px) == 34962
    assert _gt_close(gt, (587861.55900405, 75.00000298023224, 0.0,
                          -7815243.474612362, 0.0, -75.00000298023224))
    assert nd == 7.0
    assert meta["scale"] == 0.2
    assert meta["offset"] == -20.2
    assert "+proj=sinu +lon_0=18" in meta["crs"]
    assert "+R=6051000" in meta["crs"]


def test_pds_missing_constant():
    px, gt, nd, meta = decode_pds(D + "fl73n003_alt_truncated.img")
    assert nd == 7.0


def test_pds_16bit_no_projection():
    px, gt, nd, meta = decode_pds(D + "EN0001426030M_truncated.IMG")
    assert checksum(px) == 1367
    assert gt is None
    assert nd == 0.0


def test_pds_detached_byte_offset():
    px, gt, nd, meta = decode_pds(D + "pds_3177.lbl",
                                  proj_offset_shift=SHIFT)
    assert checksum(px) == 3418
    assert _gt_close(gt, (6119184.3590369327, 1.0113804322107001, 0.0,
                          -549696.39009125973, 0.0, -1.0113804322107001))


def test_pds_line_prefix_bytes():
    px, gt, nd, meta = decode_pds(D + "pds_3355.lbl")
    assert checksum(px) == 2748


def test_pds_label_delegated_payload():
    # COMPRESSED_FILE.ENCODING_TYPE=JP2 label whose payload the test
    # fixture substitutes with byte.tif — the delegated-open mode
    px, gt, nd, meta = decode_pds(D + "ESP_013951_1955_RED.LBL",
                                  proj_offset_shift=SHIFT)
    assert checksum(px) == 4672
    assert _gt_close(gt, (-6139197.5, 0.5, 0.0, 936003.0, 0.0, -0.5))
    assert "eqc" in meta["crs"]
    assert "+lat_ts=15" in meta["crs"]
    assert "+lon_0=180" in meta["crs"]


def test_pds_uncompressed_file_prefix():
    px, gt, nd, meta = decode_pds(D + "LDEM_4.LBL",
                                  proj_offset_shift=SHIFT)
    assert checksum(px[:2, :]) == 50938
    assert px.shape == (720, 1440)
    assert _gt_close(gt, (-5450622.3254203796, 7580.8377265930176, 0.0,
                          2721520.7438468933, 0.0, -7580.8377265930176))


def test_pds_line_offset_not_multiple_of_record():
    px, gt, nd, meta = decode_pds(D + "map_000_038_truncated.lbl")
    assert checksum(px) == 14019


def test_pds_crism_file_prefix_line_interleaved():
    px, gt, nd, meta = decode_pds(
        D + "hsp00017ba0_01_ra218s_trr3_truncated.lbl")
    assert px.shape[2] == 107
    assert checksum(px[:, :, 0]) == 64740


def test_pds_zip_and_hex_nodata():
    px, gt, nd, meta = decode_pds(D + "PDS_WITH_ZIP_IMG.LBL")
    assert checksum(px) == 0
    expected_nd = -3.40282265508890445e38
    assert abs((nd - expected_nd) / expected_nd) <= 1e-5
    assert meta.get("crs")


def test_pds_oblique_cylindrical():
    px, gt, nd, meta = decode_pds(
        D + "BIBQH03N123_D101_T020S03_V03_truncated.IMG")
    assert meta["crs"] == (
        "+proj=ob_tran +o_proj=eqc +o_lon_p=-257.744003 "
        "+o_lat_p=120.374532 +lon_0=-303.571748 +R=2575000 "
        "+units=m +no_defs")
    assert gt == pytest.approx(
        (-5347774.07796, 0, 351.11116, -2561707.02336, 351.11116, 0))


def test_pds_nested_arrays_and_mismatched_delimiters():
    kw = parse_pvl("""PDS_VERSION_ID = "PDS3"
NOTE = ((1, 2, 3))
PRODUCT_ID = ({1, 2}, {3,4})
END
""")
    assert kw["NOTE"] == "((1,2,3))"
    assert kw["PRODUCT_ID"] == "({1,2},{3,4})"
    with pytest.raises(ValueError):
        parse_pvl('NOTE = (x, y}\nEND\n')
    with pytest.raises(ValueError):
        parse_pvl('NOTE = {x, y)\nEND\n')


def test_pds_sharp_on_continuing_line():
    kw = parse_pvl('NOTE = (#9933FF,\n       #FF0000)\nEND\n')
    assert kw["NOTE"] == "(#9933FF,#FF0000)"


def test_pds_dispatch():
    from gdal_ray.sources.raster import read_raster
    px, gt, nd, meta = read_raster(D + "pds_3355.lbl")
    assert checksum(px) == 2748
    assert meta["driver"] == "PDS"
