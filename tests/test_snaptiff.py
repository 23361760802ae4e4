"""SNAP TIFF reader tests — exact parity with the reference's
autotest/gdrivers/snap_tiff.py expectations on the truncated
Sentinel-1 GRD fixture (dims, dtype, 4 corner GCPs from the
tie-point geolocation array, BEAM-DIMAP band metadata)."""

import os

import pytest

from gdal_ray.codecs.snaptiff import read_snap_tiff_info

FIX = ("/root/reference/autotest/gdrivers/data/snap_tiff/"
       "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_"
       "01F9E2_E974_tnr_empty_truncated.tif.zip.zip")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="reference absent")


def test_snap_tiff_info():
    i = read_snap_tiff_info(FIX)
    assert i["width"] == 25548
    assert i["height"] == 16716
    assert i["dtype"] == "float32"
    assert i["crs"] == "EPSG:4326"
    gcps = {g[0]: g for g in i["gcps"]}
    assert len(gcps) == 4
    tl = gcps["TL"]
    assert (tl[1], tl[2]) == (0.5, 0.5)
    assert tl[3] == -121.18662152623274
    assert tl[4] == 39.655540466308594
    br = gcps["BR"]
    assert (br[1], br[2]) == (25547.5, 16715.5)
    assert br[3] == -124.43485147116212
    assert br[4] == 38.550738598352105
    assert i["band_name"] == "Intensity_VV"
    assert i["unit"] == "intensity"
    assert i["nodata"] == 0.0
